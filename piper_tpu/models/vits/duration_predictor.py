"""Stochastic duration predictor (inference/reverse path).

The normalizing-flow duration model from VITS. In the exported ONNX graph
this becomes the NonZero/ScatterND/CumSum tangle the reference special-cases
(GraphExecutor.swift:2379-2602); natively it is a handful of masked convs
plus spline flows, all static-shape.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import Params, Prefix
from piper_tpu.ops.conv import conv1d, conv1d_same
from piper_tpu.ops.nn import gelu_exact, layer_norm_channels
from piper_tpu.ops.spline import rational_quadratic_spline
from piper_tpu.utils.debug_trace import trace_put


def _dds_conv(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    p: Prefix,
    n_layers: int,
    kernel_size: int,
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dilated depth-separable conv stack (VITS DDSConv) with residuals."""
    if g is not None:
        x = x + g
    channels = x.shape[1]
    for i in range(n_layers):
        dilation = kernel_size**i
        y = conv1d_same(
            x * x_mask,
            p[f"convs_sep.{i}.weight"],
            p[f"convs_sep.{i}.bias"],
            dilation=dilation,
            groups=channels,
        )
        n1 = p.sub(f"norms_1.{i}")
        y = layer_norm_channels(y, n1["gamma"], n1["beta"])
        y = gelu_exact(y)
        y = conv1d(y, p[f"convs_1x1.{i}.weight"], p[f"convs_1x1.{i}.bias"])
        n2 = p.sub(f"norms_2.{i}")
        y = layer_norm_channels(y, n2["gamma"], n2["beta"])
        y = gelu_exact(y)
        x = x + y
        trace_put(f"{p.prefix}.layer.{i}", x)
    return x * x_mask


def _elementwise_affine_reverse(
    x: jnp.ndarray, x_mask: jnp.ndarray, p: Prefix
) -> jnp.ndarray:
    return (x - p["m"][None]) * jnp.exp(-p["logs"][None]) * x_mask


def _conv_flow_reverse(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    p: Prefix,
    hp: VitsHParams,
    g: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Inverse of the spline coupling flow on (B, 2, P)."""
    half = x.shape[1] // 2  # == 1
    x0, x1 = x[:, :half], x[:, half:]
    h = conv1d(x0, p["pre.weight"], p["pre.bias"])
    h = _dds_conv(h, x_mask, p.sub("convs"), n_layers=3, kernel_size=hp.dp_kernel_size, g=g)
    h = conv1d(h, p["proj.weight"], p["proj.bias"]) * x_mask

    b, _, t = x0.shape
    num_bins = hp.dp_num_bins
    h = h.reshape(b, half, 3 * num_bins - 1, t).transpose(0, 1, 3, 2)  # (B, half, P, 3nb-1)
    denom = jnp.sqrt(jnp.asarray(hp.dp_filter_channels, dtype=h.dtype))
    uw = h[..., :num_bins] / denom
    uh = h[..., num_bins : 2 * num_bins] / denom
    ud = h[..., 2 * num_bins :]
    x1_new, _ = rational_quadratic_spline(
        x1, uw, uh, ud, inverse=True, tail_bound=hp.dp_tail_bound
    )
    return jnp.concatenate([x0, x1_new], axis=1) * x_mask


def stochastic_duration_predictor_reverse(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    noise: jnp.ndarray,
    params: Params,
    hp: VitsHParams,
    g: Optional[jnp.ndarray] = None,
    noise_scale: jnp.ndarray | float = 0.8,
    prefix: str = "dp",
) -> jnp.ndarray:
    """Sample log-durations.

    x: (B, H, P) text-encoder output; noise: (B, 2, P) standard normal
    (injectable for bit-exact tests — the analog of the reference's
    RandomNormalLike overrides, GraphExecutor.swift:2647-2651).
    Returns logw: (B, 1, P).
    """
    p = Prefix(params, prefix)
    h = conv1d(x, p["pre.weight"], p["pre.bias"])
    if g is not None:
        h = h + conv1d(g, p["cond.weight"], p["cond.bias"])
    h = _dds_conv(h, x_mask, p.sub("convs"), n_layers=3, kernel_size=hp.dp_kernel_size)
    h = conv1d(h, p["proj.weight"], p["proj.bias"]) * x_mask

    z = noise * noise_scale
    # Reverse flow order: VITS drops the first ConvFlow in reverse
    # (`flows = flows[:-2] + [flows[-1]]`): with flows
    # [EA, CF@1, Flip, CF@3, Flip, ..., Flip], the reverse pass visits
    # Flip, CF@(2n-1), ..., Flip, CF@3, Flip, then EA — skipping CF@1.
    conv_flow_indices = [2 * i + 1 for i in range(hp.dp_n_flows)]  # [1,3,5,7]
    for idx in reversed(conv_flow_indices[1:]):  # 7, 5, 3
        z = jnp.flip(z, axis=1)  # Flip flow
        z = _conv_flow_reverse(z, x_mask, p.sub(f"flows.{idx}"), hp, g=h)
        trace_put(f"{prefix}.flows.{idx}", z)
    z = jnp.flip(z, axis=1)  # Flip preceding the skipped CF@1
    z = _elementwise_affine_reverse(z, x_mask, p.sub("flows.0"))
    trace_put(f"{prefix}.flows.0", z)
    logw = z[:, :1]
    return logw
