"""HiFi-GAN generator (the `dec.*` weights): latent frames -> waveform.

This is where the FLOPs are (the waveform axis is hop_length x longer than
the frame axis), so everything stays as large batched convs for the MXU;
the upsample stack uses the conv_transpose lowering in ops/conv.py.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import Params, Prefix
from piper_tpu.ops.conv import conv1d, conv1d_same, conv1d_same_opt, conv_transpose1d
from piper_tpu.ops.nn import leaky_relu
from piper_tpu.utils.debug_trace import trace_put

LRELU_SLOPE = 0.1


def _pallas_precision(precision):
    """Map a level-precision tier onto the Pallas mxu_dot tiers."""
    if precision in (None, "highest"):
        return "highest"
    if precision == "high":
        return "high"
    return "default"  # "default" / "bfloat16"


def _lrelu_conv(x, w, b, *, dilation=1, t_mask=None, use_pallas=False,
                precision=None):
    """leaky_relu -> (mask ->) same-conv, via the fused Pallas kernel for
    narrow square convs on TPU (measured 1.4-2.9x over XLA's conv lowering),
    else the packed/plain XLA lowering.

    For a 0/1 mask, lrelu(x * m) == lrelu(x) * m, so the Pallas path applies
    the mask to the kernel's input instead of after the activation."""
    narrow_square = w.shape[0] == w.shape[1] and w.shape[0] < 128
    if use_pallas and narrow_square:
        from piper_tpu.ops.pallas.conv import pallas_conv1d_same

        xin = x if t_mask is None else x * t_mask
        return pallas_conv1d_same(xin, w, b, dilation=dilation,
                                  act_slope=LRELU_SLOPE,
                                  precision=_pallas_precision(precision))
    xt = leaky_relu(x, LRELU_SLOPE)
    if t_mask is not None:
        xt = xt * t_mask
    return conv1d_same_opt(xt, w, b, dilation=dilation)


def _resblock1(
    x: jnp.ndarray, p: Prefix, kernel: int, dilations, t_mask=None,
    use_pallas=False, precision=None
) -> jnp.ndarray:
    """Multi-receptive-field residual block (HiFi-GAN ResBlock1).

    Narrow convs (the late levels) go through the fused Pallas kernel or the
    packed lowering in ops/conv.py (full MXU output tiles at fp32;
    numerically identical)."""
    for m, d in enumerate(dilations):
        xt = _lrelu_conv(x, p[f"convs1.{m}.weight"], p[f"convs1.{m}.bias"],
                         dilation=d, t_mask=t_mask, use_pallas=use_pallas,
                         precision=precision)
        trace_put(f"{p.prefix}.convs1.{m}", xt)
        xt = _lrelu_conv(xt, p[f"convs2.{m}.weight"], p[f"convs2.{m}.bias"],
                         t_mask=t_mask, use_pallas=use_pallas,
                         precision=precision)
        trace_put(f"{p.prefix}.convs2.{m}", xt)
        x = x + xt
    return x


def _resblock2(
    x: jnp.ndarray, p: Prefix, kernel: int, dilations, t_mask=None,
    use_pallas=False, precision=None
) -> jnp.ndarray:
    """Single-conv residual block (HiFi-GAN ResBlock2, used by some voices)."""
    for m, d in enumerate(dilations):
        xt = _lrelu_conv(x, p[f"convs.{m}.weight"], p[f"convs.{m}.bias"],
                         dilation=d, t_mask=t_mask, use_pallas=use_pallas,
                         precision=precision)
        trace_put(f"{p.prefix}.convs.{m}", xt)
        x = x + xt
    return x


def _prec_ctx(precision: Optional[str]):
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)


def hifigan_generator(
    z: jnp.ndarray,
    params: Params,
    hp: VitsHParams,
    g: Optional[jnp.ndarray] = None,
    prefix: str = "dec",
    level_precisions: Optional[Union[str, Sequence[Optional[str]]]] = None,
    t_mask: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    t_bounds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, C, T_frames) latent -> (B, 1, T_frames * hop_length) waveform.

    `level_precisions` optionally sets the matmul precision per upsample
    level (a single string applies to all). The late small-channel levels
    have short accumulation chains and feed the bounded tanh output, so they
    tolerate lower tiers than the wide early convs — and they are also the
    slowest at full precision on the MXU.

    `t_mask` (B, 1, T_frames) marks frames that lie outside the sequence
    (streaming window halos): activations are zeroed there before every conv,
    so a window edge behaves exactly like the full run's zero padding. With
    t_mask=None (the full run) nothing changes.

    `t_bounds` gives each row's valid FRAME interval — (B,) int32 meaning
    [0, hi) for bulk decode, or (B, 2) [lo, hi) for streaming windows whose
    left edge sits mid-sequence; with use_pallas it lets the fused
    resblock-branch kernel apply the same exact-length masking per row inside
    VMEM (one kernel per branch instead of six conv kernels + mask passes).
    """
    if isinstance(level_precisions, str):
        level_precisions = [level_precisions] * hp.num_upsamples
    lp = list(level_precisions) if level_precisions is not None else [None] * hp.num_upsamples

    def masked(x, m):
        return x if m is None else x * m

    m = t_mask
    p = Prefix(params, prefix)
    with _prec_ctx(lp[0]):
        x = conv1d(masked(z, m), p["conv_pre.weight"], p["conv_pre.bias"], padding=3)
        if g is not None:
            x = x + conv1d(g, p["cond.weight"], p["cond.bias"])
        trace_put(f"{prefix}.conv_pre", x)

    num_kernels = hp.num_resblock_kernels
    use_resblock2 = f"{prefix}.resblocks.0.convs.0.weight" in params
    bounds = None
    if t_bounds is not None:
        bounds = t_bounds.astype(jnp.int32)
        if bounds.ndim == 1:
            bounds = jnp.stack([jnp.zeros_like(bounds), bounds], axis=1)
    for i in range(hp.num_upsamples):
        with _prec_ctx(lp[i]):
            x = leaky_relu(masked(x, m), LRELU_SLOPE)
            k, u = hp.upsample_kernel_sizes[i], hp.upsample_rates[i]
            x = conv_transpose1d(
                masked(x, m),
                p[f"ups.{i}.weight"],
                p[f"ups.{i}.bias"],
                stride=u,
                padding=(k - u) // 2,
            )
            trace_put(f"{prefix}.ups.{i}", x)
            if m is not None:
                m = jnp.repeat(m, u, axis=2)
                x = x * m
            if bounds is not None:
                bounds = bounds * u
            ch_here = x.shape[1]
            # Fused whole-branch kernel: valid when the branch's bound-style
            # masking matches the array-mask semantics — i.e. we either have
            # per-row bounds (or no mask at all, where bounds default to the
            # full length); two-sided window masks keep the unfused path.
            fuse_branch = (
                use_pallas and not use_resblock2 and ch_here < 128
                and (m is None or bounds is not None)
            )
            # Whole-MRF fusion: every branch AND the mean in one kernel —
            # the level activation crosses HBM twice instead of ~7 times.
            # Measured on the dev chip (docs/BENCH.md round-3 MRF table):
            # wins ~9% only at the LAST level (ch=32, longest sequences,
            # deepest into the bandwidth roofline); at ch=64 the redone
            # margin compute of the narrow branches outweighs the saved
            # traffic, so those levels keep per-branch kernels.
            # PIPER_TPU_FUSE_MRF=1 forces it everywhere, =0 disables.
            # Per-branch kernels also remain for the tracing/bisection
            # path, which needs each branch's intermediate recorded.
            from piper_tpu.utils.debug_trace import tracing
            from piper_tpu.utils.env import flag

            _mrf_flag = flag("PIPER_TPU_FUSE_MRF")
            fuse_mrf = ch_here <= 32 if _mrf_flag == "" else _mrf_flag == "1"
            if fuse_branch and fuse_mrf and not tracing():
                from piper_tpu.ops.pallas.resblock import pallas_resblock1_mrf

                branches = []
                for j in range(num_kernels):
                    rb = p.sub(f"resblocks.{i * num_kernels + j}")
                    dils = hp.resblock_dilation_sizes[j]
                    n_d = len(dils)
                    branches.append((
                        jnp.stack([rb[f"convs1.{mm}.weight"] for mm in range(n_d)]),
                        jnp.stack([rb[f"convs1.{mm}.bias"] for mm in range(n_d)]),
                        jnp.stack([rb[f"convs2.{mm}.weight"] for mm in range(n_d)]),
                        jnp.stack([rb[f"convs2.{mm}.bias"] for mm in range(n_d)]),
                        hp.resblock_kernel_sizes[j],
                        dils,
                    ))
                x = pallas_resblock1_mrf(
                    x, branches, bounds=bounds, slope=LRELU_SLOPE,
                    precision=_pallas_precision(lp[i]),
                )
            else:
                acc = None
                for j in range(num_kernels):
                    rb = p.sub(f"resblocks.{i * num_kernels + j}")
                    kernel = hp.resblock_kernel_sizes[j]
                    dils = hp.resblock_dilation_sizes[j]
                    if fuse_branch:
                        from piper_tpu.ops.pallas.resblock import (
                            pallas_resblock1_branch,
                        )

                        n_d = len(dils)
                        w1 = jnp.stack([rb[f"convs1.{mm}.weight"] for mm in range(n_d)])
                        b1 = jnp.stack([rb[f"convs1.{mm}.bias"] for mm in range(n_d)])
                        w2 = jnp.stack([rb[f"convs2.{mm}.weight"] for mm in range(n_d)])
                        b2 = jnp.stack([rb[f"convs2.{mm}.bias"] for mm in range(n_d)])
                        y = pallas_resblock1_branch(
                            x, w1, b1, w2, b2, kernel=kernel, dilations=dils,
                            bounds=bounds, slope=LRELU_SLOPE,
                            precision=_pallas_precision(lp[i]),
                        )
                    else:
                        y = (
                            _resblock2(x, rb, kernel, dils, t_mask=m,
                                       use_pallas=use_pallas, precision=lp[i])
                            if use_resblock2
                            else _resblock1(x, rb, kernel, dils, t_mask=m,
                                            use_pallas=use_pallas, precision=lp[i])
                        )
                    trace_put(f"{prefix}.resblocks.{i * num_kernels + j}", y)
                    acc = y if acc is None else acc + y
                x = acc / num_kernels

    with _prec_ctx(lp[-1]):
        x = leaky_relu(masked(x, m))  # final activation: torch default slope 0.01
        x = conv1d(masked(x, m), p["conv_post.weight"], p["conv_post.bias"], padding=3)
        trace_put(f"{prefix}.conv_post", x)
    out = jnp.tanh(x)
    return out if m is None else out * m
