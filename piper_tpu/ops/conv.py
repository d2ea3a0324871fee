"""1-D convolution wrappers in VITS's native (B, C, T) layout.

These are thin shims over `lax.conv_general_dilated` — XLA maps them onto the
MXU directly, so unlike the reference (hand-written conv1d.metal kernels,
conv1d.metal:28-144) no custom kernel is needed for the conv path itself;
Pallas enters only for fusions XLA can't do (see ops/pallas/).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NCH", "OIH", "NCH")


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int | Sequence[int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d semantics.

    x: (B, C_in, T); weight: (C_out, C_in/groups, K); bias: (C_out,).
    `padding` may be an int (symmetric) or a (left, right) pair.
    """
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        left, right = padding
        pad = [(left, right)]
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d semantics.

    x: (B, C_in, T); weight: (C_in, C_out, K) — note the transposed-conv
    weight layout. Lowered as an input-dilated regular convolution with a
    flipped kernel, which XLA fuses and tiles onto the MXU (the reference
    implements the same inverse-mapping by hand — conv1d.metal:96-144).
    """
    k = weight.shape[-1]
    # Equivalent direct convolution: dilate input by stride, pad by
    # (k - 1 - padding) each side, convolve with the kernel flipped in time
    # and with in/out channel axes swapped.
    w = jnp.flip(weight, axis=-1).transpose(1, 0, 2)  # (C_out, C_in, K)
    pad_l = k - 1 - padding
    pad_r = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv1d_same(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Same-padded conv1d for odd kernels (torch padding=(k-1)//2 * dilation)."""
    k = weight.shape[-1]
    pad = (k - 1) // 2 * dilation
    return conv1d(x, weight, bias, padding=pad, dilation=dilation, groups=groups)
