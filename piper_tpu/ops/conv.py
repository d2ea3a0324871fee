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
    """torch.nn.functional.conv_transpose1d semantics, polyphase lowering.

    x: (B, C_in, T); weight: (C_in, C_out, K) — note the transposed-conv
    weight layout.

    The naive lowering (input-dilated conv) zero-stuffs the input by the
    stride, wasting (stride-1)/stride of the MXU FLOPs. Instead we use the
    polyphase decomposition: output phase r (= (n+padding) mod stride) is a
    plain dense convolution of x with the kernel taps w[..., r::stride], so
    one conv producing stride*C_out channels followed by an interleaving
    reshape computes the exact same result at 1/stride of the FLOPs — and
    with fatter channel dims that tile far better onto the MXU. (This is the
    TPU answer to the reference's hand-written inverse-mapping kernel,
    conv1d.metal:96-144.)
    """
    if stride == 1:
        k = weight.shape[-1]
        w = jnp.flip(weight, axis=-1).transpose(1, 0, 2)
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
            dimension_numbers=_DIMNUMS,
            preferred_element_type=x.dtype,
        )
        if bias is not None:
            out = out + bias[None, :, None]
        return out

    c_in, c_out, k = weight.shape
    t = x.shape[-1]
    if output_padding >= stride:
        raise ValueError("output_padding must be < stride")
    t_out = (t - 1) * stride + k - 2 * padding + output_padding
    # Pad kernel taps so K is a multiple of the stride (extra taps are zero).
    k_pad = -(-k // stride) * stride
    if k_pad != k:
        weight = jnp.pad(weight, ((0, 0), (0, 0), (0, k_pad - k)))
    kr = k_pad // stride
    # Phase kernels: w_phase[r, o, i, j] = weight[i, o, r + j*stride],
    # reversed in j so lax's correlation computes sum_j x[q-j] * w_phase[j].
    wp = weight.reshape(c_in, c_out, kr, stride)  # [i, o, j, r]
    wp = jnp.flip(wp, axis=2)
    wp = wp.transpose(3, 1, 0, 2).reshape(stride * c_out, c_in, kr)  # [(r,o), i, j]
    y = lax.conv_general_dilated(
        x,
        wp,
        window_strides=(1,),
        padding=[(kr - 1, kr - 1)],  # 'full': q in [0, T + Kr - 1)
        dimension_numbers=_DIMNUMS,
        preferred_element_type=x.dtype,
    )  # (B, stride*C_out, Q)
    b = x.shape[0]
    q = y.shape[-1]
    # Interleave: sample n (0-based, pre-crop) lives at phase r = n % stride,
    # position q = n // stride.
    y = y.reshape(b, stride, c_out, q).transpose(0, 2, 3, 1).reshape(b, c_out, q * stride)
    short = padding + t_out - y.shape[-1]
    if short > 0:
        # output_padding region beyond the last kernel tap: zeros (+ bias).
        y = jnp.pad(y, ((0, 0), (0, 0), (0, short)))
    out = lax.slice_in_dim(y, padding, padding + t_out, axis=2)
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


def conv1d_same_packed(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    pack: int = 4,
) -> jnp.ndarray:
    """Same-padded conv1d, repacked for small channel counts.

    The MXU tiles outputs in 128-row blocks, so a conv with C_out=32 runs at
    <=25% utilization however XLA lays it out (HiFi-GAN's late resblocks are
    exactly this shape and dominate vocoder time at full precision). This
    lowering restores utilization exactly — same math, fp32 throughout:

      1. space-to-batch by the dilation: each residue class of t mod d sees a
         dense (dilation-1) convolution;
      2. pack `pack` consecutive output positions into the channel dim via a
         block-shifted weight  W2[(r, co), ci, tap] = w[co, ci, tap - r],
         turning the conv into stride=`pack`, C_out=pack*C_out, K2=k+pack-1 —
         full 128-row MXU tiles at a (k+pack-1)/k FLOP overhead;
      3. interleave the packed outputs back and undo the space-to-batch.
    """
    b, c_in, n = x.shape
    c_out, _, k = weight.shape
    if pack <= 1:
        return conv1d_same(x, weight, bias, dilation=dilation)
    p = (k - 1) // 2

    # --- space-to-batch over the dilation ---
    d = dilation
    if d > 1:
        n_pad = -(-n // d) * d
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n)))
        xd = x.reshape(b, c_in, n_pad // d, d)
        xd = xd.transpose(0, 3, 1, 2).reshape(b * d, c_in, n_pad // d)
    else:
        n_pad = n
        xd = x
    m = xd.shape[-1]  # decimated length

    # --- pack `pack` outputs into channels ---
    m_pad = -(-m // pack) * pack
    # left pad p (the 'same' padding), right pad to cover the packed windows.
    right = (m_pad - m) + p + (pack - 1)
    xp = jnp.pad(xd, ((0, 0), (0, 0), (p, right)))
    # W2: (pack*C_out, C_in, k+pack-1) with W2[r*C_out+co, ci, r+j] = w[co,ci,j]
    w2 = jnp.stack(
        [jnp.pad(weight, ((0, 0), (0, 0), (r, pack - 1 - r))) for r in range(pack)]
    )  # (pack, C_out, C_in, K2)
    w2 = w2.reshape(pack * c_out, c_in, k + pack - 1)
    y = lax.conv_general_dilated(
        xp,
        w2,
        window_strides=(pack,),
        padding=[(0, 0)],
        dimension_numbers=_DIMNUMS,
        preferred_element_type=x.dtype,
    )  # (B*d, pack*C_out, m_pad//pack)
    t4 = y.shape[-1]
    y = y.reshape(xd.shape[0], pack, c_out, t4).transpose(0, 2, 3, 1)
    y = y.reshape(xd.shape[0], c_out, t4 * pack)[:, :, :m]

    # --- undo space-to-batch ---
    if d > 1:
        y = y.reshape(b, d, c_out, m).transpose(0, 2, 3, 1).reshape(b, c_out, n_pad)
        y = y[:, :, :n]
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def conv1d_same_opt(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    min_wide_channels: int = 128,
) -> jnp.ndarray:
    """Same-padded conv that auto-picks the packed lowering for narrow convs."""
    c_out = weight.shape[0]
    if c_out >= min_wide_channels or weight.shape[1] != c_out:
        return conv1d_same(x, weight, bias, dilation=dilation)
    pack = min(8, min_wide_channels // c_out)
    if pack <= 1:
        return conv1d_same(x, weight, bias, dilation=dilation)
    return conv1d_same_packed(x, weight, bias, dilation=dilation, pack=pack)
