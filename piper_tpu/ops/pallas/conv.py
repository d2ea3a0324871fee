"""Pallas TPU kernel: fused (leaky-relu ->) dilated same-conv for narrow channels.

XLA's conv lowering for the HiFi-GAN late-resblock shapes (C in {32, 64},
long time axis, dilations up to 5) measures ~2x slower than the equivalent
raw GEMM on the same chip. This kernel recovers the GEMM formulation
explicitly: each grid step DMAs a haloed time tile from HBM into VMEM
(overlapping windows, hence manual DMA rather than BlockSpec tiling), builds
the im2col matrix with in-VMEM shifted copies, and runs one MXU dot of
(C, C*K) x (C*K, T_tile), with the preceding leaky-relu fused in.

The HBM->VMEM window DMA is double-buffered across grid steps (start the
next step's transfer before computing on the current one) — measured a
further 10-14% over the serial start/wait version, bit-identical output.

Activation layout: x (B, C, N) fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force_interpret() -> bool:
    """PIPER_TPU_PALLAS_INTERPRET=1 runs every Pallas kernel in interpreter
    mode — lets CPU CI exercise the exact model-level kernel plumbing
    (bounds, precision tiers) that production runs on TPU."""
    import os

    return os.environ.get("PIPER_TPU_PALLAS_INTERPRET") == "1"


def mxu_dot(w, x, precision: str = "highest"):
    """(C, C*K) x (C*K, T) dot at an explicit MXU precision tier.

    Pallas bypasses XLA's default_matmul_precision, so the tier is explicit:
      "highest"             — fp32 inputs (Mosaic's multi-pass fp32 path)
      "high"                — 3-pass bf16 split (w = w_hi + w_lo, x = x_hi +
                              x_lo; drop the lo*lo term) — tf32-class error
      "default"/"bfloat16"  — single bf16 pass
    All tiers accumulate in fp32. Every dot pins its lax.Precision
    explicitly: the kernel may be traced under a default_matmul_precision
    context from the surrounding model level, and Mosaic only lowers
    DEFAULT/HIGHEST (an inherited HIGH is a lowering error).
    """
    if precision in (None, "highest"):
        return jnp.dot(w, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    bf16_dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
    if precision == "high":
        w_hi = w.astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = bf16_dot(w_hi, x_hi)
        out += bf16_dot(w_hi, x_lo)
        out += bf16_dot(w_lo, x_hi)
        return out
    # "default" / "bfloat16": one bf16 pass, fp32 accumulate.
    return bf16_dot(w.astype(jnp.bfloat16), x.astype(jnp.bfloat16))


def _kernel(x_hbm, w_ref, b_ref, o_ref, xwin, cols, sems, *, k: int, dilation: int,
            tile: int, win: int, act_slope: float, ch: int, nt: int, total: int,
            precision: str):
    i = pl.program_id(0)
    t = pl.program_id(1)
    s = i * nt + t  # linear step over the whole grid

    def dma_for(step, slot):
        # DMA windows must be lane-aligned (128); `win` is tile+halo rounded up.
        i2 = step // nt
        t2 = step % nt
        return pltpu.make_async_copy(
            x_hbm.at[i2, :, pl.ds(t2 * tile, win)], xwin.at[slot], sems.at[slot]
        )

    @pl.when(s == 0)
    def _():
        dma_for(0, 0).start()

    slot = jax.lax.rem(s, 2)

    @pl.when(s + 1 < total)
    def _():
        dma_for(s + 1, jax.lax.rem(s + 1, 2)).start()

    dma_for(s, slot).wait()
    x = xwin[slot]
    if act_slope:
        x = jnp.where(x >= 0, x, x * act_slope)
    # im2col: stack the k dilated shifts along channels -> (C*K, tile).
    # Built via scratch stores (Mosaic rejects concatenating lane-offset
    # slices directly).
    for j in range(k):
        cols[j * ch : (j + 1) * ch, :] = x[:, j * dilation : j * dilation + tile]
    y = mxu_dot(w_ref[:], cols[:], precision)
    o_ref[:] = y + b_ref[:]


def pallas_conv1d_same(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    act_slope: float = 0.0,
    tile: int = 4096,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Same-padded conv1d (odd kernel) with optional fused leaky-relu input.

    Equivalent to `conv1d_same(leaky_relu(x, act_slope), weight, bias,
    dilation=dilation)` (identity activation when act_slope == 0).
    x: (B, C, N) fp32; weight: (C_out, C_in, K) with square channels.
    `precision` picks the MXU tier (see mxu_dot).
    """
    interpret = interpret or force_interpret()
    b, ch, n = x.shape
    c_out, c_in, k = weight.shape
    assert c_out == ch and c_in == ch, "square-channel convs only"
    pad = (k - 1) // 2 * dilation
    halo = (k - 1) * dilation

    # Cap the tile so VMEM stays within budget: the im2col scratch is the
    # big consumer at (k*ch, tile) fp32, plus the double-buffered haloed
    # windows, the output block, and the weights.
    vmem_budget = 5 * 1024 * 1024
    max_tile = vmem_budget // (k * ch * 4)
    tile = min(tile, max(512, max_tile // 128 * 128))
    tile = min(tile, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    win = -(-(tile + halo) // 128) * 128  # lane-aligned DMA window
    # Right padding must cover the last tile's full window.
    right = (n_pad - n) + (win - tile) - pad
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, max(right, 0))))
    # (C_out, C_in, K) -> (C_out, K*C_in), tap-major columns matching the
    # im2col stacking above (block j holds tap j's channels).
    w2 = weight.transpose(0, 2, 1).reshape(ch, k * ch)
    b2 = (bias if bias is not None else jnp.zeros((ch,), x.dtype)).reshape(ch, 1)

    nt = n_pad // tile
    grid = (b, nt)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k=k, dilation=dilation, tile=tile, win=win,
            act_slope=act_slope, ch=ch, nt=nt, total=b * nt, precision=precision,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((ch, k * ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, ch, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, ch, n_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ch, win), jnp.float32),
            pltpu.VMEM((k * ch, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w2, b2)
    return out[:, :, :n]
