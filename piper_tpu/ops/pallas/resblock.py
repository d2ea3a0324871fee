"""Pallas TPU kernel: one whole HiFi-GAN ResBlock1 branch in VMEM.

A branch is y = x; for m in 0..M-1: y += conv2_m(lrelu(conv1_m(lrelu(y))))
with conv1_m dilated and conv2_m dense — six narrow convs chained. Run as
separate kernels each conv streams the full activation through HBM; on this
chip that stream is the bottleneck (~5 ms per conv at the late levels,
matching bytes/55 GB/s). This kernel DMAs one haloed window per time tile,
keeps the entire chain in VMEM, and writes only the central tile — cutting
HBM traffic by ~6x per branch.

Margins: each stage consumes (k-1)/2*d_m + (k-1)/2 lanes per side; the
window halo is the total, so the central tile is exact (the same shrinking-
validity argument as streaming windows).

Exact-length semantics: `bounds` gives each row's valid sample interval at
this level's rate — (B,) meaning [0, hi) for bulk decode, or (B, 2) [lo, hi)
for streaming windows whose left edge sits mid-sequence; lanes at global
positions outside the interval are zeroed after every activation,
reproducing a dynamic-shape array edge (what hifigan's t_mask does, but in
VMEM for free).

`precision` picks the MXU tier for the six dots: "highest" (fp32),
"high" (3-pass bf16 split — tf32-class), or "default"/"bfloat16"
(single-pass bf16). The late levels are HBM-bound on this chip, so lower
tiers mainly help once activations shrink; the tier is calibrated against
the torch oracle in tools/calibrate_precision.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piper_tpu.ops.pallas.conv import mxu_dot


def _run_branch_chain(ybuf, tbuf, cols, w1_ref, b1_ref, w2_ref, b2_ref, act,
                      *, k: int, dils: Sequence[int], margin0: int, wb: int,
                      ch: int, precision: str):
    """The six-conv ResBlock1 branch chain over the VMEM window in `ybuf`
    (in place). `margin0` is the already-consumed margin on each side — 0
    when the window halo equals this branch's receptive field, larger when
    the window was sized for a wider sibling branch (MRF fusion)."""
    h2 = (k - 1) // 2
    margin = margin0
    for m, d in enumerate(dils):
        h1 = (k - 1) // 2 * d
        # conv1 (dilated): output valid on [margin+h1, wb-margin-h1)
        a1 = margin + h1
        width1 = wb - 2 * a1
        src = act(ybuf[:])
        for j in range(k):
            off = a1 - h1 + j * d
            cols[j * ch : (j + 1) * ch, 0:width1] = src[:, off : off + width1]
        y1 = mxu_dot(w1_ref[m], cols[0 : k * ch, 0:width1], precision) + b1_ref[m]
        tbuf[:, a1 : a1 + width1] = y1
        # conv2 (dense): output valid on [a1+h2, wb-a1-h2)
        a2 = a1 + h2
        width2 = wb - 2 * a2
        src2 = act(tbuf[:])
        for j in range(k):
            off = a2 - h2 + j
            cols[j * ch : (j + 1) * ch, 0:width2] = src2[:, off : off + width2]
        y2 = mxu_dot(w2_ref[m], cols[0 : k * ch, 0:width2], precision) + b2_ref[m]
        # residual: y += y2 on the valid region
        ybuf[:, a2 : a2 + width2] = ybuf[:, a2 : a2 + width2] + y2
        margin = a2


def _branch_kernel(bounds_ref, x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                   xwin, ybuf, tbuf, cols, sems, *,
                   k: int, dils: Sequence[int], tile: int, wb: int, ch: int,
                   nt: int, total: int, slope: float, precision: str):
    i = pl.program_id(0)
    t = pl.program_id(1)
    s = i * nt + t

    def dma_for(step, slot):
        i2 = step // nt
        t2 = step % nt
        return pltpu.make_async_copy(
            x_hbm.at[i2, :, pl.ds(t2 * tile, wb)], xwin.at[slot], sems.at[slot]
        )

    def dead(step):
        # A step is dead when its whole OUTPUT tile [t2*tile, t2*tile+tile)
        # lies outside its row's [lo, hi): the kernel's output there is
        # defined as zero, so the window DMA and the 6 dots can be skipped
        # entirely. On bucket-padded decodes the tail tiles of every row
        # are dead (e.g. 167 valid frames in a 192-frame bucket kills ~13%
        # of tiles at every upsample level).
        # Clamp the row index: dead(s+1) is evaluated as a pl.when operand
        # even on the last step, where step//nt would read one row past the
        # (B, 2) prefetch buffer (the result is discarded by the AND with
        # `s+1 < total`, but the read itself must stay in bounds).
        i2 = jnp.minimum(step // nt, bounds_ref.shape[0] - 1)
        t2 = step % nt
        start = t2 * tile
        return jnp.logical_or(start >= bounds_ref[i2, 1],
                              start + tile <= bounds_ref[i2, 0])

    @pl.when(jnp.logical_and(s == 0, jnp.logical_not(dead(0))))
    def _():
        dma_for(0, 0).start()

    slot = jax.lax.rem(s, 2)

    @pl.when(jnp.logical_and(s + 1 < total, jnp.logical_not(dead(s + 1))))
    def _():
        dma_for(s + 1, jax.lax.rem(s + 1, 2)).start()

    h2 = (k - 1) // 2
    halo_total = sum((k - 1) // 2 * d + h2 for d in dils)

    @pl.when(dead(s))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(dead(s)))
    def _():
        dma_for(s, slot).wait()
        ybuf[:] = xwin[slot]

        # Global sample index of lane l: t*tile + l - halo_total (x was
        # left-padded by the halo). Valid iff lo <= g < hi. The mask is
        # ALWAYS applied: without it, bias propagation into the left halo
        # lanes (global g < lo) diverges from the real array edge; it also
        # provides exact-length (dynamic-shape) semantics past each row's
        # bound.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
        g = t * tile + lane - halo_total
        lo = bounds_ref[i, 0]
        hi = bounds_ref[i, 1]
        mask = jnp.logical_and(g >= lo, g < hi).astype(jnp.float32)

        def act(v):
            v = jnp.where(v >= 0, v, v * slope)
            return v * mask

        _run_branch_chain(ybuf, tbuf, cols, w1_ref, b1_ref, w2_ref, b2_ref,
                          act, k=k, dils=dils, margin0=0, wb=wb, ch=ch,
                          precision=precision)

        # The output is masked to the valid interval: beyond [lo, hi) the
        # kernel's result is EXACTLY zero (not bias-propagated garbage), so
        # the value is independent of tile size and dead-tile skipping, and
        # downstream levels see the same zeros the array-level t_mask gives.
        o_ref[:] = (ybuf[:, halo_total : halo_total + tile]
                    * mask[:, halo_total : halo_total + tile])


def pallas_resblock1_branch(
    x: jnp.ndarray,
    w1s: jnp.ndarray,   # (M, C, C, K) conv1 weights (dilated convs)
    b1s: jnp.ndarray,   # (M, C)
    w2s: jnp.ndarray,   # (M, C, C, K) conv2 weights (dense convs)
    b2s: jnp.ndarray,   # (M, C)
    *,
    kernel: int,
    dilations: Sequence[int],
    bounds: Optional[jnp.ndarray] = None,  # (B,) [0, hi) or (B, 2) [lo, hi)
    slope: float = 0.1,
    tile: int = 2048,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """One ResBlock1 branch: returns y after all (conv1, conv2, +) stages."""
    from piper_tpu.ops.pallas.conv import force_interpret

    interpret = interpret or force_interpret()
    b, ch, n = x.shape
    m = len(dilations)
    k = kernel
    h2 = (k - 1) // 2
    halo = sum((k - 1) // 2 * d + h2 for d in dilations)

    vmem_budget = 4 * 1024 * 1024
    max_tile = vmem_budget // (k * ch * 4)
    tile = min(tile, max(512, max_tile // 128 * 128))
    tile = min(tile, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    wb = -(-(tile + 2 * halo) // 128) * 128
    extra = wb - tile - halo  # right-side pad beyond the left halo
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, max(extra + (n_pad - n), 0))))

    # (M, C_out, C_in, K) -> (M, C_out, K*C_in) tap-major to match im2col.
    w1p = w1s.transpose(0, 1, 3, 2).reshape(m, ch, k * ch)
    w2p = w2s.transpose(0, 1, 3, 2).reshape(m, ch, k * ch)
    b1p = b1s.reshape(m, ch, 1)
    b2p = b2s.reshape(m, ch, 1)
    if bounds is None:
        bounds_arr = jnp.stack(
            [jnp.zeros((b,), jnp.int32), jnp.full((b,), n, jnp.int32)], axis=1
        )
    else:
        bounds = bounds.astype(jnp.int32)
        if bounds.ndim == 1:
            bounds_arr = jnp.stack([jnp.zeros_like(bounds), bounds], axis=1)
        else:
            bounds_arr = bounds

    nt = n_pad // tile
    grid = (b, nt)
    out = pl.pallas_call(
        functools.partial(
            _branch_kernel, k=k, dils=tuple(dilations), tile=tile, wb=wb, ch=ch,
            nt=nt, total=b * nt, slope=slope, precision=precision,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((m, ch, k * ch), lambda i, t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, ch, 1), lambda i, t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, ch, k * ch), lambda i, t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, ch, 1), lambda i, t, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, ch, tile), lambda i, t, *_: (i, 0, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, ch, wb), jnp.float32),
                pltpu.VMEM((ch, wb), jnp.float32),
                pltpu.VMEM((ch, wb), jnp.float32),
                pltpu.VMEM((k * ch, wb), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, ch, n_pad), x.dtype),
        interpret=interpret,
    )(bounds_arr, xp, w1p, b1p, w2p, b2p)
    return out[:, :, :n]


def _mrf_kernel(bounds_ref, x_hbm, *args,
                ks: Sequence[int], dils_list: Sequence[Sequence[int]],
                tile: int, wb: int, ch: int, nt: int, total: int,
                slope: float, precision: str, halo: int):
    """All MRF branches + their mean in ONE kernel (see pallas_resblock1_mrf).

    Layout of *args: 4 weight refs per branch (w1, b1, w2, b2), then o_ref,
    then scratch (xwin, ybuf, tbuf, cols, acc, sems)."""
    nb = len(ks)
    wrefs = args[: 4 * nb]
    o_ref = args[4 * nb]
    xwin, ybuf, tbuf, cols, acc, sems = args[4 * nb + 1 :]
    i = pl.program_id(0)
    t = pl.program_id(1)
    s = i * nt + t

    def dma_for(step, slot):
        i2 = step // nt
        t2 = step % nt
        return pltpu.make_async_copy(
            x_hbm.at[i2, :, pl.ds(t2 * tile, wb)], xwin.at[slot], sems.at[slot]
        )

    def dead(step):
        # Same dead-tile predicate as _branch_kernel (see its comment).
        i2 = jnp.minimum(step // nt, bounds_ref.shape[0] - 1)
        t2 = step % nt
        start = t2 * tile
        return jnp.logical_or(start >= bounds_ref[i2, 1],
                              start + tile <= bounds_ref[i2, 0])

    @pl.when(jnp.logical_and(s == 0, jnp.logical_not(dead(0))))
    def _():
        dma_for(0, 0).start()

    slot = jax.lax.rem(s, 2)

    @pl.when(jnp.logical_and(s + 1 < total, jnp.logical_not(dead(s + 1))))
    def _():
        dma_for(s + 1, jax.lax.rem(s + 1, 2)).start()

    @pl.when(dead(s))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(jnp.logical_not(dead(s)))
    def _():
        dma_for(s, slot).wait()

        # Global sample index of lane l: t*tile + l - halo (x was left-padded
        # by the SHARED halo — the widest branch's receptive field).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1)
        g = t * tile + lane - halo
        lo = bounds_ref[i, 0]
        hi = bounds_ref[i, 1]
        mask = jnp.logical_and(g >= lo, g < hi).astype(jnp.float32)

        def act(v):
            v = jnp.where(v >= 0, v, v * slope)
            return v * mask

        acc[:] = jnp.zeros_like(acc)
        for b in range(nb):
            k = ks[b]
            dils = dils_list[b]
            h2 = (k - 1) // 2
            halo_b = sum((k - 1) // 2 * d + h2 for d in dils)
            w1_ref, b1_ref, w2_ref, b2_ref = wrefs[4 * b : 4 * b + 4]
            # Each branch restarts from the SAME input window; a narrower
            # branch begins with the margin its smaller receptive field
            # doesn't need already consumed, so every branch's valid region
            # covers the central tile exactly.
            ybuf[:] = xwin[slot]
            _run_branch_chain(ybuf, tbuf, cols, w1_ref, b1_ref, w2_ref,
                              b2_ref, act, k=k, dils=dils,
                              margin0=halo - halo_b, wb=wb, ch=ch,
                              precision=precision)
            acc[:] = acc[:] + ybuf[:, halo : halo + tile]

        # Mean over branches, masked to the valid interval (exact-length
        # semantics — see _branch_kernel's output comment).
        o_ref[:] = acc[:] * (1.0 / nb) * mask[:, halo : halo + tile]


def pallas_resblock1_mrf(
    x: jnp.ndarray,
    branches: Sequence[tuple],  # (w1s (M,C,C,K), b1s, w2s, b2s, kernel, dilations)
    *,
    bounds: Optional[jnp.ndarray] = None,  # (B,) [0, hi) or (B, 2) [lo, hi)
    slope: float = 0.1,
    tile: int = 2048,
    interpret: bool = False,
    precision: str = "highest",
    vmem_budget: int = 4 * 1024 * 1024,
) -> jnp.ndarray:
    """The whole multi-receptive-field stage — every ResBlock1 branch AND
    their mean — in one Pallas kernel.

    Per-branch kernels stream the level activation through HBM 7 times
    (3 branch reads + 3 branch writes + the mean's reads); at the narrow
    late levels that traffic IS the roofline (docs/BENCH.md round-3 table:
    up2/up3 memory-bound at 73-92% of best observed bandwidth). This kernel
    reads the haloed window once, runs all branches from VMEM, and writes
    only the averaged central tile — ~3.5x less HBM traffic per level.
    Reference semantics: HiFi-GAN MRF sum/num_kernels (Generator.forward,
    reference Sources/PiperMetal mirrors it node-by-node).

    `vmem_budget` caps the im2col scratch (hence the tile width). Raising
    it to 8 MB fails Mosaic compilation on v5e (total scratch — cols +
    double-buffered window + branch buffers + stacked weights — exceeds
    VMEM), so the 4 MB default is the measured practical ceiling, not a
    conservative guess."""
    from piper_tpu.ops.pallas.conv import force_interpret

    interpret = interpret or force_interpret()
    b, ch, n = x.shape
    ks = [int(br[4]) for br in branches]
    dils_list = [tuple(int(d) for d in br[5]) for br in branches]
    halos = [sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils)
             for k, dils in zip(ks, dils_list)]
    halo = max(halos)
    k_max = max(ks)

    max_tile = vmem_budget // (k_max * ch * 4)
    tile = min(tile, max(512, max_tile // 128 * 128))
    tile = min(tile, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    wb = -(-(tile + 2 * halo) // 128) * 128
    extra = wb - tile - halo  # right-side pad beyond the left halo
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, max(extra + (n_pad - n), 0))))

    weight_arrays = []
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for (w1s, b1s, w2s, b2s, k, _dils) in branches:
        m = w1s.shape[0]
        # (M, C_out, C_in, K) -> (M, C_out, K*C_in) tap-major (im2col order).
        weight_arrays += [
            w1s.transpose(0, 1, 3, 2).reshape(m, ch, k * ch),
            b1s.reshape(m, ch, 1),
            w2s.transpose(0, 1, 3, 2).reshape(m, ch, k * ch),
            b2s.reshape(m, ch, 1),
        ]
        in_specs += [
            pl.BlockSpec((m, ch, k * ch), lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ch, 1), lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ch, k * ch), lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ch, 1), lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    if bounds is None:
        bounds_arr = jnp.stack(
            [jnp.zeros((b,), jnp.int32), jnp.full((b,), n, jnp.int32)], axis=1
        )
    else:
        bounds = bounds.astype(jnp.int32)
        if bounds.ndim == 1:
            bounds_arr = jnp.stack([jnp.zeros_like(bounds), bounds], axis=1)
        else:
            bounds_arr = bounds

    nt = n_pad // tile
    grid = (b, nt)
    out = pl.pallas_call(
        functools.partial(
            _mrf_kernel, ks=tuple(ks), dils_list=tuple(dils_list), tile=tile,
            wb=wb, ch=ch, nt=nt, total=b * nt, slope=slope,
            precision=precision, halo=halo,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((None, ch, tile), lambda i, t, *_: (i, 0, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, ch, wb), jnp.float32),
                pltpu.VMEM((ch, wb), jnp.float32),
                pltpu.VMEM((ch, wb), jnp.float32),
                pltpu.VMEM((k_max * ch, wb), jnp.float32),
                pltpu.VMEM((ch, tile), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, ch, n_pad), x.dtype),
        interpret=interpret,
    )(bounds_arr, xp, *weight_arrays)
    return out[:, :, :n]
