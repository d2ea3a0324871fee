"""Pallas TPU kernel: whole HiFi-GAN MRF stage on a FOLDED layout.

The narrow late vocoder levels (ch=32/64) run GEMMs of M=ch rows, filling a
quarter/half of the MXU's 128 sublanes; a measured probe (docs/BENCH.md,
"Roofline" section) shows equal-FLOPs GEMMs on this chip run ~5x faster per
FLOP at M=128 than at M=32. Building the packed im2col from the natural
(B, C, N) layout inside the kernel needs lane-stride gathers Mosaic doesn't
offer — so this kernel changes the LAYOUT instead: the length axis is folded
into channels OUTSIDE the kernel (one cheap XLA transpose),

    x (B, C, N)  ->  xf (B, F*C, N/F),   xf[r*C + c, q] = x[c, F*q + r],

and every conv in the ResBlock chain is re-expressed over the folded layout
as a single GEMM with M = F*C output rows:

    out_f[r*C + co, q] = sum_{ci,j} w[co,ci,j] * xf[rho*C + ci, q + delta]
    where e = r + (j - (k-1)//2) * d,  rho = e mod F,  delta = floor(e / F).

The im2col needs only ordinary sublane-block reads at small static lane
offsets (delta), which the existing kernels already use. The folded weight
matrix W_f[(r, co), (s, ci)] is zero except where column s's offset e_s
equals r + (j-h)d — so the GEMM does S/k redundant FLOPs (S = number of
distinct e values, (k-1)d + F when d <= F, else k*F) in exchange for the
~5x better MXU rate at M=128. Net measured win is what decides (see
docs/BENCH.md); FLOP-exact per conv because each dilation keeps its own
schedule (no padding to a shared S).

Semantics match pallas_resblock1_mrf exactly: all branches + their mean in
one kernel, per-row [lo, hi) exact-length masking (now 2-D — the global
sample index depends on both the lane q and the fold row r), dead-tile
skipping, double-buffered window DMA. Reference: HiFi-GAN MRF mean
(reference Sources/PiperMetal interprets it node-by-node; here it is one
fused program).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piper_tpu.ops.pallas.conv import mxu_dot


class _Sched:
    """Folded-conv column schedule for one (kernel, dilation, fold)."""

    def __init__(self, k: int, d: int, F: int):
        h = (k - 1) // 2
        es = sorted({r + (j - h) * d for r in range(F) for j in range(k)})
        self.k, self.d, self.F = k, d, F
        self.es = es
        self.S = len(es)
        self.rho = [e % F for e in es]
        self.delta = [e // F for e in es]  # floor div: negatives correct
        self.s_of = {(r, j): es.index(r + (j - h) * d)
                     for r in range(F) for j in range(k)}
        self.mlq = -self.delta[0]   # left q-margin the conv consumes
        self.mrq = self.delta[-1]   # right q-margin


def _fold_weight(w: jnp.ndarray, sched: _Sched) -> jnp.ndarray:
    """(C_out, C_in, K) -> (F*C, S*C) folded GEMM weights (zeros elsewhere)."""
    ch = w.shape[0]
    F, k, S = sched.F, sched.k, sched.S
    wf = jnp.zeros((F, ch, S, ch), w.dtype)
    for r in range(F):
        for j in range(k):
            wf = wf.at[r, :, sched.s_of[(r, j)], :].set(w[:, :, j])
    return wf.reshape(F * ch, S * ch)


def _fold_bias(b: jnp.ndarray, F: int) -> jnp.ndarray:
    """(C,) -> (F*C, 1): each fold block repeats the channel bias."""
    return jnp.tile(b.reshape(1, -1), (F, 1)).reshape(-1, 1)


def _run_chain_folded(ybuf, tbuf, cols, w1_refs, b1_ref, w2_ref, b2_ref, act,
                      *, sch1: Sequence[_Sched], sch2: _Sched, ml0: int,
                      mr0: int, wb: int, ch: int, precision: str):
    """The six-conv ResBlock1 branch chain over the folded VMEM window in
    `ybuf` (in place). (ml0, mr0) are the already-consumed q-margins on each
    side — the window halo is sized for the widest sibling branch, so a
    narrower branch starts with the surplus margin consumed."""
    ml, mr = ml0, mr0

    def one_conv(src, sched, w, bias):
        a = ml + sched.mlq
        ar = mr + sched.mrq
        width = wb - a - ar
        for s in range(sched.S):
            off = a + sched.delta[s]
            rho = sched.rho[s]
            cols[s * ch : (s + 1) * ch, 0:width] = (
                src[rho * ch : (rho + 1) * ch, off : off + width])
        y = mxu_dot(w, cols[0 : sched.S * ch, 0:width], precision) + bias
        return y, a, ar, width

    for m in range(len(sch1)):
        # conv1 (dilated, folded schedule per dilation)
        y1, a1, ar1, w1 = one_conv(act(ybuf[:]), sch1[m], w1_refs[m][:],
                                   b1_ref[m])
        tbuf[:, a1 : a1 + w1] = y1
        # conv2 (dense)
        ml, mr = a1, ar1
        y2, a2, ar2, w2 = one_conv(act(tbuf[:]), sch2, w2_ref[m], b2_ref[m])
        ybuf[:, a2 : a2 + w2] = ybuf[:, a2 : a2 + w2] + y2
        ml, mr = a2, ar2


def _mrf_folded_kernel(bounds_ref, x_hbm, *args,
                       sch1_all: Sequence[Sequence[_Sched]],
                       sch2_all: Sequence[_Sched],
                       ml0s: Sequence[int], mr0s: Sequence[int],
                       F: int, hl: int, tile: int, wb: int, ch: int,
                       nt: int, total: int, slope: float, precision: str):
    """All MRF branches + mean over the folded layout (see module docstring).

    *args layout: per branch — M dilated-weight refs, b1 (M,FC,1), dense
    weights (M,FC,S2*C), b2 (M,FC,1) — then o_ref, then scratch
    (xwin, ybuf, tbuf, cols, acc, sems)."""
    nb = len(sch1_all)
    pos = 0
    branch_refs = []
    for b in range(nb):
        m = len(sch1_all[b])
        branch_refs.append((list(args[pos : pos + m]), args[pos + m],
                            args[pos + m + 1], args[pos + m + 2]))
        pos += m + 3
    o_ref = args[pos]
    xwin, ybuf, tbuf, cols, acc, sems = args[pos + 1 :]
    chF = F * ch

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
        # Output q-tile [t2*tile, t2*tile+tile) covers global samples
        # [F*t2*tile, F*(t2*tile+tile)); dead when wholly outside [lo, hi).
        # Row index clamped: see _branch_kernel's comment in resblock.py.
        i2 = jnp.minimum(step // nt, bounds_ref.shape[0] - 1)
        t2 = step % nt
        start = F * (t2 * tile)
        return jnp.logical_or(start >= bounds_ref[i2, 1],
                              start + F * tile <= bounds_ref[i2, 0])

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

        # Global sample of (row, lane): the buffer's lane l is q-column
        # t*tile + l - hl of the unpadded folded array; fold row r = row//ch;
        # sample g = F*q + r. The mask is 2-D because g depends on both.
        lane = jax.lax.broadcasted_iota(jnp.int32, (chF, wb), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (chF, wb), 0)
        g = F * (t * tile + lane - hl) + row // ch
        lo = bounds_ref[i, 0]
        hi = bounds_ref[i, 1]
        mask = jnp.logical_and(g >= lo, g < hi).astype(jnp.float32)

        def act(v):
            v = jnp.where(v >= 0, v, v * slope)
            return v * mask

        acc[:] = jnp.zeros_like(acc)
        for b in range(nb):
            w1_refs, b1_ref, w2_ref, b2_ref = branch_refs[b]
            ybuf[:] = xwin[slot]
            _run_chain_folded(ybuf, tbuf, cols, w1_refs, b1_ref, w2_ref,
                              b2_ref, act, sch1=sch1_all[b], sch2=sch2_all[b],
                              ml0=ml0s[b], mr0=mr0s[b], wb=wb, ch=ch,
                              precision=precision)
            acc[:] = acc[:] + ybuf[:, hl : hl + tile]

        o_ref[:] = acc[:] * (1.0 / nb) * mask[:, hl : hl + tile]


def fold_time_axis(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """(B, C, N) -> (B, F*C, ceil(N/F)) with xf[r*C+c, q] = x[c, F*q+r]."""
    b, ch, n = x.shape
    nq = -(-n // F)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, nq * F - n)))
    return xp.reshape(b, ch, nq, F).transpose(0, 3, 1, 2).reshape(b, F * ch, nq)


def unfold_time_axis(xf: jnp.ndarray, F: int, n: int) -> jnp.ndarray:
    """Inverse of fold_time_axis (sliced back to length n)."""
    b, chF, nq = xf.shape
    ch = chF // F
    x = xf.reshape(b, F, ch, nq).transpose(0, 2, 3, 1).reshape(b, ch, nq * F)
    return x[:, :, :n]


def pallas_resblock1_mrf_folded(
    x: jnp.ndarray,
    branches: Sequence[tuple],  # (w1s (M,C,C,K), b1s, w2s, b2s, kernel, dilations)
    *,
    fold: int = 4,
    bounds: Optional[jnp.ndarray] = None,  # (B,) [0, hi) or (B, 2) [lo, hi)
    slope: float = 0.1,
    tile: int = 512,           # q-columns per grid step (F*tile samples)
    interpret: bool = False,
    precision: str = "highest",
    vmem_budget: int = 4 * 1024 * 1024,
) -> jnp.ndarray:
    """Whole MRF stage (all branches + mean) on the folded layout.

    Same contract as pallas_resblock1_mrf; `fold` picks F (F*C should be 128
    to fill the MXU sublanes: F=4 at ch=32, F=2 at ch=64). The fold/unfold
    transposes run in XLA outside the kernel (~2 extra HBM passes of the
    level activation, negligible next to the conv chain)."""
    from piper_tpu.ops.pallas.conv import force_interpret

    interpret = interpret or force_interpret()
    b, ch, n = x.shape
    F = fold
    ks = [int(br[4]) for br in branches]
    dils_list = [tuple(int(d) for d in br[5]) for br in branches]

    # Per-branch schedules and q-margins.
    sch1_all: List[Tuple[_Sched, ...]] = []
    sch2_all: List[_Sched] = []
    mls, mrs = [], []
    for k, dils in zip(ks, dils_list):
        sch1 = tuple(_Sched(k, d, F) for d in dils)
        sch2 = _Sched(k, 1, F)
        sch1_all.append(sch1)
        sch2_all.append(sch2)
        mls.append(sum(s.mlq + sch2.mlq for s in sch1))
        mrs.append(sum(s.mrq + sch2.mrq for s in sch1))
    hl, hr = max(mls), max(mrs)
    ml0s = tuple(hl - m for m in mls)
    mr0s = tuple(hr - m for m in mrs)
    s_max = max(max(s.S for s in sch1) for sch1 in sch1_all)
    s_max = max(s_max, max(s.S for s in sch2_all))

    xf = fold_time_axis(x, F)
    nq = xf.shape[2]
    chF = F * ch

    # Tile from the VMEM budget (cols is the big consumer at (s_max*ch, wb)).
    max_tile = vmem_budget // (s_max * ch * 4)
    tile = min(tile, max(256, max_tile // 128 * 128))
    tile = min(tile, max(128, -(-nq // 128) * 128))
    nq_pad = -(-nq // tile) * tile
    wb = -(-(tile + hl + hr) // 128) * 128
    right = (nq_pad - nq) + (wb - tile - hl)
    xfp = jnp.pad(xf, ((0, 0), (0, 0), (hl, max(right, 0))))

    weight_arrays = []
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for bi, (w1s, b1s, w2s, b2s, k, _dils) in enumerate(branches):
        m = w1s.shape[0]
        for mm in range(m):
            wf = _fold_weight(w1s[mm], sch1_all[bi][mm])
            weight_arrays.append(wf)
            in_specs.append(pl.BlockSpec(wf.shape, lambda i, t, *_: (0, 0),
                                         memory_space=pltpu.VMEM))
        b1f = jnp.stack([_fold_bias(b1s[mm], F) for mm in range(m)])
        w2f = jnp.stack([_fold_weight(w2s[mm], sch2_all[bi]) for mm in range(m)])
        b2f = jnp.stack([_fold_bias(b2s[mm], F) for mm in range(m)])
        weight_arrays += [b1f, w2f, b2f]
        in_specs += [
            pl.BlockSpec(b1f.shape, lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, lambda i, t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2f.shape, lambda i, t, *_: (0, 0, 0),
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

    nt = nq_pad // tile
    grid = (b, nt)
    out = pl.pallas_call(
        functools.partial(
            _mrf_folded_kernel, sch1_all=tuple(sch1_all),
            sch2_all=tuple(sch2_all), ml0s=ml0s, mr0s=mr0s, F=F, hl=hl,
            tile=tile, wb=wb, ch=ch, nt=nt, total=b * nt, slope=slope,
            precision=precision,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((None, chF, tile), lambda i, t, *_: (i, 0, t),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chF, wb), jnp.float32),
                pltpu.VMEM((chF, wb), jnp.float32),
                pltpu.VMEM((chF, wb), jnp.float32),
                pltpu.VMEM((s_max * ch, wb), jnp.float32),
                pltpu.VMEM((chF, tile), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, chF, nq_pad), x.dtype),
        interpret=interpret,
    )(bounds_arr, xfp, *weight_arrays)
    return unfold_time_axis(out[:, :, :nq], F, n)
