"""Pipeline parallelism: the VITS decode split into stages over a `pp` mesh
axis, GPipe-style (microbatches streamed stage-to-stage over ICI).

The reference is single-device (SURVEY.md §2.9), so — like dp/sp/tp — this is
a TPU-native obligation, not a port. dp scales throughput and tp cuts
single-utterance latency by sharding channels; pp is the third axis of the
classic parallelism triad: each device holds a contiguous *slice of the
graph* (flows + a run of vocoder upsample levels), microbatches of rows flow
through the stages, and at steady state all stages compute concurrently on
different microbatches. It composes with dp (rows shard over dp, each dp
group runs its own pipeline) and is the formulation that matters when a
model's weights or activations outgrow one chip — demonstrated here on the
model family we have.

Design (all manual-SPMD via `jax.shard_map`, the idiomatic JAX pipeline
formulation — XLA cannot invent a pipeline schedule, so unlike tp this one
is hand-scheduled):

- The decode graph is cut into UNITS: [front (alignment expand + reverse
  flows + conv_pre), up0..upN (one vocoder upsample level each), post
  (conv_post + tanh)]. Units map 1:1 onto the measured roofline stages
  (utils/roofline.py), and the stage partition is chosen by minimizing the
  max analytic FLOPs per stage over contiguous cuts — the roofline model is
  the load balancer.
- Inter-stage activations have different shapes per boundary (channels halve
  and time dilates through the upsample stack), but an SPMD pipeline needs
  ONE ppermute buffer: each stage flattens its output into a common
  max-sized (mb, E) float32 buffer; the next stage slices its statically
  known prefix back out. Per-row `y_len` rides alongside so every stage can
  reconstruct its exact-length masks locally (the masks are prefix-of-ones,
  so `sequence_mask(y_len * upsample_so_far)` is bit-identical to the
  repeat-upsampled mask the single-device decode carries).
- Stage dispatch is `lax.switch` on `axis_index("pp")`: every device
  compiles all stages, executes only its own — the standard trick for
  heterogeneous-stage pipelines under SPMD.
- The schedule is a `lax.scan` over M + S - 1 ticks (M microbatches,
  S stages): tick t has stage s working microbatch t - s; the last stage
  scatters finished audio into the output buffer, and a final psum over pp
  replicates it (every other stage contributed zeros).

Fidelity: the stage functions reuse the exact building blocks of
`models/vits/hifigan.py` (same op order, same masking, same precision
scopes), so the pipelined decode matches `model.decode` to float
associativity — asserted in tests/test_pp.py.
"""

from __future__ import annotations

import itertools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from piper_tpu.models.vits.flows import flow_reverse
from piper_tpu.models.vits.hifigan import (
    LRELU_SLOPE,
    _prec_ctx,
    _resblock1,
    _resblock2,
)
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.model import EncodeResult, _matmul_precision
from piper_tpu.models.vits.params import Params, Prefix
from piper_tpu.ops.conv import conv1d, conv_transpose1d
from piper_tpu.ops.masking import generate_path, sequence_mask
from piper_tpu.ops.nn import leaky_relu
from piper_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


# --------------------------------------------------------------------------
# Stage partitioning (roofline-balanced)
# --------------------------------------------------------------------------


def unit_names(hp: VitsHParams) -> List[str]:
    return ["front"] + [f"up{i}" for i in range(hp.num_upsamples)] + ["post"]


def unit_flops(hp: VitsHParams, max_frames: int) -> List[float]:
    """Analytic FLOPs per pipeline unit at B=1 (relative weights only), from
    the same cost model the roofline report uses."""
    from piper_tpu.utils.roofline import flow_cost, vocoder_level_costs

    voc = vocoder_level_costs(hp, 1, max_frames)  # [pre, up0.., post]
    front = flow_cost(hp, 1, max_frames).flops + voc[0].flops
    return [front] + [c.flops for c in voc[1:-1]] + [voc[-1].flops]


def balanced_cuts(costs: Sequence[float], n_stages: int) -> List[int]:
    """Contiguous partition of `costs` into `n_stages` runs minimizing the
    max per-stage sum. Returns cut indices, len n_stages+1, cuts[0]=0,
    cuts[-1]=len(costs). Unit counts are tiny (<=7), so brute force."""
    n = len(costs)
    if n_stages > n:
        raise ValueError(
            f"pipeline has only {n} units ({n_stages} stages requested); "
            f"this voice supports at most pp={n}"
        )
    best, best_cuts = math.inf, None
    for mid in itertools.combinations(range(1, n), n_stages - 1):
        cuts = (0,) + mid + (n,)
        worst = max(
            sum(costs[cuts[s]: cuts[s + 1]]) for s in range(n_stages)
        )
        if worst < best:
            best, best_cuts = worst, cuts
    return list(best_cuts)


def _boundary_shapes(hp: VitsHParams, max_frames: int) -> List[Tuple[int, int]]:
    """(C, T) after each unit except post (post emits audio, not a boundary)."""
    u0 = hp.upsample_initial_channel
    shapes = [(u0, max_frames)]
    t = max_frames
    for i in range(hp.num_upsamples):
        t *= hp.upsample_rates[i]
        shapes.append((u0 // (2 ** (i + 1)), t))
    return shapes


# --------------------------------------------------------------------------
# Per-unit compute (mirrors hifigan_generator's unfused path exactly)
# --------------------------------------------------------------------------


def _level_precisions(hp: VitsHParams, vocoder_precision):
    if isinstance(vocoder_precision, str):
        return [vocoder_precision] * hp.num_upsamples
    if vocoder_precision is None:
        return [None] * hp.num_upsamples
    return list(vocoder_precision)


def _make_unit_fns(hp: VitsHParams, max_frames: int, *, noise_scale,
                   vocoder_precision, flow_precision, use_resblock2: bool):
    """Unit index -> fn(params, x, y_len, mb_in) -> next activation.

    y_len is (mb,) float frame counts; masks at any resolution are
    reconstructed from it (prefix-of-ones ≡ the repeat-upsampled mask the
    single-device hifigan_generator carries)."""
    lp = _level_precisions(hp, vocoder_precision)
    nk = hp.num_resblock_kernels

    def front(params, _x, y_len, mb_in):
        m_p, logs_p, x_mask, w_ceil, noise = mb_in[:5]
        g = mb_in[5] if len(mb_in) > 5 else None
        y_mask = sequence_mask(
            y_len.astype(jnp.int32), max_frames).astype(m_p.dtype)
        path = generate_path(w_ceil, x_mask, y_mask)
        m_e = jnp.einsum("btp,bcp->bct", path, m_p)
        logs_e = jnp.einsum("btp,bcp->bct", path, logs_p)
        z_p = m_e + noise.astype(m_e.dtype) * jnp.exp(logs_e) * noise_scale
        with _matmul_precision(flow_precision):
            z = flow_reverse(z_p, y_mask, params, hp, g=g)
        p = Prefix(params, "dec")
        with _prec_ctx(lp[0]):
            x = conv1d(z * y_mask, p["conv_pre.weight"], p["conv_pre.bias"],
                       padding=3)
            if g is not None:
                x = x + conv1d(g, p["cond.weight"], p["cond.bias"])
        return x

    def make_level(i: int):
        r_in = 1
        for u in hp.upsample_rates[:i]:
            r_in *= u
        k, u = hp.upsample_kernel_sizes[i], hp.upsample_rates[i]

        def level(params, x, y_len, _mb_in):
            p = Prefix(params, "dec")
            m = sequence_mask(y_len * r_in, max_frames * r_in).astype(x.dtype)
            with _prec_ctx(lp[i]):
                x = leaky_relu(x * m, LRELU_SLOPE)
                x = conv_transpose1d(
                    x * m, p[f"ups.{i}.weight"], p[f"ups.{i}.bias"],
                    stride=u, padding=(k - u) // 2)
                m = sequence_mask(
                    y_len * (r_in * u), max_frames * r_in * u).astype(x.dtype)
                x = x * m
                acc = None
                for j in range(nk):
                    rb = p.sub(f"resblocks.{i * nk + j}")
                    kernel = hp.resblock_kernel_sizes[j]
                    dils = hp.resblock_dilation_sizes[j]
                    y = (
                        _resblock2(x, rb, kernel, dils, t_mask=m,
                                   precision=lp[i])
                        if use_resblock2
                        else _resblock1(x, rb, kernel, dils, t_mask=m,
                                        precision=lp[i])
                    )
                    acc = y if acc is None else acc + y
                x = acc / nk
            return x

        return level

    def post(params, x, y_len, _mb_in):
        p = Prefix(params, "dec")
        r = 1
        for u in hp.upsample_rates:
            r *= u
        m = sequence_mask(y_len * r, max_frames * r).astype(x.dtype)
        with _prec_ctx(lp[-1]):
            x = leaky_relu(x * m)  # final activation: torch default slope
            x = conv1d(x * m, p["conv_post.weight"], p["conv_post.bias"],
                       padding=3)
        return (jnp.tanh(x) * m)[:, 0, :]

    return [front] + [make_level(i) for i in range(hp.num_upsamples)] + [post]


# --------------------------------------------------------------------------
# The pipelined decode program
# --------------------------------------------------------------------------


def default_microbatches(rows: int, n_stages: int) -> int:
    """Largest divisor of `rows` that is <= 2 * n_stages: enough microbatches
    to keep the bubble fraction (S-1)/(M+S-1) low without shrinking each
    microbatch's MXU tiles to nothing."""
    for m in range(min(rows, 2 * n_stages), 0, -1):
        if rows % m == 0:
            return m
    return 1


def build_pp_decode(
    mesh: Mesh,
    hp: VitsHParams,
    *,
    max_frames: int,
    rows_per_dp: int,
    microbatches: Optional[int] = None,
    with_g: bool,
    noise_scale: float = 0.667,
    vocoder_precision=None,
    flow_precision: Optional[str] = None,
    precision: str = "highest",
):
    """Build (not yet jitted) the shard_map'd pipelined decode.

    Returns fn(params, m_p, logs_p, x_mask, w_ceil, noise[, g]) ->
    (audio (B, max_frames*hop), y_lengths (B,)) with batch inputs sharded
    over dp and pipeline stages over pp. B = dp * rows_per_dp.
    """
    S = int(mesh.shape.get(PIPE_AXIS, 1))
    if S < 2:
        raise ValueError("build_pp_decode needs a mesh with pp >= 2")
    for ax in ("sp", "tp"):
        if int(mesh.shape.get(ax, 1)) != 1:
            raise NotImplementedError(
                f"pipeline parallelism composes with dp only; mesh has {ax}="
                f"{mesh.shape[ax]}"
            )
    M = microbatches or default_microbatches(rows_per_dp, S)
    if rows_per_dp % M != 0:
        raise ValueError(f"rows_per_dp {rows_per_dp} not divisible by "
                         f"microbatches {M}")
    mb = rows_per_dp // M

    cuts = balanced_cuts(unit_flops(hp, max_frames), S)
    bshapes = _boundary_shapes(hp, max_frames)
    # Stage s's output boundary is after unit cuts[s+1]-1 (except the last
    # stage, which emits audio); E sizes the shared ppermute buffer.
    E = max(
        bshapes[cuts[s + 1] - 1][0] * bshapes[cuts[s + 1] - 1][1]
        for s in range(S - 1)
    )
    hop = hp.hop_length
    t_samp = max_frames * hop
    use_rb2 = hp.resblock == "2"
    unit_fns = _make_unit_fns(
        hp, max_frames, noise_scale=noise_scale,
        vocoder_precision=vocoder_precision, flow_precision=flow_precision,
        use_resblock2=use_rb2)

    def make_branch(s: int):
        lo, hi = cuts[s], cuts[s + 1]
        is_first, is_last = s == 0, s == S - 1

        def branch(params, recv, mb_in):
            if is_first:
                w_ceil = mb_in[3]
                y_len = jnp.clip(jnp.sum(w_ceil, axis=-1), 1, max_frames)
                x = None
            else:
                y_len = recv["ylen"]
                c_in, t_in = bshapes[lo - 1]
                x = recv["buf"][:, : c_in * t_in].reshape(mb, c_in, t_in)
            for u in range(lo, hi):
                x = unit_fns[u](params, x, y_len, mb_in)
            if is_last:
                return {
                    "buf": jnp.zeros((mb, E), jnp.float32),
                    "ylen": y_len,
                    "audio": x,
                }
            flat = x.reshape(mb, -1).astype(jnp.float32)
            buf = jnp.pad(flat, ((0, 0), (0, E - flat.shape[1])))
            return {"buf": buf, "ylen": y_len,
                    "audio": jnp.zeros((mb, t_samp), jnp.float32)}

        return branch

    branches = [make_branch(s) for s in range(S)]
    perm = [(i, i + 1) for i in range(S - 1)]

    def shard_fn(params, m_p, logs_p, x_mask, w_ceil, noise, g):
        # Per-device shapes: (rows_per_dp, ...) -> (M, mb, ...).
        def to_mb(a):
            return a.reshape(M, mb, *a.shape[1:])

        mbs = [to_mb(m_p), to_mb(logs_p), to_mb(x_mask), to_mb(w_ceil),
               to_mb(noise)]
        if with_g:
            mbs.append(to_mb(g))
        s_idx = lax.axis_index(PIPE_AXIS)
        is_last_stage = s_idx == S - 1

        def step(carry, t):
            pack, out_a, out_l = carry
            recv = jax.tree.map(
                lambda a: lax.ppermute(a, PIPE_AXIS, perm), pack)
            ti = jnp.clip(t, 0, M - 1)
            mb_in = tuple(a[ti] for a in mbs)
            with jax.default_matmul_precision(precision):
                new = lax.switch(
                    s_idx, [lambda r, i, _b=b: _b(params, r, i)
                            for b in branches], recv, mb_in)
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = jnp.logical_and(t >= S - 1, is_last_stage)
            row_a = jnp.where(valid, new["audio"], out_a[widx])
            out_a = lax.dynamic_update_index_in_dim(out_a, row_a, widx, 0)
            row_l = jnp.where(valid, new["ylen"], out_l[widx])
            out_l = lax.dynamic_update_index_in_dim(out_l, row_l, widx, 0)
            return ({"buf": new["buf"], "ylen": new["ylen"]},
                    out_a, out_l), None

        init = (
            {"buf": jnp.zeros((mb, E), jnp.float32),
             "ylen": jnp.zeros((mb,), w_ceil.dtype)},
            jnp.zeros((M, mb, t_samp), jnp.float32),
            jnp.zeros((M, mb), w_ceil.dtype),
        )
        (_, out_a, out_l), _ = lax.scan(
            step, init, jnp.arange(M + S - 1))
        # Only the last stage wrote audio; everyone else holds zeros — the
        # psum over pp is the broadcast that makes out_specs=P(dp) valid.
        out_a = lax.psum(out_a, PIPE_AXIS)
        out_l = lax.psum(out_l, PIPE_AXIS)
        return out_a.reshape(rows_per_dp, t_samp), out_l.reshape(rows_per_dp)

    d = P(DATA_AXIS)
    in_specs = (P(), d, d, d, d, d, d if with_g else P())
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=(d, d),
        check_vma=False,
    )

    def call(params, m_p, logs_p, x_mask, w_ceil, noise, g=None):
        if g is None:
            g = jnp.zeros((m_p.shape[0], 0, 1), m_p.dtype)
        return fn(params, m_p, logs_p, x_mask, w_ceil, noise, g)

    return call


def pp_decode(
    params: Params,
    hp: VitsHParams,
    enc: EncodeResult,
    main_noise: jnp.ndarray,
    *,
    mesh: Mesh,
    max_frames: int,
    microbatches: Optional[int] = None,
    noise_scale: float = 0.667,
    vocoder_precision=None,
    flow_precision: Optional[str] = None,
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience single-shot pipelined decode (builds + jits each call —
    use build_pp_decode + your own jit cache for serving)."""
    dp = int(mesh.shape.get(DATA_AXIS, 1))
    b = enc.m_p.shape[0]
    if b % dp != 0:
        raise ValueError(f"batch {b} not divisible by dp {dp}")
    call = build_pp_decode(
        mesh, hp, max_frames=max_frames, rows_per_dp=b // dp,
        microbatches=microbatches, with_g=enc.g is not None,
        noise_scale=noise_scale, vocoder_precision=vocoder_precision,
        flow_precision=flow_precision, precision=precision)
    fn = jax.jit(call)
    return fn(params, enc.m_p, enc.logs_p, enc.x_mask, enc.w_ceil,
              main_noise, enc.g)
