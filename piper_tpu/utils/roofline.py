"""Roofline / MFU accounting for the VITS synthesis pipeline.

Analytic FLOPs and minimum HBM bytes per stage (encoder, duration
predictor, flow decoder, each vocoder level), compared against measured
chip ceilings (GEMM TF/s at each precision tier, HBM GB/s) and measured
per-stage wall time. This answers "is it actually fast" in hardware terms
instead of RTF-vs-a-Swift-interpreter (the reference's only accounting is
GPU time per command buffer, MetalBackend.swift:859-874).

FLOPs are counted as 2xMACs of the conv/matmul work only (elementwise and
normalization FLOPs are noise next to the convs and ride along fused).
Bytes are the minimum streaming traffic of a perfectly-fused stage: every
conv reads its input activation once, writes its output once, and reads its
weights once; attention additionally moves the (P x P) score matrices.
Real traffic is higher (XLA materializes some intermediates), so measured
GB/s can exceed the analytic number — the analytic figure is the floor
that a perfectly-fused kernel would move.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from piper_tpu.models.vits.hparams import VitsHParams


@dataclass
class StageCost:
    stage: str
    flops: float = 0.0   # 2 * MACs
    bytes: float = 0.0   # minimum HBM traffic at fp32 activations
    ms: Optional[float] = None          # measured per-iteration wall time
    achieved_tf_s: Optional[float] = None
    achieved_gb_s: Optional[float] = None
    mfu: Optional[float] = None         # vs the matching GEMM ceiling
    hbm_frac: Optional[float] = None    # achieved GB/s vs HBM ceiling
    bound: Optional[str] = None         # "compute" | "memory"

    @property
    def intensity(self) -> float:
        """Arithmetic intensity (FLOPs per byte moved)."""
        return self.flops / self.bytes if self.bytes else 0.0


def _conv(B, T_in, C_in, C_out, k, T_out=None, groups: int = 1):
    """(flops, bytes) of one batched 1-D conv. For conv_transpose pass
    T_out=T_in*stride — MACs are T_in*k*C_in*C_out either way (each input
    sample touches k taps)."""
    T_out = T_in if T_out is None else T_out
    macs = B * T_in * k * (C_in // groups) * C_out
    bytes_ = 4.0 * (B * (T_in * C_in + T_out * C_out) + C_in * C_out * k / groups)
    return 2.0 * macs, bytes_


def encoder_cost(hp: VitsHParams, B: int, P: int) -> StageCost:
    """Text encoder: n_layers x (rel-attention + FFN) + prior projection."""
    H, F, k, w = (hp.hidden_channels, hp.filter_channels, hp.kernel_size,
                  hp.window_size)
    fl = by = 0.0
    for _ in range(hp.n_layers):
        for _ in range(4):  # q, k, v, out projections (k=1)
            f, b = _conv(B, P, H, H, 1)
            fl, by = fl + f, by + b
        # scores + apply: 2 * P*P*H MACs; rel-k/rel-v: 2 * P*(2w+1)*H.
        fl += 2.0 * B * (2 * P * P * H + 2 * P * (2 * w + 1) * H)
        by += 4.0 * B * (2 * hp.n_heads * P * P)  # score mat write+read
        for cin, cout in ((H, F), (F, H)):  # FFN convs, kernel k
            f, b = _conv(B, P, cin, cout, k)
            fl, by = fl + f, by + b
    f, b = _conv(B, P, H, 2 * hp.inter_channels, 1)  # prior proj
    return StageCost("encoder", fl + f, by + b)


def duration_predictor_cost(hp: VitsHParams, B: int, P: int) -> StageCost:
    """Stochastic duration predictor, reverse pass (DDSConv stacks are
    depthwise-separable: depthwise k + pointwise 1x1, 3 layers each)."""
    H, D, k = hp.hidden_channels, hp.dp_filter_channels, hp.dp_kernel_size
    n_dds = 3

    def dds():
        f = b = 0.0
        for _ in range(n_dds):
            f1, b1 = _conv(B, P, D, D, k, groups=D)  # depthwise
            f2, b2 = _conv(B, P, D, D, 1)            # pointwise
            f, b = f + f1 + f2, b + b1 + b2
        return f, b

    fl, by = _conv(B, P, H, D, 1)  # dp.pre
    f, b = dds()                   # dp.convs
    fl, by = fl + f, by + b
    # The SDP reverse pass executes dp_n_flows - 1 ConvFlows: it drops the
    # first one (flows[:-2] + [flows[-1]] — the trained-but-unused flow),
    # matching models/vits/duration.py and the torch oracle.
    for _ in range(max(0, hp.dp_n_flows - 1)):  # ConvFlow each: pre + DDS + proj
        f, b = _conv(B, P, 1, D, 1)
        fl, by = fl + f, by + b
        f, b = dds()
        fl, by = fl + f, by + b
        f, b = _conv(B, P, D, 3 * hp.dp_num_bins - 1, 1)
        fl, by = fl + f, by + b
    return StageCost("duration_predictor", fl, by)


def flow_cost(hp: VitsHParams, B: int, T: int) -> StageCost:
    """Reverse residual-coupling flows on the frame axis."""
    C, H = hp.inter_channels, hp.flow_hidden_channels
    k, L = hp.flow_kernel_size, hp.flow_n_layers
    fl = by = 0.0
    for _ in range(hp.flow_n_flows):
        f, b = _conv(B, T, C // 2, H, 1)  # pre
        fl, by = fl + f, by + b
        for i in range(L):
            f, b = _conv(B, T, H, 2 * H, k)  # in_layer (dilated: same MACs)
            fl, by = fl + f, by + b
            cout = 2 * H if i < L - 1 else H
            f, b = _conv(B, T, H, cout, 1)   # res_skip
            fl, by = fl + f, by + b
        f, b = _conv(B, T, H, C // 2, 1)  # post (mean only)
        fl, by = fl + f, by + b
    return StageCost("flow", fl, by)


def vocoder_level_costs(hp: VitsHParams, B: int, T: int) -> List[StageCost]:
    """conv_pre, then per upsample level (conv_transpose + resblock set),
    then conv_post — each its own row so the roofline can pinpoint a level."""
    U0 = hp.upsample_initial_channel
    out: List[StageCost] = []
    f, b = _conv(B, T, hp.inter_channels, U0, 7)
    out.append(StageCost("vocoder.pre", f, b))
    t = T
    for i in range(hp.num_upsamples):
        c_in, c_out = U0 // (2 ** i), U0 // (2 ** (i + 1))
        k, u = hp.upsample_kernel_sizes[i], hp.upsample_rates[i]
        fl, by = _conv(B, t, c_in, c_out, k, T_out=t * u)  # conv_transpose
        t *= u
        # Minimum HBM traffic of the resblock stage depends on kernel
        # selection: at ch<=32 ResBlock1 levels the whole-MRF Pallas kernel
        # (hifigan.py fuse_mrf default) reads the level activation once and
        # writes the mean once — per-conv intermediates never leave VMEM —
        # so only weights are charged per conv. Other levels stream each
        # conv's input/output through HBM.
        mrf_fused = hp.resblock != "2" and c_out <= 32
        if mrf_fused:
            by += 4.0 * 2 * B * t * c_out  # one stage read + one write
        for j, kj in enumerate(hp.resblock_kernel_sizes):
            n_convs = len(hp.resblock_dilation_sizes[j]) * (
                1 if hp.resblock == "2" else 2)
            for _ in range(n_convs):
                f, b = _conv(B, t, c_out, c_out, kj)
                if mrf_fused:
                    b = 4.0 * c_out * c_out * kj  # weights only
                fl, by = fl + f, by + b
        out.append(StageCost(f"vocoder.up{i}", fl, by))
    f, b = _conv(B, t, U0 // (2 ** hp.num_upsamples), 1, 7)
    out.append(StageCost("vocoder.post", f, b))
    return out


def pipeline_costs(hp: VitsHParams, B: int, P: int, T: int) -> List[StageCost]:
    """All stages of one synthesis at batch B, phoneme bucket P, frame
    bucket T."""
    return [
        encoder_cost(hp, B, P),
        duration_predictor_cost(hp, B, P),
        flow_cost(hp, B, T),
        *vocoder_level_costs(hp, B, T),
    ]


def total_cost(hp: VitsHParams, B: int, P: int, T: int) -> StageCost:
    stages = pipeline_costs(hp, B, P, T)
    return StageCost("total", sum(s.flops for s in stages),
                     sum(s.bytes for s in stages))


# -- measured ceilings -------------------------------------------------------


def _timed(fn, args, iters: int, sync) -> float:
    """Median-of-3 timing of `iters` back-to-back dispatches; sync(out)
    forces completion via a data fetch of the output (block_until_ready is
    unreliable over the tunnel). Returns seconds per iteration."""
    sync(fn(*args))  # warm / compile, synced on the real output
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best.append((time.perf_counter() - t0) / iters)
    return float(np.median(best))


def measure_ceilings(iters: int = 8, n: int = 4096) -> Dict[str, float]:
    """Chip ceilings this process can actually reach: square-GEMM TF/s per
    matmul-precision tier and streaming HBM GB/s (read+write of a large
    elementwise op). These are the denominators for MFU — the dev chip
    measures far below v5e paper spec (see CLAUDE.md), so paper numbers
    would understate utilization."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32)
    bm = jax.random.normal(jax.random.fold_in(key, 1), (n, n), jnp.float32)

    def sync(x=None):
        arr = x if x is not None else a
        jax.device_get(arr.ravel()[:1])

    out: Dict[str, float] = {}
    for tier in ("highest", "high", "default"):
        @jax.jit
        def mm(x, y, _tier=tier):
            with jax.default_matmul_precision(_tier):
                return x @ y

        sec = _timed(mm, (a, bm), iters, sync)
        out[f"gemm_tf_s_{tier}"] = 2.0 * n ** 3 / sec / 1e12
    ab = a.astype(jnp.bfloat16)
    bb = bm.astype(jnp.bfloat16)

    @jax.jit
    def mmb(x, y):
        return x @ y

    sec = _timed(mmb, (ab, bb), iters, sync)
    out["gemm_tf_s_bf16"] = 2.0 * n ** 3 / sec / 1e12

    big = jax.random.normal(jax.random.fold_in(key, 2), (64, 1024, 1024),
                            jnp.float32)  # 256 MB

    @jax.jit
    def stream(x):
        return x * 1.000001 + 0.5

    sec = _timed(stream, (big,), iters, sync)
    out["hbm_gb_s"] = 2.0 * big.size * 4 / sec / 1e9
    return out


_TIER_CEILING_KEY = {
    None: "gemm_tf_s_highest",
    "highest": "gemm_tf_s_highest",
    "high": "gemm_tf_s_high",
    "default": "gemm_tf_s_default",
    "bfloat16": "gemm_tf_s_bf16",
}


def annotate(stage: StageCost, ms: float, ceilings: Dict[str, float],
             tier: Optional[str]) -> StageCost:
    """Fill in achieved rates and the roofline verdict for a measured time."""
    sec = ms / 1e3
    stage.ms = ms
    stage.achieved_tf_s = stage.flops / sec / 1e12
    stage.achieved_gb_s = stage.bytes / sec / 1e9
    peak = ceilings.get(_TIER_CEILING_KEY.get(tier, "gemm_tf_s_highest"))
    hbm = ceilings.get("hbm_gb_s")
    stage.mfu = stage.achieved_tf_s / peak if peak else None
    stage.hbm_frac = stage.achieved_gb_s / hbm if hbm else None
    if stage.mfu is not None and stage.hbm_frac is not None:
        stage.bound = "compute" if stage.mfu >= stage.hbm_frac else "memory"
    return stage


# -- per-stage measured programs --------------------------------------------


def measure_stages(rt, B: int, P: int, T: int, iters: int = 10,
                   per_level: bool = True) -> List[StageCost]:
    """Time each pipeline stage in isolation on the runtime's device and
    annotate the analytic costs with achieved TF/s / GB/s / MFU.

    Builds one jit program per stage (persistent-cached like every other
    program). Per-level vocoder programs replicate the production path's
    kernel selection (Pallas fused branch vs XLA) so the measurement
    justifies — or indicts — the production lowering choice."""
    import jax
    import jax.numpy as jnp

    from piper_tpu.models.vits import model as vits
    from piper_tpu.models.vits.flows import flow_reverse
    from piper_tpu.models.vits.hifigan import hifigan_generator

    if not hasattr(rt, "_roofline_ceilings"):
        rt._roofline_ceilings = measure_ceilings()
    hp = rt.hparams
    params = rt.params
    prec = rt._matmul_precision()
    voc_prec = rt.options.vocoder_precision
    flow_prec = rt.options.flow_precision
    use_pallas = rt._resolve_pallas()
    if isinstance(voc_prec, str):
        voc_tiers = [voc_prec] * hp.num_upsamples
    elif voc_prec is None:
        voc_tiers = [None] * hp.num_upsamples
    else:
        voc_tiers = list(voc_prec)

    key = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, P), jnp.int32)
    lengths = jnp.full((B,), P, jnp.int32)
    sid = rt._sid_array(None, B)
    z_like = jax.random.normal(key, (B, hp.inter_channels, T), jnp.float32)
    mask = jnp.ones((B, 1, T), jnp.float32)

    def sync(x=None):
        if x is None:
            return
        leaf = jax.tree_util.tree_leaves(x)[0]
        jax.device_get(leaf.ravel()[:1])

    stages: List[StageCost] = []

    # encoder + duration predictor (the production encode program).
    enc_cost = encoder_cost(hp, B, P)
    dp_cost = duration_predictor_cost(hp, B, P)
    both = StageCost("encode(enc+dp)", enc_cost.flops + dp_cost.flops,
                     enc_cost.bytes + dp_cost.bytes)
    sec = _timed(
        lambda: rt._encode_keyed(params, ids, lengths, jnp.uint32(0), 1.0,
                                 0.8, sid),
        (), iters, lambda x=None: sync(x))
    stages.append(annotate(both, sec * 1e3, rt._roofline_ceilings, prec))

    # flow decoder.
    @jax.jit
    def flow_fn(z):
        with jax.default_matmul_precision(flow_prec or prec):
            return flow_reverse(z, mask, params, hp, g=None)

    fc = flow_cost(hp, B, T)
    sec = _timed(lambda: flow_fn(z_like), (), iters, lambda x=None: sync(x))
    stages.append(annotate(fc, sec * 1e3, rt._roofline_ceilings,
                           flow_prec or prec))

    # whole vocoder (production kernel selection).
    @jax.jit
    def voc_fn(z):
        with jax.default_matmul_precision(prec):
            return hifigan_generator(z, params, hp, g=None,
                                     level_precisions=voc_prec,
                                     use_pallas=use_pallas)

    vc_rows = vocoder_level_costs(hp, B, T)
    vc_total = StageCost("vocoder", sum(s.flops for s in vc_rows),
                         sum(s.bytes for s in vc_rows))
    sec = _timed(lambda: voc_fn(z_like), (), iters, lambda x=None: sync(x))
    voc_tier = voc_tiers[0] if voc_tiers[0] is not None else prec
    stages.append(annotate(vc_total, sec * 1e3, rt._roofline_ceilings,
                           voc_tier))

    if per_level:
        stages.extend(_measure_vocoder_levels(
            rt, B, T, iters, vc_rows, voc_tiers, use_pallas, prec))
    return stages


def _measure_vocoder_levels(rt, B, T, iters, vc_rows, voc_tiers,
                            use_pallas, prec):
    """One program per vocoder upsample level, mirroring production kernel
    selection (hifigan_generator's fuse_branch logic)."""
    import jax
    import jax.numpy as jnp

    from piper_tpu.models.vits.hifigan import (LRELU_SLOPE, _pallas_precision,
                                               _resblock1, _resblock2)
    from piper_tpu.models.vits.params import Prefix
    from piper_tpu.ops.conv import conv_transpose1d
    from piper_tpu.ops.nn import leaky_relu

    hp = rt.hparams
    params = rt.params
    p = Prefix(params, "dec")
    use_rb2 = hp.resblock == "2"
    num_kernels = hp.num_resblock_kernels
    out = []
    t = T
    for i in range(hp.num_upsamples):
        k, u = hp.upsample_kernel_sizes[i], hp.upsample_rates[i]
        c_in = hp.upsample_initial_channel // (2 ** i)
        c_out = c_in // 2
        tier = voc_tiers[i] if voc_tiers[i] is not None else prec
        x_in = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(1), i),
                                 (B, c_in, t), jnp.float32)

        def level_fn(x, _i=i, _k=k, _u=u, _tier=tier, _c=c_out):
            with jax.default_matmul_precision(_tier):
                x = leaky_relu(x, LRELU_SLOPE)
                x = conv_transpose1d(x, p[f"ups.{_i}.weight"],
                                     p[f"ups.{_i}.bias"], stride=_u,
                                     padding=(_k - _u) // 2)
                fuse = use_pallas and not use_rb2 and _c < 128
                acc = None
                for j in range(num_kernels):
                    rb = p.sub(f"resblocks.{_i * num_kernels + j}")
                    kj = hp.resblock_kernel_sizes[j]
                    dils = hp.resblock_dilation_sizes[j]
                    if fuse:
                        from piper_tpu.ops.pallas.resblock import (
                            pallas_resblock1_branch,
                        )

                        n_d = len(dils)
                        w1 = jnp.stack([rb[f"convs1.{m}.weight"]
                                        for m in range(n_d)])
                        b1 = jnp.stack([rb[f"convs1.{m}.bias"]
                                        for m in range(n_d)])
                        w2 = jnp.stack([rb[f"convs2.{m}.weight"]
                                        for m in range(n_d)])
                        b2 = jnp.stack([rb[f"convs2.{m}.bias"]
                                        for m in range(n_d)])
                        y = pallas_resblock1_branch(
                            x, w1, b1, w2, b2, kernel=kj, dilations=dils,
                            bounds=None, slope=LRELU_SLOPE,
                            precision=_pallas_precision(_tier))
                    elif use_rb2:
                        y = _resblock2(x, rb, kj, dils, use_pallas=use_pallas,
                                       precision=_tier)
                    else:
                        y = _resblock1(x, rb, kj, dils, use_pallas=use_pallas,
                                       precision=_tier)
                    acc = y if acc is None else acc + y
                return acc / num_kernels

        fn = jax.jit(level_fn)

        def sync(x=None, _x_in=x_in):
            leaf = x if x is not None else _x_in
            import jax as _jax

            _jax.device_get(_jax.tree_util.tree_leaves(leaf)[0].ravel()[:1])

        sec = _timed(lambda _f=fn, _x=x_in: _f(_x), (), iters, sync)
        row = vc_rows[i + 1]  # vc_rows[0] is vocoder.pre
        measured = StageCost(row.stage, row.flops, row.bytes)
        out.append(annotate(measured, sec * 1e3, rt._roofline_ceilings, tier))
        t *= u
    return out


def roofline_report(rt, B: int, P: int, T: int, iters: int = 10,
                    per_level: bool = True,
                    ceilings: Optional[Dict[str, float]] = None) -> dict:
    """Full report: ceilings + per-stage rows, JSON-ready."""
    rt._roofline_ceilings = ceilings or measure_ceilings(iters=max(4, iters // 2))
    stages = measure_stages(rt, B, P, T, iters=iters, per_level=per_level)
    tot = total_cost(rt.hparams, B, P, T)
    return {
        "batch": B, "phoneme_bucket": P, "frame_bucket": T,
        "ceilings": {k: round(v, 2) for k, v in rt._roofline_ceilings.items()},
        "total_gflops_per_synthesis": round(tot.flops / 1e9, 2),
        "total_gb_min_traffic": round(tot.bytes / 1e9, 3),
        "stages": [
            {
                "stage": s.stage,
                "gflops": round(s.flops / 1e9, 3),
                "gb": round(s.bytes / 1e9, 4),
                "intensity_flop_per_byte": round(s.intensity, 1),
                "ms": round(s.ms, 3) if s.ms is not None else None,
                "tf_s": round(s.achieved_tf_s, 3) if s.achieved_tf_s else None,
                "gb_s": round(s.achieved_gb_s, 2) if s.achieved_gb_s else None,
                "mfu": round(s.mfu, 4) if s.mfu is not None else None,
                "hbm_frac": round(s.hbm_frac, 4) if s.hbm_frac is not None else None,
                "bound": s.bound,
            }
            for s in stages
        ],
    }
