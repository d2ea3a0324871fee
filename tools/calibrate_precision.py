"""Calibrate the per-level vocoder matmul-precision schedule.

The BASELINE fidelity gate is max-abs waveform error <= 1e-3 vs a reference
runtime. The MXU runs bf16 passes: "highest" = 6-pass (fp32-equivalent),
"high" = 3-pass, "default" = 1-pass — each tier roughly doubling matmul
throughput. The HiFi-GAN upsample stack tolerates different tiers per level
(short accumulation chains late, bounded tanh output), so the right schedule
is an empirical question: this tool measures, for each candidate schedule,

  * max-abs waveform error vs the independent torch fp32 oracle
    (tests/oracle/vits_torch.py), with injected RNG so runs are bit-comparable;
  * steady-state synthesis wall time on the active platform (the real TPU
    chip under axon);

and recommends the fastest schedule whose error clears the gate with the
requested margin. The winner feeds bench.py's --vocoder-precision default.

Reference analog: the reference runs everything fp32 on Metal and anchors on
recorded vectors (PiperTestVector.swift:26-33); here the oracle plays that
role and precision is a tunable the TPU design exposes.

Usage:
    python3 tools/calibrate_precision.py                 # medium, TPU
    python3 tools/calibrate_precision.py --quality high
    python3 tools/calibrate_precision.py --platform cpu --factor 1  # smoke
"""

from __future__ import annotations

import argparse

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tests"))

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


def candidate_schedules(n_levels: int):
    """Uniform tiers plus every monotone high->default split, and the
    reverse splits (to confirm which end of the stack is error-sensitive)."""
    cands = [("highest",) * n_levels, ("high",) * n_levels, ("default",) * n_levels]
    for split in range(1, n_levels):
        cands.append(("highest",) * split + ("high",) * (n_levels - split))
        cands.append(("high",) * split + ("highest",) * (n_levels - split))
        cands.append(("high",) * split + ("default",) * (n_levels - split))
    # de-dup preserving order
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--factor", type=int, default=8,
                    help="fixture repeat factor (8 = the 112-phoneme bench row)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=2e-4,
                    help="max-abs error bound (gate 1e-3 with 5x margin)")
    ap.add_argument("--flow-tiers", default="",
                    help="comma list of decode-flow tiers to fidelity-check "
                         "(e.g. 'highest,high,default'); runs the flow "
                         "calibration instead of the vocoder schedule sweep")
    ap.add_argument("--schedules", default="",
                    help="comma-of-colon list, e.g. 'high:high:default:default,default'")
    ap.add_argument("--platform", help="force jax platform (e.g. cpu)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import torch

    from oracle import vits_torch as oracle
    from piper_tpu.models.vits.hifigan import hifigan_generator
    from piper_tpu.models.vits.hparams import PRESETS
    from piper_tpu.models.vits.model import infer
    from piper_tpu.models.vits.params import params_from_arrays
    from piper_tpu.models.vits.synthetic import synthetic_params

    hp = PRESETS[args.quality]
    n_levels = hp.num_upsamples
    weights = synthetic_params(hp, seed=args.seed)
    jparams = params_from_arrays(weights)
    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(args.seed + 1)
    ids1 = (FIXTURE_IDS * args.factor)[:4096]
    b, p = args.batch, len(ids1)
    ids = np.tile(np.asarray(ids1, dtype=np.int32), (b, 1))
    lengths = np.full((b,), p, dtype=np.int32)
    dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
    # frame budget ~2x the synthetic voice's observed frames/phoneme, rounded
    # to the runtime's bucket granularity; both sides clamp to the same value
    max_frames = max(64, -(-2 * p // 64) * 64)
    main_noise = rng.standard_normal((b, hp.inter_channels, max_frames)).astype(np.float32)

    print(f"# quality={args.quality} levels={n_levels} b={b} phonemes={p} "
          f"max_frames={max_frames} platform={jax.default_backend()}",
          file=sys.stderr)

    # Oracle pipeline, keeping the vocoder INPUT z: the precision schedule
    # only touches the HiFi-GAN stage, so the fidelity comparison must feed
    # both vocoders the identical z. (Comparing full infer() outputs is
    # alignment-noisy: at 100+ phonemes a ~1e-6 fp32 difference in logw can
    # flip a duration ceil() and shift the whole waveform — an artifact of
    # the comparison, not a precision error.)
    with torch.no_grad():
        t_ids = torch.as_tensor(ids, dtype=torch.long)
        t_len = torch.as_tensor(lengths, dtype=torch.long)
        x, m_p, logs_p, x_mask = oracle.text_encoder(t_ids, t_len, weights, hp)
        logw = oracle.sdp_reverse(
            x, x_mask, torch.as_tensor(dp_noise), weights, hp, noise_scale=0.8
        )
        w_ceil = torch.ceil(torch.exp(logw) * x_mask)[:, 0]
        y_lengths = torch.clamp(w_ceil.sum(-1), min=1, max=max_frames)
        y_mask = oracle.sequence_mask(y_lengths, max_frames)
        path = oracle.generate_path(w_ceil, x_mask, y_mask)
        m_p = torch.einsum("btp,bcp->bct", path, m_p)
        logs_p = torch.einsum("btp,bcp->bct", path, logs_p)
        z_p = m_p + torch.as_tensor(main_noise) * torch.exp(logs_p) * 0.667
        z = oracle.flow_reverse(z_p, y_mask, weights, hp)
        audio_t = np.asarray(
            oracle.hifigan(z * y_mask, weights, hp, y_mask=y_mask)
        )[:, 0, :]
    z_np = np.asarray(z * y_mask, dtype=np.float32)
    ymask_np = np.asarray(y_mask, dtype=np.float32).reshape(b, 1, max_frames)
    ylen_np = np.asarray(y_lengths, dtype=np.int32)
    print(f"# oracle frames used: {ylen_np.tolist()}", file=sys.stderr)

    # --flow-tiers: calibrate the decode-flow precision instead. Feeds the
    # oracle's z_p through OUR reverse flows at each tier, then the vocoder
    # at the calibrated 'high' schedule, and compares against the oracle's
    # audio — isolating the flow-tier error the same way the vocoder sweep
    # isolates vocoder error (both sides see identical z_p; no duration
    # discretization in the path).
    if args.flow_tiers:
        from piper_tpu.models.vits.flows import flow_reverse
        from piper_tpu.models.vits.model import _matmul_precision

        zp_np = np.asarray(z_p * y_mask, dtype=np.float32)
        jzp = jnp.asarray(zp_np)
        jym = jnp.asarray(np.asarray(y_mask, np.float32))
        frows = []
        for tier in args.flow_tiers.split(","):
            t = None if tier in ("", "none") else tier

            def fwd(params, zz, ym, mm, bb, _t=t):
                with _matmul_precision(_t):
                    z_f = flow_reverse(zz, ym, params, hp)
                return hifigan_generator(
                    z_f * mm, params, hp, level_precisions="high",
                    use_pallas=on_tpu, t_mask=mm, t_bounds=bb,
                )

            audio_f = np.asarray(jax.device_get(jax.jit(fwd)(
                jparams, jzp, jym, jnp.asarray(ymask_np), jnp.asarray(ylen_np)
            )))[:, 0, :]
            err = float(np.max(np.abs(audio_f - audio_t)))
            frows.append({"flow_tier": tier, "vocoder": "high",
                          "max_abs_err": err})
            print(json.dumps(frows[-1]), file=sys.stderr)
        print(json.dumps({"quality": args.quality,
                          "platform": jax.default_backend(),
                          "threshold": args.threshold, "flow_rows": frows}))
        return

    if args.schedules:
        cands = [tuple(s.split(":")) if ":" in s else (s,) * n_levels
                 for s in args.schedules.split(",")]
    else:
        cands = candidate_schedules(n_levels)

    jids, jlen = jnp.asarray(ids), jnp.asarray(lengths)
    jdp, jmain = jnp.asarray(dp_noise), jnp.asarray(main_noise)
    jz, jymask = jnp.asarray(z_np), jnp.asarray(ymask_np)
    jbounds = jnp.asarray(ylen_np)

    # Pass 1 — fidelity + compile everything up front.
    rows, fns = [], []
    for sched in cands:
        # fidelity: vocoder-only on the oracle's z, exactly as decode() calls it
        voc = jax.jit(lambda params, zz, mm, bb, _s=sched: hifigan_generator(
            zz, params, hp, level_precisions=_s, use_pallas=on_tpu,
            t_mask=mm, t_bounds=bb,
        ))
        audio_j = np.asarray(jax.device_get(
            voc(jparams, jz, jymask, jbounds)
        ))[:, 0, :]
        err = float(np.max(np.abs(audio_j - audio_t)))
        # throughput: the full fused program (what serving runs)
        fn = jax.jit(lambda params, i, l, dp, mn, _s=sched: infer(
            params, hp, i, l, dp, mn, max_frames=max_frames,
            vocoder_precision=_s, use_pallas=on_tpu,
        ))
        fn(jparams, jids, jlen, jdp, jmain)  # compile + warm
        fns.append(fn)
        rows.append({"schedule": list(sched), "max_abs_err": err})
        print(json.dumps(rows[-1]), file=sys.stderr)

    # Pass 2 — timing, INTERLEAVED round-robin so slow device-load drift
    # (this chip has moved 8x within a session) hits every schedule equally;
    # per-schedule result is the median over rounds.
    times = [[] for _ in cands]
    for _ in range(args.iters):
        for ci, fn in enumerate(fns):
            t0 = time.perf_counter()
            out = fn(jparams, jids, jlen, jdp, jmain)
            jax.device_get(out[1])  # sync via data fetch
            times[ci].append((time.perf_counter() - t0) * 1e3)
    for r, ts in zip(rows, times):
        r["ms"] = round(float(np.median(ts)), 2)
        r["ms_spread"] = [round(min(ts), 1), round(max(ts), 1)]
        print(json.dumps(r), file=sys.stderr)

    base = next((r for r in rows if set(r["schedule"]) == {"highest"}), rows[0])
    for r in rows:
        r["speedup_vs_highest"] = round(base["ms"] / r["ms"], 3)
    ok = [r for r in rows if r["max_abs_err"] <= args.threshold]
    rec = min(ok, key=lambda r: r["ms"]) if ok else None
    print(json.dumps({
        "quality": args.quality,
        "platform": jax.default_backend(),
        "threshold": args.threshold,
        "rows": rows,
        "recommended": rec,
    }))


if __name__ == "__main__":
    main()
