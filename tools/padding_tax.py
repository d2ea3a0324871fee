"""Measure the batch-bucket dummy-row tax (VERDICT r2 #8).

The runtime pads batched group ROWS up to the batch_buckets ladder (dummy
rows copy row 0) so varying group sizes reuse a bounded program set instead
of compile-storming. This tool measures what those dummy rows actually cost:
wall time of synthesize_batch across group sizes straddling each ladder
rung (e.g. 17 rows padded to 32), the implied device-time waste, and the
waste expectation over the serving sim's group-size distribution.

Usage:
    python3 tools/padding_tax.py                        # TPU
    python3 tools/padding_tax.py --platform cpu --quality test --iters 2

Prints one JSON line; the decision (keep the power-of-two ladder or add
intermediate rungs) is recorded in docs/BENCH.md.
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

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--factor", type=int, default=1,
                    help="utterance length factor (1 = the 14-phoneme fixture "
                         "— short prompts are where wide groups and the "
                         "widest ladder gaps live)")
    ap.add_argument("--sizes", default="8,9,12,16,17,24,32,33,48,64",
                    help="real group sizes to measure (each pads to the "
                         "next ladder rung)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        from piper_tpu.utils.env import apply_platform_override

        apply_platform_override()

    import bench as bench_mod

    rt_args = argparse.Namespace(
        model=None, config=None, quality=args.quality, precision="highest",
        mode="fused", vocoder_precision="high", flow_precision="high",
        output_dtype="int16",
    )
    rt = bench_mod.get_runtime(rt_args)
    ids = (FIXTURE_IDS * args.factor)[:4096]
    ladder = rt.batch_ladder

    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for b in sizes:
        bp = next((x for x in ladder if x >= b), b)
        batch = [ids] * b
        rt.synthesize_batch(batch)  # warm/compile this (bp, bucket) program
        wall = []
        for _ in range(max(1, args.iters)):
            t0 = time.perf_counter()
            audios = rt.synthesize_batch(batch)
            wall.append(time.perf_counter() - t0)
        ms = float(np.median(wall)) * 1e3
        audio_s = sum(len(a) for a in audios) / rt.sample_rate
        rows.append({
            "rows": b, "padded_to": bp,
            "dummy_rows": bp - b,
            "ms_p50": round(ms, 1),
            "ms_per_real_row": round(ms / b, 2),
            "rtf": round(audio_s / (ms / 1e3), 1),
        })

    # Waste model: for each measured rung size bp, ms(bp) is the full-bucket
    # cost; a group of b real rows pays ms(bp(b)) so the dummy-row waste is
    # 1 - b/bp scaled by the fraction of time that is row-proportional
    # (estimated from the measured ladder points: slope of ms vs rows).
    rung_ms = {r["rows"]: r["ms_p50"] for r in rows if r["dummy_rows"] == 0}
    xs = sorted(rung_ms)
    waste_rows = []
    for r in rows:
        if r["dummy_rows"] == 0:
            continue
        full = rung_ms.get(r["padded_to"])
        # The ideal cost of b rows: interpolate between measured rungs.
        lo = max((x for x in xs if x <= r["rows"]), default=None)
        hi = min((x for x in xs if x >= r["rows"]), default=None)
        if full is None or lo is None or hi is None:
            continue
        ideal = rung_ms[lo] if lo == hi else (
            rung_ms[lo] + (rung_ms[hi] - rung_ms[lo]) * (r["rows"] - lo) / (hi - lo))
        waste_rows.append({
            "rows": r["rows"], "padded_to": r["padded_to"],
            "measured_ms": r["ms_p50"], "ideal_ms": round(ideal, 1),
            "waste_pct": round(100 * (r["ms_p50"] - ideal) / r["ms_p50"], 1),
        })

    print(json.dumps({
        "metric": "padding_tax",
        "quality": args.quality,
        "phonemes_per_utt": len(ids),
        "ladder": list(ladder),
        "rows": rows,
        "waste": waste_rows,
    }))


if __name__ == "__main__":
    main()
