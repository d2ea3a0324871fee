"""Concurrent-stream serving benchmark (engine/stream_server.py).

Measures what N simultaneous streaming clients experience: per-stream
time-to-first-audio and chunk cadence, plus the aggregate realtime factor
the chip sustains while every client streams. This is the multi-tenant
counterpart of bench.py's single-stream `streaming` row — the reference
has no analog (one synthesis per call, streaming chunks a finished
waveform, PiperMetalRuntime.swift:93-94).

Protocol: build the synthetic voice, prewarm the (bucket x rung) program
grid, then for each round launch N client threads that each stream one
utterance to completion; the workload is timed wall-to-wall from first
submit to last final chunk. Compare runs only within one session (device
drift — docs/BENCH.md). `--ab-heads` additionally re-runs the identical
workload with batched heads disabled (head_rungs=(1,)) in the SAME
process, giving a drift-free A/B of the burst-TTFB batching.

Usage:
    python3 tools/streaming_bench.py --streams 8 --rounds 3
    python3 tools/streaming_bench.py --streams 8 --ab-heads
    python3 tools/streaming_bench.py --platform cpu --quality x_low --quick
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def run_config(rt, ids, args, head_rungs=None, label="batched_heads"):
    from piper_tpu.engine.stream_server import StreamingServer

    sr = rt.sample_rate
    srv = StreamingServer(
        rt,
        **({"emit_frames": args.emit_frames}
           if args.emit_frames is not None else {}),
        **({"c0": args.c0} if args.c0 is not None else {}),
        **({"head_rungs": head_rungs} if head_rungs is not None else {}),
        max_sessions=max(64, args.streams),
    )
    cover = next((r for r in srv.row_rungs if r >= args.streams),
                 srv.row_rungs[-1])
    rungs = [r for r in srv.row_rungs if r <= cover]
    h_rungs = [r for r in srv.head_rungs if r <= cover]
    t0 = time.perf_counter()
    warm = srv.prewarm(phoneme_lengths=(args.phonemes,), row_rungs=rungs,
                       head_rungs=h_rungs)
    prewarm_s = time.perf_counter() - t0

    rows = []
    for rnd in range(-args.warmup_rounds, args.rounds):
        warmup = rnd < 0
        ttfbs, totals, samples = [], [], []
        lock = threading.Lock()
        errors = []

        def client(i):
            try:
                t_start = time.perf_counter()
                n = 0
                first = None
                for chunk in srv.submit(ids, seed=rnd * 1000 + i):
                    if first is None:
                        first = time.perf_counter() - t_start
                    n += len(chunk.samples)
                total = time.perf_counter() - t_start
                with lock:
                    ttfbs.append(first * 1e3)
                    totals.append(total * 1e3)
                    samples.append(n)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(repr(e))

        t_round = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.streams)]
        rng_arr = np.random.default_rng(abs(rnd) + 1)
        for t in threads:
            t.start()
            if args.arrival_rate:
                # Poisson arrivals instead of a simultaneous burst: each
                # stream opens after an exponential gap, so TTFB reflects a
                # lone arrival joining live steady-state traffic (the burst
                # default measures the adversarial all-at-once case).
                time.sleep(float(rng_arr.exponential(1.0 / args.arrival_rate)))
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_round
        if errors or not samples:
            print(json.dumps({"error": errors[:3], "round": rnd}))
            continue
        if warmup:
            continue
        audio_s = sum(samples) / sr
        rows.append({
            "round": rnd,
            "streams": args.streams,
            "wall_s": round(wall, 3),
            "audio_s": round(audio_s, 2),
            "aggregate_rtf": round(audio_s / wall, 1),
            "per_stream_rtf": round(audio_s / args.streams
                                    / (np.median(totals) / 1e3), 1),
            "ttfb_ms_p50": round(float(np.median(ttfbs)), 1),
            "ttfb_ms_p95": round(float(np.percentile(ttfbs, 95)), 1),
            "total_ms_p50": round(float(np.median(totals)), 1),
        })
        print(json.dumps({"config": label, **rows[-1]}))

    m = srv.metrics()
    srv.shutdown()
    return {
        "metric": "streaming_server_aggregate_rtf",
        "config": label,
        "value": (round(float(np.median([r["aggregate_rtf"] for r in rows])), 1)
                  if rows else 0.0),
        "unit": "x_realtime",
        "streams": args.streams,
        "phonemes": args.phonemes,
        "emit_frames": srv.emit_frames,
        "arrival_rate": args.arrival_rate,
        "quality": args.quality,
        "prewarm_s": round(prewarm_s, 1),
        "prewarm_programs": warm.get("programs"),
        "ttfb_ms_p50": (round(float(np.median([r["ttfb_ms_p50"] for r in rows])), 1)
                        if rows else None),
        "ttfb_ms_p95": (round(float(np.median([r["ttfb_ms_p95"] for r in rows])), 1)
                        if rows else None),
        "window_rows": m["window_rows"],
        "window_dispatches": m["window_dispatches"],
        "padded_rows": m["padded_rows"],
        "head_dispatches": m["head_dispatches"],
        "head_rows": m["head_rows"],
        "padded_head_rows": m["padded_head_rows"],
        "rows": rows,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--warmup-rounds", type=int, default=1,
                    help="untimed rounds before measurement (absorbs the "
                         "one-time concurrent-executable load — CLAUDE.md)")
    ap.add_argument("--phonemes", type=int, default=224)
    ap.add_argument("--emit-frames", type=int, default=None,
                help="steady-state window frames (default: the server's default, 512)")
    ap.add_argument("--c0", type=int, default=None)
    ap.add_argument("--arrival-rate", type=float, default=0.0,
                    help="streams/second Poisson arrivals (0 = the default "
                         "simultaneous burst); measures the lone-arrival "
                         "TTFB the burst case cannot")
    ap.add_argument("--head-rungs", default=None,
                    help="comma-separated batched-head rung ladder "
                         "(e.g. '1' = solo heads only)")
    ap.add_argument("--ab-heads", action="store_true",
                    help="after the main run, re-run the same workload with "
                         "solo heads (head_rungs=1) in the same process — "
                         "a drift-free A/B of burst-TTFB head batching")
    ap.add_argument("--ab-rungs", default=None,
                    help="semicolon-separated head-rung CAPS to A/B in one "
                         "process (e.g. '8;16' answers the VERDICT r3 #4 "
                         "question: does a 16-row head rung beat splitting "
                         "a 16-burst into two 8s, and how fast does it "
                         "stabilize — read the per-round rows, round 0 is "
                         "the program's first post-prewarm execution)")
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ap.add_argument("--precision", default=None)
    ap.add_argument("--mode", default=None)
    ap.add_argument("--vocoder-precision", default=None)
    ap.add_argument("--flow-precision", default=None)
    ap.add_argument("--output-dtype", default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="2 streams, 1 round, short utterance")
    args = ap.parse_args(argv)
    if args.quick:
        args.streams, args.rounds, args.phonemes = 2, 1, 56
        args.warmup_rounds = 0

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bench import get_runtime  # reuses defaults + synthetic voice cache
    from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS

    # mirror bench.py's calibrated defaults when unset
    for name, default in (("precision", "highest"), ("mode", "fused"),
                          ("vocoder_precision", "high"),
                          ("flow_precision", "high"),
                          ("output_dtype", "int16")):
        if getattr(args, name) is None:
            setattr(args, name, default)
    rt = get_runtime(args)
    ids = (FIXTURE_IDS * (-(-args.phonemes // len(FIXTURE_IDS))))[
        : args.phonemes]

    if args.ab_rungs:
        # Drift-free A/B of head-rung caps in ONE process: same chip state,
        # same utterance, per-round TTFB rows expose stabilization (the
        # round-3 "16 is faster but slow to stabilize" open question).
        runs = []
        for cap in (int(c) for c in args.ab_rungs.split(";")):
            ladder = [r for r in (1, 2, 4, 8, 16, 32) if r <= cap]
            runs.append(run_config(rt, ids, args, head_rungs=ladder,
                                   label=f"head_cap_{cap}"))
        print(json.dumps({"metric": runs[0]["metric"],
                          "value": runs[0]["value"],
                          "unit": runs[0]["unit"], "ab": runs}))
        return 0
    rungs = ([int(r) for r in args.head_rungs.split(",")]
             if args.head_rungs else None)
    summary = run_config(rt, ids, args, head_rungs=rungs)
    if args.ab_heads:
        solo = run_config(rt, ids, args, head_rungs=[1], label="solo_heads")
        summary = {"metric": summary["metric"], "value": summary["value"],
                   "unit": summary["unit"], "ab": [summary, solo]}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
