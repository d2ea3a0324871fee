"""piper-tpu benchmark entry point.

Runs the reference's headline benchmark — the scale-bench sweep over the
14-phoneme fixture (README.md:37-58, factors 1/2/4/8) — on whatever JAX
platform is active (the real TPU chip under axon) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline compares our factor-1 ms_mean against the reference's published
Swift/Metal 147.39 ms (BASELINE.md) as a speedup ratio. The headline value is
real-time factor per chip at factor 1 (target: >=200x, BASELINE.json).

No network: unless --model/--config point at a real voice, a synthetic
checkpoint with the exact medium-voice architecture (identical shapes/FLOPs)
is generated and cached — perf-representative even though the audio is noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS
BASELINE_MS_FACTOR1 = 147.39  # reference Swift/Metal ms_mean @ factor 1 (README.md:43)


def _percentile(xs, p):
    s = sorted(xs)
    k = (len(s) - 1) * (p / 100.0)
    f, c = int(np.floor(k)), int(np.ceil(k))
    return s[f] if f == c else s[f] + (s[c] - s[f]) * (k - f)


def get_runtime(args, n_speakers: int = 1, gin: int = 0, quality: str = None):
    from piper_tpu.engine.runtime import (PiperRuntime, RuntimeOptions,
                                          parse_precision_spec)

    quality = quality or args.quality
    options = RuntimeOptions(
        precision=args.precision, mode=args.mode,
        vocoder_precision=parse_precision_spec(args.vocoder_precision),
        flow_precision=parse_precision_spec(
            getattr(args, "flow_precision", None)),
        output_dtype=args.output_dtype,
    )
    if args.model and quality == args.quality:
        return PiperRuntime(args.model, args.config, options)
    cache = Path(os.environ.get("PIPER_TPU_CACHE", Path.home() / ".cache" / "piper-tpu"))
    tag = quality if n_speakers <= 1 else f"{quality}-ms{n_speakers}"
    voice_dir = cache / "synthetic" / tag
    name = f"synthetic-{quality}" if n_speakers <= 1 else f"synthetic-{tag}"
    model = voice_dir / f"{name}.onnx"
    if not model.exists():
        from piper_tpu.models.vits.synthetic import make_synthetic_voice

        make_synthetic_voice(voice_dir, quality=quality, seed=0,
                             n_speakers=n_speakers, gin_channels=gin,
                             voice_name=name if n_speakers > 1 else None)
    return PiperRuntime(model, None, options)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", help="real voice checkpoint (.onnx)")
    parser.add_argument("--config", help="voice config (.onnx.json)")
    parser.add_argument("--quality", default="medium")
    parser.add_argument("--precision", default="highest",
                        choices=["highest", "high", "default", "bfloat16"])
    parser.add_argument("--factors", default="1,2,4,8")
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--mode", default="fused", choices=["split", "fused"])
    parser.add_argument("--batch", type=int, default=32,
                        help="batch size for the throughput measurement (0 = skip). "
                             "32 is the best point of the measured 16/32/64/128 "
                             "sweep on the dev chip (docs/BENCH.md)")
    parser.add_argument("--batch-sweep", default="",
                        help="comma-separated batch sizes to sweep for throughput "
                             "(e.g. 16,32,64,128); headline uses the best point")
    parser.add_argument("--vocoder-precision", default="high",
                        help="vocoder matmul tier: highest/high/default, 'none' "
                             "(= fp32 everywhere), or comma-separated per-level "
                             "tiers. Default 'high' is the calibrated schedule: "
                             "4.6e-5 max-abs error vs the torch oracle (gate "
                             "1e-3) and the fastest gate-clearing tier measured "
                             "by tools/calibrate_precision.py on this chip")
    parser.add_argument("--flow-precision", default="high",
                        help="decode-flow matmul tier ('none' = inherit "
                             "--precision). Default 'high': measured 4.9e-5 "
                             "error vs the oracle (gate 1e-3, 20x margin) "
                             "and ~1.2x faster decode (docs/BENCH.md); the "
                             "encoder/duration path always stays at "
                             "--precision (a duration flip is an O(1) "
                             "waveform shift)")
    parser.add_argument("--output-dtype", default="int16",
                        choices=["int16", "float32"],
                        help="PCM format the programs emit; int16 (the WAV "
                             "wire format, converted on device) halves the "
                             "device->host fetch")
    parser.add_argument("--pipeline", action="store_true", default=True,
                        help="measure pipelined serving throughput")
    parser.add_argument("--no-pipeline", dest="pipeline", action="store_false")
    parser.add_argument("--multi-speaker", type=int, default=904, metavar="N",
                        help="bench an N-speaker voice with batched mixed-sid serving "
                             "(the en_US-libritts-high-class config; 0 = skip)")
    parser.add_argument("--high", action="store_true", default=True,
                        help="bench the high-quality (deeper upsample stack) config")
    parser.add_argument("--no-high", dest="high", action="store_false")
    parser.add_argument("--roofline", action="store_true",
                        help="embed the per-stage roofline/MFU report "
                             "(tools/roofline.py) in the result JSON — "
                             "measures chip ceilings and per-stage programs, "
                             "adding a few compiles on first run")
    parser.add_argument("--streams", type=int, default=8,
                        help="concurrent streaming clients for the "
                             "multi-stream serving row (0 = skip)")
    parser.add_argument("--quick", action="store_true", help="fast smoke (small sweep)")
    parser.add_argument("--platform", help="force a jax platform (e.g. cpu)")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        from piper_tpu.utils.env import apply_platform_override

        apply_platform_override()
    if args.quick:
        args.factors = "1,2"
        args.warmup, args.iters = 1, 2
        args.multi_speaker = min(args.multi_speaker, 8)
        args.high = False
    args.iters = max(1, args.iters)

    import jax

    rt = get_runtime(args)
    factors = [int(x) for x in args.factors.split(",")]
    rows = []
    for f in factors:
        ids = (FIXTURE_IDS * f)[: 4096]
        # warmup (includes compile)
        t0 = time.perf_counter()
        for _ in range(args.warmup):
            rt.synthesize(ids)
        warm_s = time.perf_counter() - t0
        wall, rtfs = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            audio = rt.synthesize(ids)
            wall.append((time.perf_counter() - t0) * 1e3)
            rtfs.append((len(audio) / rt.sample_rate) / (wall[-1] / 1e3))
        rows.append(
            {
                "factor": f,
                "phoneme_count": len(ids),
                "ms_mean": float(np.mean(wall)),
                "ms_p50": _percentile(wall, 50),
                "ms_p95": _percentile(wall, 95),
                "rtf_mean": float(np.mean(rtfs)),
                "audio_s": len(audio) / rt.sample_rate,
                "warmup_s": warm_s,
            }
        )

    # Batched throughput: the "per-chip" serving metric. One program run over
    # a batch of factor-8 utterances, aggregate audio-seconds per wall-second.
    def measure_throughput(runtime, bsz, sids=None):
        ids8 = (FIXTURE_IDS * 8)[:4096]
        batch = [ids8] * bsz
        kw = {"speaker_ids": sids} if sids is not None else {}
        runtime.synthesize_batch(batch, **kw)  # warmup/compile
        iters = max(2, args.iters // 2)
        t0 = time.perf_counter()
        total_audio_s = 0.0
        for _ in range(iters):
            audios = runtime.synthesize_batch(batch, **kw)
            total_audio_s += sum(len(a) for a in audios) / runtime.sample_rate
        wall = time.perf_counter() - t0
        return {
            "batch": bsz,
            "phonemes_per_utt": len(ids8),
            "iters": iters,
            "audio_s_total": round(total_audio_s, 2),
            "wall_s": round(wall, 3),
            "rtf_throughput": round(total_audio_s / wall, 1),
        }

    # Pipelined batches: batch i's bulk audio fetch (~37% of blocking wall
    # on the tunneled dev chip) overlaps batch i+1's compute.
    def measure_throughput_pipelined(runtime, bsz, n_batches=8, sids=None):
        from piper_tpu.engine.pipeline import ServingPipeline

        ids8 = (FIXTURE_IDS * 8)[:4096]
        batch = [ids8] * bsz
        kw = {"speaker_ids": sids} if sids is not None else {}
        with ServingPipeline(runtime, max_inflight=4, num_fetchers=4) as pipe:
            # Warmup with the EXACT seeds the timed loop uses: the seed
            # changes the predicted durations, hence the frame bucket, and a
            # first-touch bucket inside the timed window would put a 20-40 s
            # XLA compile in the headline. Submitting them overlapped also
            # absorbs the one-time second-executable-instance load (~25 s on
            # the tunneled chip: the first time two program executions are
            # ever in flight).
            for f in [pipe.submit_batch(batch, seed=i, **kw)
                      for i in range(n_batches)]:
                f.result()
            t0 = time.perf_counter()
            futs = [pipe.submit_batch(batch, seed=i, **kw)
                    for i in range(n_batches)]
            total_audio_s = sum(
                sum(len(a) for a in f.result()) for f in futs
            ) / runtime.sample_rate
            wall = time.perf_counter() - t0
        return {
            "batch": bsz,
            "n_batches": n_batches,
            "audio_s_total": round(total_audio_s, 2),
            "wall_s": round(wall, 3),
            "rtf_throughput": round(total_audio_s / wall, 1),
        }

    throughput = None
    batch_sweep_rows = None
    if args.batch_sweep:
        batch_sweep_rows = [
            measure_throughput(rt, int(b)) for b in args.batch_sweep.split(",")
        ]
        throughput = max(batch_sweep_rows, key=lambda r: r["rtf_throughput"])
    elif args.batch:
        throughput = measure_throughput(rt, args.batch)
    throughput_pipelined = None
    if throughput or args.batch:
        throughput_pipelined = measure_throughput_pipelined(
            rt, throughput["batch"] if throughput else args.batch,
            n_batches=4 if args.quick else 8)

    # Pipelined single-utterance serving (hides device round trips).
    pipeline_row = None
    if args.pipeline:
        from piper_tpu.engine.pipeline import ServingPipeline

        with ServingPipeline(rt, max_inflight=16, num_fetchers=8) as pipe:
            [f.result() for f in [pipe.submit(FIXTURE_IDS, seed=i) for i in range(4)]]
            n_req = 32
            t0 = time.perf_counter()
            futs = [pipe.submit(FIXTURE_IDS, seed=i) for i in range(n_req)]
            audios = [f.result() for f in futs]
            wall = time.perf_counter() - t0
        audio_s = sum(len(a) for a in audios) / rt.sample_rate
        pipeline_row = {
            "requests": n_req,
            "ms_per_utt": round(wall / n_req * 1e3, 2),
            "rtf": round(audio_s / wall, 1),
        }

    # Streaming time-to-first-audio: incremental windowed decode on a ~4 s
    # utterance (a capability the reference lacks — its streaming wrapper
    # synthesizes fully, then chunks).
    streaming_row = None
    if not args.quick:
        ids_long = (FIXTURE_IDS * 16)[:4096]
        # Warm the FULL stream: the growing window schedule compiles one
        # program per distinct window size, not just the first.
        for _ in rt.synthesize_stream(ids_long, incremental=True):
            pass
        ttfbs, totals = [], []
        for i in range(max(3, args.iters // 2)):
            t0 = time.perf_counter()
            it = rt.synthesize_stream(ids_long, incremental=True, seed=i)
            first = next(it)
            ttfbs.append((time.perf_counter() - t0) * 1e3)
            n = len(first.samples) + sum(len(c.samples) for c in it)
            totals.append((time.perf_counter() - t0) * 1e3)
        streaming_row = {
            "phonemes": len(ids_long),
            "utterance_s": round(n / rt.sample_rate, 2),
            "ttfb_ms_p50": round(_percentile(ttfbs, 50), 1),
            "total_ms_p50": round(_percentile(totals, 50), 1),
        }

    # Concurrent-stream serving: N clients stream simultaneously through
    # StreamingServer (solo fused TTFB per stream, steady-state windows
    # batched across streams in one program per tick). Reports what each
    # client experiences (TTFB) plus the aggregate realtime factor the chip
    # sustains while everyone streams — the multi-tenant counterpart of the
    # single-stream row above. tools/streaming_bench.py is the full protocol.
    streaming_server_row = None
    if args.streams and not args.quick:
        import threading

        from piper_tpu.engine.stream_server import StreamingServer

        ids_long = (FIXTURE_IDS * 16)[:4096]
        srv = StreamingServer(rt, max_sessions=max(16, args.streams))
        rungs = [r for r in srv.row_rungs if r <= args.streams] or [
            srv.row_rungs[0]]
        srv.prewarm(phoneme_lengths=(len(ids_long),), row_rungs=rungs)
        agg, ttfb_all, total_all = [], [], []
        # Round -1 is an untimed warmup: the FIRST time several executions
        # are ever in flight the device loads a second executable instance
        # (~25 s one-time — docs/BENCH.md), which otherwise lands in the
        # measured TTFB tail (observed: p95 4.9 s on a round-0-included run
        # vs ~200 ms warm).
        for rnd in range(-1, 2):
            lock = threading.Lock()
            ttfbs, totals, sample_counts, errs = [], [], [], []

            def client(i):
                try:
                    t0c = time.perf_counter()
                    first, n = None, 0
                    for chunk in srv.submit(ids_long, seed=rnd * 100 + i):
                        if first is None:
                            first = time.perf_counter() - t0c
                        n += len(chunk.samples)
                    with lock:
                        ttfbs.append(first * 1e3)
                        totals.append((time.perf_counter() - t0c) * 1e3)
                        sample_counts.append(n)
                except Exception as e:  # noqa: BLE001 — report, don't crash bench
                    with lock:
                        errs.append(repr(e))

            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(args.streams)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errs or not sample_counts:
                streaming_server_row = {"error": errs[:3]}
                break
            if rnd < 0:
                continue  # warmup round: absorb, don't report
            agg.append(sum(sample_counts) / rt.sample_rate / wall)
            ttfb_all.extend(ttfbs)
            total_all.extend(totals)
        srv.shutdown()
        if streaming_server_row is None:
            streaming_server_row = {
                "streams": args.streams,
                "aggregate_rtf": round(float(np.median(agg)), 1),
                "ttfb_ms_p50": round(_percentile(ttfb_all, 50), 1),
                "ttfb_ms_p95": round(_percentile(ttfb_all, 95), 1),
                "total_ms_p50": round(_percentile(total_all, 50), 1),
            }

    # Multi-speaker batched serving (the en_US-libritts-high-style config:
    # 900+ speaker embeddings, batched utterances with mixed speaker ids).
    # Part of the default sweep — it is one of the five BASELINE configs.
    multispeaker_row = None
    if args.multi_speaker:
        # Always bench a synthetic N-speaker voice — a user-supplied --model
        # is (usually) single-speaker and would silently drop the sids.
        import argparse as _ap

        ms_args = _ap.Namespace(**{**vars(args), "model": None, "config": None})
        rt_ms = get_runtime(ms_args, n_speakers=args.multi_speaker, gin=512)
        bsz = max(2, args.batch or 8)
        sids = list(np.arange(bsz) % args.multi_speaker)
        # Same pipelined methodology as the headline.
        row = measure_throughput_pipelined(
            rt_ms, bsz, n_batches=4 if args.quick else 8, sids=sids)
        multispeaker_row = {
            "n_speakers": args.multi_speaker,
            "batch": bsz,
            "rtf_throughput": row["rtf_throughput"],
        }
        del rt_ms

    # High-quality config (en_US-ryan-high class: deeper 5-level upsample
    # stack, same 22.05 kHz output) — BASELINE config #4, default sweep.
    high_row = None
    if args.high:
        rt_high = get_runtime(args, quality="high")
        t0 = time.perf_counter()
        rt_high.synthesize(FIXTURE_IDS)  # warmup/compile
        warm_s = time.perf_counter() - t0
        wall = []
        for _ in range(max(2, args.iters // 2)):
            t0 = time.perf_counter()
            audio = rt_high.synthesize(FIXTURE_IDS)
            wall.append((time.perf_counter() - t0) * 1e3)
        # Same pipelined methodology as the headline (the deeper stack is
        # more compute per audio-second, so overlapping the fetch matters
        # just as much here).
        hi_tp = measure_throughput_pipelined(
            rt_high, max(2, (args.batch or 8) // 2),
            n_batches=4 if args.quick else 8)
        high_row = {
            "quality": "high",
            "num_upsamples": rt_high.hparams.num_upsamples,
            "ms_mean_factor1": round(float(np.mean(wall)), 3),
            "warmup_s": round(warm_s, 2),
            "batch": hi_tp["batch"],
            "rtf_throughput": hi_tp["rtf_throughput"],
        }
        del rt_high

    roofline = None
    if args.roofline:
        from piper_tpu.utils.roofline import roofline_report

        roofline = roofline_report(
            rt, args.batch or 32, 128, 768,
            iters=3 if args.quick else 8, per_level=not args.quick)

    # Baseline comparison row: the factor-1 row when present (the *_factor1
    # keys would otherwise silently describe whatever factor was listed first).
    f1 = next((r for r in rows if r["factor"] == 1), rows[0])
    serving_rows = [r for r in (throughput, throughput_pipelined) if r]
    headline_rtf = (
        max(r["rtf_throughput"] for r in serving_rows)
        if serving_rows else f1["rtf_mean"]
    )
    result = {
        "metric": "rtf_per_chip",
        "value": round(headline_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(BASELINE_MS_FACTOR1 / f1["ms_mean"], 2),
        "baseline_ms_factor1": BASELINE_MS_FACTOR1,
        "ms_mean_factor1": round(f1["ms_mean"], 3),
        "rtf_single_stream_factor1": round(f1["rtf_mean"], 2),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "precision": args.precision,
        "output_dtype": args.output_dtype,
        "mode": args.mode,
        "quality": args.quality,
        "compile_count": rt.last_run_timings.compile_count,
        "vocoder_precision": (None if args.vocoder_precision in ("", "none")
                              else args.vocoder_precision),
        "flow_precision": (None if args.flow_precision in ("", "none")
                           else args.flow_precision),
        "throughput": throughput,
        "throughput_pipelined": throughput_pipelined,
        "batch_sweep": batch_sweep_rows,
        "pipeline": pipeline_row,
        "streaming": streaming_row,
        "streaming_server": streaming_server_row,
        "multispeaker": multispeaker_row,
        "high": high_row,
        "roofline": roofline,
        "rows": rows,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
