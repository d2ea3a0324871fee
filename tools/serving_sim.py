"""Realistic serving simulation: Poisson arrivals, mixed utterance lengths.

The headline bench measures saturated uniform batches; production traffic is
neither. This tool drives the continuous BatchingServer with Poisson request
arrivals over a mix of utterance lengths (short prompts to paragraph-length)
and reports end-to-end request latency percentiles, achieved batch grouping,
and aggregate real-time factor — the numbers a capacity plan actually needs.

Usage:
    python3 tools/serving_sim.py                      # TPU, 60 req/s, 30 s
    python3 tools/serving_sim.py --rate 120 --duration 60
    python3 tools/serving_sim.py --platform cpu --quality test --rate 20 --duration 5

Prints one JSON line with latency p50/p95/p99 (ms), throughput, and the
request mix.
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

# (repeat-factor, weight): 14-phoneme prompts dominate, with a tail of
# paragraph-length requests — a chat/assistant-style mix.
LENGTH_MIX = [(1, 0.45), (2, 0.25), (4, 0.15), (8, 0.10), (16, 0.05)]


def _merge_voice_metrics(per: dict) -> dict:
    """Aggregate MultiVoiceBatchingServer.metrics() (per-voice dicts) into
    the single-server shape report() expects."""
    m = {k: 0 for k in ("groups", "rows", "padded_rows",
                        "shed_overload", "shed_deadline")}
    m["cache_hits"] = sum(v.get("cache_hits", 0) for v in per.values())
    m["cache_bytes"] = sum(v.get("cache_bytes", 0) for v in per.values())
    wait_sum = wait_max = 0.0
    for v in per.values():
        for k in m:
            m[k] += v[k]
        wait_sum += v["wait_ms_mean"] * v["rows"]
        wait_max = max(wait_max, v["wait_ms_max"])
    m["wait_ms_mean"] = wait_sum / m["rows"] if m["rows"] else 0.0
    m["wait_ms_max"] = wait_max
    m["rows_per_group"] = m["rows"] / m["groups"] if m["groups"] else 0.0
    m["per_voice_rows"] = {k: v["rows"] for k, v in per.items()}
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=60.0, help="requests/second")
    ap.add_argument("--rates", default="",
                    help="comma list of rates to sweep IN ONE PROCESS (one "
                         "prewarm, one JSON line per rate) — compiles cost "
                         "40-100 s each on the tunneled chip, so per-rate "
                         "processes would re-pay the grid every time")
    ap.add_argument("--duration", type=float, default=30.0, help="seconds of traffic")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--max-pending", type=int, default=None,
                    help="admission cap: shed (503) beyond this many queued")
    ap.add_argument("--deadline-ms", type=float, default=None,
                    help="shed queued requests older than this before dispatch")
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--voices", type=int, default=1,
                    help=">1 serves the mix across N resident voices through "
                         "MultiVoiceBatchingServer (requests pick a voice "
                         "uniformly; same architecture, so the XLA program "
                         "grid is shared — the cost being measured is the "
                         "scheduler splitting traffic into per-voice groups)")
    ap.add_argument("--http", action="store_true",
                    help="drive the SAME traffic through PiperHTTPServer "
                         "over loopback TCP (measures the full deployment "
                         "stack: JSON parse + batcher + PCM encode + HTTP)")
    ap.add_argument("--cache-mb", type=float, default=0.0,
                    help="response-cache budget (MB) per voice; see "
                         "BatchingServer(cache_mb=)")
    ap.add_argument("--phrase-pool", type=int, default=0,
                    help="distinct phrase variants per length factor "
                         "(0 = one canonical phrase per factor; with "
                         "--cache-mb that is a near-100%% hit canned-phrase "
                         "workload, larger pools lower the hit rate)")
    ap.add_argument("--unified", action="store_true",
                    help="serve through UnifiedServer (batch + streaming on "
                         "ONE worker) instead of the dedicated batcher — "
                         "run both in one session to measure the "
                         "unification tax")
    ap.add_argument("--stream-rate", type=float, default=0.0,
                    help="with --unified: additionally open low-latency "
                         "streams at this Poisson rate (streams/s) during "
                         "the measured pass; reports stream TTFB p50/p95 "
                         "alongside the batch numbers")
    ap.add_argument("--stream-factor", type=int, default=4,
                    help="stream utterance length (x the 14-phoneme fixture)")
    ap.add_argument("--stream-group-frac", type=float, default=1.0,
                    help="with --unified: batch groups pop at this fraction "
                         "of their size while streams are open (TTFB vs "
                         "batch-efficiency tradeoff; 0.25 = prewarmed mid "
                         "rung)")
    ap.add_argument("--add-voice-at", type=float, default=None,
                    help="seconds into the measured pass to add_voice a new "
                         "voice on the live server (non-pausing warm); "
                         "reports resident-voice p50 before/during/after "
                         "the warm")
    ap.add_argument("--add-voice-quality", default=None,
                    help="architecture of the added voice (default: same "
                         "as --quality — programs shared; a different "
                         "quality makes every warm step a real executable "
                         "load/compile)")
    ap.add_argument("--warm-every", type=int, default=2,
                    help="one add_voice warm step per this many traffic "
                         "groups (higher = gentler on resident latency, "
                         "longer warm)")
    ap.add_argument("--platform", help="force jax platform (e.g. cpu)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        from piper_tpu.utils.env import apply_platform_override

        apply_platform_override()

    import bench as bench_mod
    from piper_tpu.engine.batcher import (BatchingServer, DeadlineExceeded,
                                          MultiVoiceBatchingServer,
                                          ServerOverloaded)

    rt_args = argparse.Namespace(
        model=None, config=None, quality=args.quality, precision="highest",
        mode="fused", vocoder_precision="high", flow_precision="high",
        output_dtype="int16",
    )
    rt = bench_mod.get_runtime(rt_args)
    runtimes = {"v0": rt}
    for i in range(1, args.voices):
        # Same synthetic checkpoint, separate runtime instances: identical
        # shapes share the XLA program grid, while the scheduler still has
        # to split traffic into per-voice groups — the multi-voice cost
        # under study. (Distinct weights would measure the same thing
        # slower to set up.)
        runtimes[f"v{i}"] = bench_mod.get_runtime(rt_args)

    rng = np.random.default_rng(args.seed)
    factors = [f for f, _ in LENGTH_MIX]
    weights = np.asarray([w for _, w in LENGTH_MIX])
    weights = weights / weights.sum()

    def run_traffic(submit, duration, rng, rate):
        recs = []
        shed = {"overload": 0, "deadline": 0}
        t_start = time.perf_counter()
        next_at = t_start
        while True:
            now = time.perf_counter()
            if now - t_start >= duration:
                break
            if now < next_at:
                time.sleep(min(next_at - now, 0.005))
                continue
            f = int(rng.choice(factors, p=weights))
            ids = (FIXTURE_IDS * f)[:4096]
            if args.phrase_pool:
                # rotate the phrase: valid ids, distinct sequence per
                # variant — a cheap stand-in for a phrase pool
                r = int(rng.integers(args.phrase_pool)) % len(ids)
                ids = ids[r:] + ids[:r]
            t_submit = time.perf_counter()
            try:
                fut = submit(rng, ids)
            except ServerOverloaded:
                shed["overload"] += 1
                next_at += rng.exponential(1.0 / rate)
                continue
            done_at = {}
            fut.add_done_callback(lambda fu, d=done_at: d.setdefault(
                "t", time.perf_counter()))
            recs.append((t_submit, f, fut, done_at))
            next_at += rng.exponential(1.0 / rate)
        out = []
        audio_s = 0.0
        for t_submit, f, fut, done_at in recs:
            try:
                audio = fut.result(timeout=600)
            except DeadlineExceeded:
                shed["deadline"] += 1
                continue
            except ServerOverloaded:  # --http surfaces sheds at result time
                shed["overload"] += 1
                continue
            audio_s += len(audio) / rt.sample_rate
            out.append(((done_at.get("t", time.perf_counter())) - t_submit, f,
                        t_submit - t_start))
        return out, audio_s, time.perf_counter() - t_start, shed

    def run_streams(server, duration, rng, rate, t_start):
        """Poisson stream arrivals on the unified server alongside the batch
        traffic; one pool thread per stream drains its chunks. Returns
        per-stream dicts: ttfb_ms, audio_s, wall_s."""
        from concurrent.futures import ThreadPoolExecutor

        ids = (FIXTURE_IDS * args.stream_factor)[:4096]
        stats: list = []
        futs = []

        def one_stream():
            t0 = time.perf_counter()
            try:
                handle = server.submit_stream("v0", ids)
            except ServerOverloaded:
                stats.append({"shed": True})
                return
            first = None
            n = 0
            for chunk in handle:
                if first is None:
                    first = time.perf_counter() - t0
                n += len(chunk.samples)
            stats.append({"ttfb_ms": first * 1e3,
                          "audio_s": n / rt.sample_rate,
                          "wall_s": time.perf_counter() - t0})

        with ThreadPoolExecutor(max_workers=64) as pool:
            next_at = t_start
            while True:
                now = time.perf_counter()
                if now - t_start >= duration:
                    break
                if now < next_at:
                    time.sleep(min(next_at - now, 0.005))
                    continue
                try:
                    futs.append(pool.submit(one_stream))
                except RuntimeError:
                    break
                next_at += rng.exponential(1.0 / rate)
            for f in futs:
                f.result(timeout=600)
        return stats

    http_srv = None
    if args.http:
        # Full-stack mode: requests travel over real (loopback) HTTP into
        # PiperHTTPServer's multi-voice batcher; a thread pool stands in
        # for concurrent clients. Latency includes JSON + int16-PCM + TCP.
        import http.client as _hc
        from concurrent.futures import ThreadPoolExecutor

        from piper_tpu.engine.http_server import PiperHTTPServer

        http_srv = PiperHTTPServer(
            runtimes, port=0, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, max_pending=args.max_pending,
            deadline_ms=args.deadline_ms, cache_mb=args.cache_mb)
        http_srv.start()
        server = http_srv.server
        # One pool worker per plausibly-in-flight request: at high rates a
        # fixed small pool would queue clients and bill that wait as
        # server latency.
        peak_rate = max([float(r) for r in args.rates.split(",")]
                        if args.rates else [args.rate])
        pool = ThreadPoolExecutor(
            max_workers=min(2048, max(256, int(peak_rate * 8))))
        voice_keys = list(runtimes)

        def _do_req(ids, voice):
            conn = _hc.HTTPConnection(http_srv.host, http_srv.port,
                                      timeout=600)
            try:
                conn.request(
                    "POST", "/v1/synthesize",
                    body=json.dumps({"voice": voice, "phoneme_ids": ids,
                                     "format": "pcm"}).encode(),
                    headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                data = resp.read()
                if resp.status == 429:
                    # both admission sheds map to 429; the body says which
                    msg = data.decode()[:200]
                    if "pending" in msg:
                        raise ServerOverloaded(msg)
                    raise DeadlineExceeded(msg)
                if resp.status != 200:
                    raise RuntimeError(f"HTTP {resp.status}: {data[:100]!r}")
                return np.frombuffer(data, "<i2")
            finally:
                conn.close()

        def submit(rng, ids):
            voice = voice_keys[int(rng.integers(len(voice_keys)))]
            return pool.submit(_do_req, list(ids), voice)

        def merged_metrics():
            return _merge_voice_metrics(server.metrics())
    elif args.unified:
        from piper_tpu.engine.unified import UnifiedServer

        server = UnifiedServer(
            runtimes, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            max_pending=args.max_pending, deadline_ms=args.deadline_ms,
            cache_mb=args.cache_mb, warm_every=args.warm_every,
            stream_group_frac=args.stream_group_frac)
        voice_keys = list(runtimes)

        def submit(rng, ids):
            return server.submit(voice_keys[int(rng.integers(len(voice_keys)))],
                                 ids, noise_scale=None)

        def merged_metrics():
            return _merge_voice_metrics(server.batch.metrics())
    elif args.voices > 1 or args.add_voice_at is not None:
        server = MultiVoiceBatchingServer(
            runtimes, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            max_pending=args.max_pending, deadline_ms=args.deadline_ms,
            cache_mb=args.cache_mb, warm_every=args.warm_every)
        voice_keys = list(runtimes)

        def submit(rng, ids):
            return server.submit(voice_keys[int(rng.integers(len(voice_keys)))],
                                 ids, noise_scale=None)

        def merged_metrics():
            return _merge_voice_metrics(server.metrics())
    else:
        server = BatchingServer(rt, max_batch=args.max_batch,
                                max_wait_ms=args.max_wait_ms,
                                max_pending=args.max_pending,
                                deadline_ms=args.deadline_ms,
                                cache_mb=args.cache_mb)

        def submit(rng, ids):
            return server.submit(ids, noise_scale=None)

        merged_metrics = server.metrics
    with (http_srv if http_srv is not None else server):
        # Prewarm the server's ENTIRE fused program grid deterministically
        # (each phoneme bucket of the mix x its <=3 row rungs) — traffic-shaped warmup
        # is not enough: any (rows, frames) shape first seen mid-traffic is
        # a 40-100 s XLA compile stalling the serve loop.
        from piper_tpu.engine.bucketing import bucket_for

        p_buckets = sorted({
            bucket_for(len((FIXTURE_IDS * f)[:4096]),
                       rt.options.phoneme_buckets, "phoneme")
            for f in factors})
        if args.unified:
            stream_len = len((FIXTURE_IDS * args.stream_factor)[:4096])
            warm = server.prewarm(
                p_buckets=p_buckets, stream=args.stream_rate > 0,
                stream_kwargs=dict(phoneme_lengths=(stream_len,)))
            programs = sum(w["programs"] for w in warm["batch"].values())
            programs += sum(w["programs"]
                            for w in warm.get("stream", {}).values())
            secs = sum(w["seconds"] for w in warm["batch"].values())
            secs += sum(w["seconds"]
                        for w in warm.get("stream", {}).values())
            fpp = next(iter(warm["batch"].values()))["frames_per_phoneme"]
        else:
            warm = server.prewarm(p_buckets=p_buckets)
            if args.voices > 1 or args.http or args.add_voice_at is not None:
                # multi-voice server: per-voice dicts
                programs = sum(w["programs"] for w in warm.values())
                secs = sum(w["seconds"] for w in warm.values())
                fpp = next(iter(warm.values()))["frames_per_phoneme"]
            else:
                programs, secs, fpp = (warm["programs"], warm["seconds"],
                                       warm["frames_per_phoneme"])
        print(f"[serving_sim] prewarmed {programs} grid programs in "
              f"{secs:.0f}s (fpp {fpp:.2f})",
              file=sys.stderr)
        add_rt = None
        if args.add_voice_at is not None:
            # Build the new voice's runtime BEFORE the measured pass (the
            # checkpoint build/load is host work; the cost under study is
            # the on-worker program warming).
            add_args = argparse.Namespace(**vars(rt_args))
            add_args.quality = args.add_voice_quality or args.quality
            add_rt = bench_mod.get_runtime(add_args)
        rates = ([float(r) for r in args.rates.split(",")] if args.rates
                 else [args.rate])
        # Short warmup traffic pass (steady-state queues, executable
        # instances loaded), then one measured pass per rate.
        run_traffic(submit, min(args.duration, 10.0),
                    np.random.default_rng(args.seed + 1), rates[0])
        for rate in rates:
            # Each pass reports its own counters, not the warmup's or the
            # previous rates' (the server is shared across the sweep).
            server.reset_metrics()
            import threading as _t

            t_start = time.perf_counter()
            stream_stats: list = []
            stream_th = None
            if args.stream_rate > 0:
                if not args.unified:
                    raise SystemExit("--stream-rate requires --unified")

                def _streams():
                    stream_stats.extend(run_streams(
                        server, args.duration,
                        np.random.default_rng(args.seed + 7),
                        args.stream_rate, t_start))

                stream_th = _t.Thread(target=_streams)
                stream_th.start()
            add_state: dict = {}
            add_th = None
            if args.add_voice_at is not None:

                def _adder():
                    time.sleep(args.add_voice_at)
                    add_state["t_add"] = time.perf_counter() - t_start
                    fut = server.add_voice(
                        f"vnew_{rate:g}", add_rt,
                        p_buckets=p_buckets,
                        **({"stream_prewarm": False} if args.unified
                           else {}))
                    stats = fut.result(timeout=1200)
                    add_state["t_done"] = time.perf_counter() - t_start
                    add_state["stats"] = stats

                add_th = _t.Thread(target=_adder)
                add_th.start()
            results, audio_s, wall, shed = run_traffic(
                submit, args.duration, np.random.default_rng(args.seed), rate)
            if add_th is not None:
                add_th.join(timeout=1800)
            if stream_th is not None:
                stream_th.join(timeout=1800)
            report(args, rate, results, audio_s, wall, shed, merged_metrics(),
                   factors, stream_stats=stream_stats, add_state=add_state)


def _pctl(sorted_vals, p):
    if not sorted_vals:
        return None
    k = (len(sorted_vals) - 1) * p / 100.0
    lo, hi = int(np.floor(k)), int(np.ceil(k))
    return sorted_vals[lo] if lo == hi else (
        sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * (k - lo))


def report(args, rate, results, audio_s, wall, shed, server_metrics, factors,
           stream_stats=None, add_state=None):
    lats_ms = sorted(l * 1e3 for l, _, _ in results)
    if not lats_ms:
        # Tiny rate/--duration (or all requests failed) can leave the
        # measured window empty; report that instead of an IndexError.
        print(json.dumps({
            "metric": "serving_sim", "error": "no completed requests",
            "rate_req_s": rate, "offered_duration_s": args.duration,
        }))
        return

    def pct(p):
        k = (len(lats_ms) - 1) * p / 100.0
        lo, hi = int(np.floor(k)), int(np.ceil(k))
        return lats_ms[lo] if lo == hi else (
            lats_ms[lo] + (lats_ms[hi] - lats_ms[lo]) * (k - lo))

    print(json.dumps({
        "metric": "serving_sim",
        "platform": args.platform or "device-default",
        "rate_req_s": rate,
        "offered_duration_s": args.duration,
        "requests": len(results),
        "length_mix_factors": factors,
        "latency_ms": {"p50": round(pct(50), 1), "p95": round(pct(95), 1),
                       "p99": round(pct(99), 1), "max": round(lats_ms[-1], 1)},
        "audio_s_total": round(audio_s, 1),
        "offered_rtf": round(audio_s / args.duration, 1),
        "wall_s": round(wall, 2),
        "rtf_aggregate": round(audio_s / wall, 1),
        "max_batch": args.max_batch,
        "max_wait_ms": args.max_wait_ms,
        "shed": shed,
        "server": {
            "rows_per_group": round(server_metrics["rows_per_group"], 1),
            "groups": server_metrics["groups"],
            "padded_rows": server_metrics["padded_rows"],
            "wait_ms_mean": round(server_metrics["wait_ms_mean"], 1),
            "wait_ms_max": round(server_metrics["wait_ms_max"], 1),
            "shed_overload": server_metrics["shed_overload"],
            "shed_deadline": server_metrics["shed_deadline"],
            **({"cache_hits": server_metrics.get("cache_hits", 0),
                "cache_bytes": server_metrics.get("cache_bytes", 0)}
               if args.cache_mb else {}),
            **({"per_voice_rows": server_metrics["per_voice_rows"]}
               if "per_voice_rows" in server_metrics else {}),
        },
        **({"voices": args.voices} if args.voices > 1 else {}),
        **({"http": True} if getattr(args, "http", False) else {}),
        **({"unified": True} if getattr(args, "unified", False) else {}),
        **_stream_report(stream_stats),
        **_add_voice_report(results, add_state),
    }), flush=True)


def _stream_report(stream_stats) -> dict:
    if not stream_stats:
        return {}
    ok = [s for s in stream_stats if "ttfb_ms" in s]
    ttfbs = sorted(s["ttfb_ms"] for s in ok)
    walls = sum(s["wall_s"] for s in ok)
    audio = sum(s["audio_s"] for s in ok)
    return {"streams": {
        "count": len(ok),
        "shed": sum(1 for s in stream_stats if s.get("shed")),
        "ttfb_ms": {"p50": round(_pctl(ttfbs, 50), 1),
                    "p95": round(_pctl(ttfbs, 95), 1),
                    "max": round(ttfbs[-1], 1)} if ttfbs else None,
        "audio_s_total": round(audio, 1),
        "rtf_per_stream_mean": round(audio / walls, 1) if walls else None,
    }}


def _add_voice_report(results, add_state) -> dict:
    """Resident-voice latency windows around a live add_voice: the
    non-pausing criterion is p50(during warm) staying near p50(before)."""
    if not add_state or "t_add" not in add_state:
        return {}
    t_add = add_state["t_add"]
    t_done = add_state.get("t_done")

    def win(lo, hi):
        w = sorted(l * 1e3 for l, _, t in results if lo <= t < hi)
        return ({"p50": round(_pctl(w, 50), 1), "max": round(w[-1], 1),
                 "n": len(w)} if w else None)

    return {"add_voice": {
        "at_s": round(t_add, 2),
        "warm_s": round(t_done - t_add, 2) if t_done else None,
        "programs": (add_state.get("stats") or {}).get("programs"),
        "resident_before": win(0.0, t_add),
        "resident_during_warm": win(t_add, t_done if t_done else 1e9),
        "resident_after": win(t_done, 1e9) if t_done else None,
    }}


if __name__ == "__main__":
    main()
