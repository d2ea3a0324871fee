#!/usr/bin/env python3
"""Measure the process-start -> first-audio budget (VERDICT r3 #7).

Operators need three numbers before wiring a readiness probe:
  * warm process: a served request on an already-running, prewarmed server
    (the steady state — milliseconds);
  * cold process, warm persistent XLA cache: a restart/rollout on the same
    device config (executable loads, not compiles — seconds);
  * cold process, COLD cache: first-ever deploy or a device reassignment
    (full XLA compiles — minutes; opt in with --cold-cache).

Each scenario runs in a FRESH subprocess (imports, backend init, weight
upload, and first-program latency all count). Prints one JSON line.

    python tools/cold_start.py                      # warm-cache + in-process
    python tools/cold_start.py --cold-cache         # adds the full-compile row
    python tools/cold_start.py --platform cpu --quality test   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# The child measures the SERVING restart by default: the exact runtime
# options the serving stack uses (fused mode, highest/high/high precision,
# int16 device-side PCM — tools/serving_sim.py:141-145, bench.py serving
# modes) and first audio THROUGH a BatchingServer submit, so the first
# program hit is a real serving-grid entry. Round-4 VERDICT #5: the old
# child used default options (float32 split), a DIFFERENT HLO, so its
# "cold process, warm cache" row missed the serving cache and did not
# describe a serving restart. --raw restores the plain-synthesize probe.
_CHILD = r"""
import json, time
t0 = time.perf_counter()
import numpy as np
from piper_tpu.engine.runtime import (PiperRuntime, RuntimeOptions,
                                      parse_precision_spec)
t_import = time.perf_counter()
raw = {raw!r}
options = (RuntimeOptions() if raw else RuntimeOptions(
    mode="fused", precision="highest",
    vocoder_precision=parse_precision_spec("high"),
    flow_precision=parse_precision_spec("high"),
    output_dtype="int16"))
rt = PiperRuntime({model!r}, {config!r}, options=options)
t_load = time.perf_counter()
ids = [1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2]
if raw:
    audio = rt.synthesize(ids)
    t_first = time.perf_counter()
    audio2 = rt.synthesize(ids)
    t_second = time.perf_counter()
else:
    from piper_tpu.engine.batcher import BatchingServer
    srv = BatchingServer(rt)
    audio = srv.submit(ids).result(timeout=3600)
    t_first = time.perf_counter()
    audio2 = srv.submit(ids).result(timeout=3600)
    t_second = time.perf_counter()
    srv.close()
print(json.dumps({{
    "import_s": round(t_import - t0, 2),
    "runtime_load_s": round(t_load - t_import, 2),
    "first_audio_s": round(t_first - t_load, 2),
    "start_to_first_audio_s": round(t_first - t0, 2),
    "warm_call_ms": round((t_second - t_first) * 1e3, 1),
    "samples": int(len(audio)),
}}))
"""


def run_child(model, config, platform, cache_dir=None, timeout=3600,
              raw=False):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    if cache_dir is not None:
        env["PIPER_TPU_CACHE"] = str(cache_dir)
    if platform:
        env["PIPER_TPU_PLATFORM"] = platform
    code = _CHILD.format(model=str(model), config=str(config), raw=raw)
    if platform:
        code = ("import jax; jax.config.update('jax_platforms', "
                f"{platform!r})\n") + code
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=timeout)
    wall = time.perf_counter() - t0
    if out.returncode != 0:
        raise SystemExit(f"child failed:\n{out.stderr[-2000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["subprocess_wall_s"] = round(wall, 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--raw", action="store_true",
                    help="measure plain float32 synthesize instead of the "
                         "serving configuration (int16 fused via a "
                         "BatchingServer submit — the default, which is "
                         "what a serving restart actually loads)")
    ap.add_argument("--cold-cache", action="store_true",
                    help="also measure with an EMPTY persistent cache "
                         "(full XLA compiles — minutes on the dev chip)")
    args = ap.parse_args()

    if args.model:
        model, config = args.model, args.config or f"{args.model}.json"
    else:
        # Build the synthetic voice in THIS process so the child only pays
        # load, not generation.
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        from piper_tpu.models.vits.synthetic import make_synthetic_voice

        model, config = make_synthetic_voice(
            tempfile.mkdtemp(prefix="coldstart_"), quality=args.quality,
            seed=0)

    out = {"metric": "cold_start_budget", "quality": args.quality,
           "platform": args.platform or "device-default",
           "config": "raw-float32-split" if args.raw
                     else "serving-int16-fused (BatchingServer)"}
    # Order matters: run the warm-cache scenario FIRST so the cold-cache
    # run (separate empty cache dir) cannot pollute it, and the default
    # cache is already populated by normal use.
    out["cold_process_warm_cache"] = run_child(model, config,
                                               args.platform, raw=args.raw)
    if args.cold_cache:
        with tempfile.TemporaryDirectory(prefix="piper_cold_cache_") as d:
            out["cold_process_cold_cache"] = run_child(
                model, config, args.platform, cache_dir=d, raw=args.raw)
    # The warm-process number rides along in every child ("warm_call_ms").
    out["warm_process_call_ms"] = out["cold_process_warm_cache"][
        "warm_call_ms"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
