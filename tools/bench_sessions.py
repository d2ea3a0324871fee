"""Multi-session bench protocol: median-of-sessions for a drifting device.

The dev chip's throughput moves up to ~40% between sessions (docs/BENCH.md
device notes), so single-run numbers are unreliable for A/B comparisons.
This driver runs `bench.py` N times in FRESH processes (cold jax client,
warm persistent jit cache after session 1) and reports the per-metric
median and spread — the analog of the reference's pinned A/B protocol
(bench/run_from_clone.sh: clean clone, pinned env, fixed fixture).

Usage:
    python3 tools/bench_sessions.py --sessions 3 -- --batch 32 --no-high

Everything after `--` is forwarded to bench.py. Prints one JSON line:
{"sessions": N, "median": {...}, "all": [...]}  with median rtf_per_chip,
ms_mean_factor1, and per-row medians keyed like bench.py's output.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def _median_paths(results):
    """Median of every numeric leaf across session dicts (missing keys skipped)."""
    def walk(vals):
        ref = next((v for v in vals if v is not None), None)
        if isinstance(ref, dict):
            keys = {k for v in vals if isinstance(v, dict) for k in v}
            return {k: walk([v.get(k) if isinstance(v, dict) else None for v in vals])
                    for k in sorted(keys)}
        if isinstance(ref, (int, float)) and not isinstance(ref, bool):
            nums = [v for v in vals if isinstance(v, (int, float))
                    and not isinstance(v, bool)]
            return round(statistics.median(nums), 3) if nums else None
        return ref  # strings/lists: first session's value
    return walk(results)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--" in argv:
        split = argv.index("--")
        own, fwd = argv[:split], argv[split + 1:]
    else:
        own, fwd = argv, []
    parser = argparse.ArgumentParser()
    parser.add_argument("--sessions", type=int, default=3)
    parser.add_argument("--timeout", type=int, default=3600,
                        help="per-session timeout (seconds)")
    args = parser.parse_args(own)

    results = []
    for i in range(args.sessions):
        proc = subprocess.run(
            [sys.executable, str(REPO_ROOT / "bench.py"), *fwd],
            capture_output=True, text=True, timeout=args.timeout,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"session {i}: bench failed (rc={proc.returncode}): "
                  f"{proc.stderr.strip()[-500:]}", file=sys.stderr)
    if not results:
        print(json.dumps({"sessions": 0, "error": "no successful sessions"}))
        return 1

    med = _median_paths(results)
    rtfs = [r.get("value") for r in results if isinstance(r.get("value"), (int, float))]
    print(json.dumps({
        "metric": "rtf_per_chip_median",
        "value": round(statistics.median(rtfs), 2) if rtfs else None,
        "unit": "x_realtime",
        "sessions": len(results),
        "spread": [min(rtfs), max(rtfs)] if rtfs else None,
        "median": med,
        "all": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
