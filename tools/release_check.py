#!/usr/bin/env python3
"""One-command release drill: every validation this repo cannot run in its
offline dev environment, chained so the day network / onnxruntime /
espeak-ng exist, one invocation closes the remaining external gaps
(round-5 VERDICT #9; the gaps themselves are VERDICT "What's missing"
#1-3, rot-guarded in tests/test_tool_rot.py):

  1. download      — fetch every fingerprinted real voice via VoiceManager
                     (sha256-checked, atomic .partial rename).
  2. fingerprints  — verify the committed structural fingerprints against
                     the REAL bytes (until now the two non-medium
                     architectures are validated against this repo's own
                     reconstruction; this step replaces self-validation
                     with ground truth).
  3. ort           — run the BASELINE fidelity oracle
                     (tools/compare_with_ort.py) against onnxruntime on
                     the downloaded medium voice.
  4. espeak        — live espeak-ng phonemization (text -> IPA -> ids) on
                     a real sentence.
  5. bench         — the driver bench (one JSON line) so a release ships
                     with a fresh perf number.

Steps that cannot run here report "blocked" with the reason instead of
failing, so the tool degrades to a checklist offline. Exit code 0 only
when every step ran and passed.

    python tools/release_check.py                 # run everything possible
    python tools/release_check.py --steps ort     # one step
    python tools/release_check.py --json          # machine-readable

Plumbing is dry-run tested in the suite (tests/test_tool_rot.py::
test_release_check_plumbing) with injected fakes, like the other
env-bound tools.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURE_DIR = REPO / "tests" / "fixtures"
FINGERPRINT_FILES = (
    "real_voice_fingerprint.json",
    "real_voice_fingerprint_ryan_high.json",
    "real_voice_fingerprint_libritts_high.json",
)
ALL_STEPS = ("download", "fingerprints", "ort", "espeak", "bench")


def _fingerprints() -> list[dict]:
    return [json.loads((FIXTURE_DIR / f).read_text())
            for f in FINGERPRINT_FILES]


def check_fingerprint(model, fp: dict) -> None:
    """The same structural assertions tests/test_real_fingerprint.py makes
    on the reconstruction — here against real bytes."""
    facts = fp["facts"]
    g = model.graph
    checks = [
        ("opset_version", model.opset_version, facts["opset_version"]),
        ("node_count", len(g.nodes), facts["node_count"]),
        ("initializer_count", len(g.initializers),
         facts["initializer_count"]),
        ("graph_inputs", [v.name for v in g.inputs], facts["graph_inputs"]),
        ("graph_outputs", [v.name for v in g.outputs],
         facts["graph_outputs"]),
        ("first_node_op", g.nodes[0].op_type, facts["first_node_op"]),
    ]
    for name, got, want in checks:
        if got != want:
            raise AssertionError(f"{fp['voice']}: {name} mismatch — "
                                 f"real bytes {got!r} vs committed {want!r}")
    for name in facts["initializers_present"]:
        if name not in g.initializers:
            raise AssertionError(f"{fp['voice']}: initializer {name!r} "
                                 f"missing from real bytes")


def run_release_check(steps=ALL_STEPS, *, cache_root=None, manager=None,
                      ort=None, espeak_cmd="espeak-ng",
                      bench_cmd=None, load_model=None) -> dict:
    """Run the drill; injectables (manager/ort/espeak_cmd/bench_cmd/
    load_model) exist so the suite can dry-run the plumbing offline.
    Returns {"ok": bool, "steps": {name: {"status", "detail"}}} where
    status is ok | fail | blocked | skipped."""
    results: dict = {}
    paths: dict = {}

    def record(name, status, detail=""):
        results[name] = {"status": status, "detail": str(detail)[:500]}

    # -- 1. download -------------------------------------------------------
    if "download" in steps:
        try:
            if manager is None:
                from piper_tpu.core.voices import VoiceManager

                manager = VoiceManager(cache_root=cache_root)
            for fp in _fingerprints():
                paths[fp["voice"]] = manager.ensure_voice(fp["voice"])
            record("download", "ok", f"{len(paths)} voices")
        except Exception as e:  # noqa: BLE001 — classify, keep going
            status = ("blocked" if isinstance(e, (OSError, ConnectionError))
                      or "urlopen" in repr(e) or "Network" in repr(e)
                      else "fail")
            record("download", status, e)
    else:
        record("download", "skipped")

    # -- 2. fingerprints vs real bytes --------------------------------------
    if "fingerprints" in steps:
        if not paths:
            record("fingerprints", "blocked", "no downloaded voices")
        else:
            try:
                if load_model is None:
                    from piper_tpu.onnx import load_model
                for fp in _fingerprints():
                    got = paths.get(fp["voice"])
                    if got is None:
                        raise AssertionError(f"{fp['voice']} not downloaded")
                    check_fingerprint(load_model(got[0]), fp)
                record("fingerprints", "ok",
                       f"{len(paths)} architectures match real bytes")
            except Exception as e:  # noqa: BLE001
                record("fingerprints", "fail", e)
    else:
        record("fingerprints", "skipped")

    # -- 3. the ORT fidelity oracle -----------------------------------------
    if "ort" in steps:
        try:
            if ort is None:
                import onnxruntime  # noqa: F401
            from tools.compare_with_ort import compare

            medium = _fingerprints()[0]
            got = paths.get(medium["voice"])
            if got is None:
                record("ort", "blocked", "medium voice not downloaded")
            else:
                r = compare(str(got[0]), str(got[1]), ort=ort)
                record("ort", "ok" if r["ok"] else "fail",
                       f"err={r['err']:.3e} (gate 1e-3)")
        except ImportError as e:
            record("ort", "blocked", f"onnxruntime unavailable: {e}")
        except Exception as e:  # noqa: BLE001
            record("ort", "fail", e)
    else:
        record("ort", "skipped")

    # -- 4. live espeak-ng ---------------------------------------------------
    if "espeak" in steps:
        try:
            binary = (espeak_cmd.split()[0] if isinstance(espeak_cmd, str)
                      else espeak_cmd[0])
            if shutil.which(binary) is None:
                record("espeak", "blocked", f"{binary} not on PATH")
            else:
                from piper_tpu.core.config import VoiceConfig
                from piper_tpu.phonemize import ESpeakPhonemizer

                medium = _fingerprints()[0]
                got = paths.get(medium["voice"])
                if got is None:
                    record("espeak", "blocked",
                           "voice config not downloaded (id map needed)")
                else:
                    cfg = VoiceConfig.load(got[1])
                    ph = ESpeakPhonemizer(cfg.espeak.voice,
                                          cfg.phoneme_id_map,
                                          espeak_path=binary)
                    ids = ph.phoneme_ids("The quick brown fox.")
                    if len(ids) < 5:
                        raise AssertionError(f"suspiciously short: {ids}")
                    record("espeak", "ok", f"{len(ids)} ids")
        except Exception as e:  # noqa: BLE001
            record("espeak", "fail", e)
    else:
        record("espeak", "skipped")

    # -- 5. bench ------------------------------------------------------------
    if "bench" in steps:
        try:
            cmd = bench_cmd or [sys.executable, str(REPO / "bench.py")]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=7200)
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-500:])
            line = json.loads(out.stdout.strip().splitlines()[-1])
            record("bench", "ok",
                   f"{line.get('metric')}={line.get('value')} "
                   f"{line.get('unit')}")
        except Exception as e:  # noqa: BLE001
            record("bench", "fail", e)
    else:
        record("bench", "skipped")

    ran = [r for r in results.values() if r["status"] in ("ok", "fail")]
    ok = bool(ran) and all(r["status"] == "ok" for r in ran) and not any(
        r["status"] == "blocked" for r in results.values())
    return {"ok": ok, "steps": results}


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Release drill: download -> fingerprints -> ORT oracle "
                    "-> espeak -> bench")
    ap.add_argument("--steps", default=",".join(ALL_STEPS),
                    help=f"comma-separated subset of {ALL_STEPS}")
    ap.add_argument("--cache-root", default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    steps = tuple(s.strip() for s in args.steps.split(",") if s.strip())
    unknown = set(steps) - set(ALL_STEPS)
    if unknown:
        raise SystemExit(f"unknown steps: {sorted(unknown)}")
    out = run_release_check(steps, cache_root=args.cache_root)
    if args.json:
        print(json.dumps(out), flush=True)
    else:
        for name, r in out["steps"].items():
            print(f"{name:13s} {r['status']:8s} {r['detail']}")
        print("RELEASE CHECK:", "PASS" if out["ok"] else
              "INCOMPLETE/FAIL (see above)")
    raise SystemExit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
