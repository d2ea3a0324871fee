"""Fuzz the ONNX checkpoint parsers (python + native C++) for crash-safety.

The reference's loader hardening is the bad-tag error path
(ONNXLoader.swift:280-288); here the analog contract is checked under
deterministic random corruption: the python loader must only ever return a
model or raise OnnxLoadError, the native parser must never take down the
process, and when both accept a file they must agree (differential check).

The actual fuzzing runs in a subprocess (tests/fuzz_driver.py) so a native
segfault fails this test instead of killing pytest, and an rlimit bounds
allocation blowups from corrupt dims.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

_DRIVER = Path(__file__).resolve().parent / "fuzz_driver.py"


def _run_driver(model_path, seed: int, count: int):
    proc = subprocess.run(
        [sys.executable, str(_DRIVER), str(model_path), str(seed), str(count)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, f"fuzz driver failed (rc={proc.returncode}):\n{tail}"
    summary_lines = [
        line for line in proc.stdout.splitlines() if line.startswith("SUMMARY ")
    ]
    assert summary_lines, f"no SUMMARY line in driver output:\n{tail}"
    return json.loads(summary_lines[-1][len("SUMMARY "):])


def test_fuzz_mutated_checkpoints(tiny_voice):
    model_path, _config = tiny_voice
    stats = _run_driver(model_path, seed=1234, count=200)
    assert stats["py_ok"] + stats["py_load_error"] == stats["cases"]
    # The mutation mix must actually exercise both outcomes, or the fuzz
    # is vacuous (e.g. every mutation rejected at the first tag).
    assert stats["py_load_error"] > 0
    assert stats["py_ok"] > 0
    if stats["native_built"]:
        assert stats["native_ok"] + stats["native_none"] + stats["native_exc"] == (
            stats["cases"]
        )
        # Differential coverage: some files must have been accepted by both.
        assert stats["compared"] > 0
