"""Profiler, trace, debug-intermediates, recorder, and CLI tooling tests."""

import json

import numpy as np
import pytest

from piper_tpu import cli
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
from piper_tpu.testing import record_test_vector, replay_test_vector, write_test_summary
from piper_tpu.utils.profiling import Profiler

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_profiler_accumulates(runtime):
    runtime.synthesize(FIXTURE_IDS)
    runtime.synthesize(FIXTURE_IDS)
    rows = runtime.profiler.rows()
    stages = {s for s, _, _ in rows}
    assert {"encode", "decode"} <= stages
    # The tiny_runtime fixture is session-shared: pick THIS call's bucket
    # (other test files may have touched other buckets once).
    bucket = runtime.last_run_timings.phoneme_bucket
    enc = next(st for s, b, st in rows if s == "encode" and b == bucket)
    assert enc.count >= 2
    # (compile counting is asserted in test_profiler_standalone — on the
    # session-shared runtime another test file may have owned the compile)
    summary = runtime.profiler.summary()
    assert "encode" in summary and "mean_ms" in summary


def test_profiler_standalone():
    p = Profiler()
    p.record("encode", 16, 5.0, compiled=True)
    p.record("encode", 16, 3.0)
    (stage, bucket, st), = p.rows()
    assert stage == "encode" and bucket == 16
    assert st.count == 2 and st.mean_ms == 4.0 and st.max_ms == 5.0 and st.compiles == 1


def test_debug_intermediates(runtime):
    out = runtime.synthesize_debug(FIXTURE_IDS, max_frames=64)
    hp = runtime.hparams
    p_bucket = 16
    assert out["enc_hidden"].shape == (1, hp.hidden_channels, p_bucket)
    assert out["m_p"].shape == (1, hp.inter_channels, p_bucket)
    assert out["logw"].shape == (1, 1, p_bucket)
    assert out["path"].shape == (1, 64, p_bucket)
    assert out["z"].shape == (1, hp.inter_channels, 64)
    assert out["audio"].shape == (1, 64 * hp.hop_length)
    assert all(np.isfinite(v).all() for v in out.values())
    # The path assigns each valid frame to exactly one phoneme.
    valid = int(out["y_lengths"][0])
    assert (out["path"][0, :valid].sum(-1) == 1).all()


def test_record_and_replay_roundtrip(runtime, tmp_path):
    vec = record_test_vector(runtime, FIXTURE_IDS, tmp_path, "t0", seed=3)
    path = write_test_summary(runtime, [vec], tmp_path / "test_summary.json")
    # Schema fields the reference pins (PiperTestVector.swift:3-52).
    d = json.loads(path.read_text())
    tv = d["results"][0]
    for key in ("test_id", "phoneme_ids", "metadata", "audio_files", "audio_stats",
                "random_files", "description"):
        assert key in tv, key
    assert tv["random_files"]["dp_shape"] == [1, 2, len(FIXTURE_IDS)]
    # Replay with injected RNG must reproduce the waveform bit-exactly
    # (same runtime, same device).
    r = replay_test_vector(runtime, path)
    assert r["length_match"]
    assert r["max_abs_err"] == 0.0


def test_cli_verify_summary(runtime, tmp_path, capsys):
    vec = record_test_vector(runtime, FIXTURE_IDS, tmp_path, "t1", seed=4)
    write_test_summary(runtime, [vec], tmp_path / "test_summary.json")
    cli.main(["--verify-summary", str(tmp_path / "test_summary.json")])
    out = json.loads(capsys.readouterr().out)
    assert out["passed"] is True
    assert out["max_abs_err_worst"] <= 1e-3


def test_cli_list_voices(capsys):
    cli.main(["--list-voices"])
    out = capsys.readouterr().out
    assert "en_GB-northern_english_male-medium" in out
    assert "149 voices" in out
