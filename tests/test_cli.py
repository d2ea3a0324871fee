"""CLI surface tests: one-shot synthesis, bench modes, JSON schemas."""

import json

import numpy as np
import pytest

from piper_tpu import cli
from piper_tpu.models.vits.synthetic import make_synthetic_voice
from piper_tpu.utils.wav import read_wav

FIXTURE_IDS = "1,20,0,120,0,61,0,24,0,59,0,100,0,2"


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_voice")
    model, config = make_synthetic_voice(d, quality="test", seed=0)
    summary = {
        "model_path": str(model),
        "config_path": str(config),
        "num_tests": 1,
        "results": [
            {
                "test_id": "fixture_short",
                "phoneme_ids": [int(x) for x in FIXTURE_IDS.split(",")],
                "metadata": {
                    "sample_rate": 16000,
                    "noise_scale": 0.667,
                    "length_scale": 1.0,
                    "noise_w": 0.8,
                },
            }
        ],
    }
    summary_path = d / "test_summary.json"
    summary_path.write_text(json.dumps(summary))
    return model, config, summary_path


def test_oneshot_phoneme_ids(voice, tmp_path, capsys):
    model, config, _ = voice
    out = tmp_path / "o.wav"
    cli.main(["--model", str(model), "--phoneme-ids", FIXTURE_IDS, "-o", str(out)])
    assert "wrote" in capsys.readouterr().out
    audio, rate = read_wav(out)
    assert rate == 16000
    assert len(audio) > 0
    assert np.abs(audio).max() <= 1.0


def test_oneshot_ipa(voice, tmp_path, capsys):
    model, config, _ = voice
    out = tmp_path / "ipa.wav"
    cli.main(["--model", str(model), "--ipa", "ab", "-o", str(out)])
    audio, _ = read_wav(out)
    assert len(audio) > 0


def test_bench_summary_schema(voice, capsys):
    _, _, summary_path = voice
    cli.main(["--bench-summary", str(summary_path), "--warmup", "1", "--iters", "2"])
    out = json.loads(capsys.readouterr().out)
    for key in ("backend", "ms_mean", "ms_p50", "ms_p95", "ms_max", "sample_rate",
                "num_runs", "rtf_mean", "compile_count"):
        assert key in out, key
    assert out["backend"] == "piper-tpu"
    assert out["num_runs"] == 2
    assert out["ms_mean"] > 0


@pytest.mark.slow
def test_scale_bench_schema(voice, capsys):
    _, _, summary_path = voice
    cli.main(["--scale-bench", "--bench-summary", str(summary_path),
              "--scale-factors", "1,2", "--warmup", "1", "--iters", "1"])
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "scale-bench"
    assert out["scale_factors"] == [1, 2]
    assert len(out["results"]) == 2
    row = out["results"][0]
    for key in ("factor", "phoneme_count", "ms_mean", "ms_p50", "ms_p95", "ms_max",
                "rtf_mean", "phoneme_bucket", "frame_bucket"):
        assert key in row, key
    assert out["results"][1]["phoneme_count"] == 28


def test_microbench_schema(capsys):
    cli.main(["--microbench"])
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "microbench"
    assert out["eager_chain_ms"] > 0
    assert out["jit_chain_ms"] > 0


def test_missing_args_errors(voice):
    model, _, _ = voice
    with pytest.raises(SystemExit):
        cli.main(["--phoneme-ids", FIXTURE_IDS])  # no model/voice
    with pytest.raises(SystemExit):
        cli.main(["--scale-bench"])  # no summary


def test_oneshot_alignment_json(voice, tmp_path, capsys):
    model, config, _ = voice
    out = tmp_path / "o.wav"
    aj = tmp_path / "align.json"
    cli.main(["--model", str(model), "--phoneme-ids", FIXTURE_IDS,
              "-o", str(out), "--alignment", str(aj)])
    audio, sr = read_wav(str(out))
    doc = json.loads(aj.read_text())
    assert doc["sample_rate"] == sr
    (utt,) = doc["utterances"]
    ids = [int(x) for x in FIXTURE_IDS.split(",")]
    assert [p["id"] for p in utt["phonemes"]] == ids
    assert utt["phonemes"][-1]["end_sample"] == len(audio)
    assert utt["total_samples"] == len(audio)


def test_alignment_rejected_with_stream(voice, tmp_path):
    model, config, _ = voice
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids", FIXTURE_IDS,
                  "--stream", "-o", str(tmp_path / "o.wav"),
                  "--alignment", str(tmp_path / "a.json")])
