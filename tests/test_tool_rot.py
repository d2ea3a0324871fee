"""Rot guards for the environment-bound validation paths (VERDICT r3 #6).

Two validations can only fully run OUTSIDE this offline environment:
the onnxruntime fidelity oracle (tools/compare_with_ort.py — the package
is not installable here) and the live real-voice download. They must stay
one `pip install` / one network cable from green, so these tests exercise
every piper-tpu-side step with stubs, and carry visible skip-marked live
variants that run the real thing the moment the environment allows.
"""

import json
import os

import numpy as np
import pytest

from tests.real_export_fixture import build_real_like_checkpoint

FIXTURE_IDS = [1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2]


def _write_config(tmp_path, n_speakers=1):
    from piper_tpu.models.vits.synthetic import default_phoneme_id_map

    cfg = tmp_path / "c.onnx.json"
    cfg.write_text(json.dumps({
        "audio": {"sample_rate": 22050, "quality": "medium"},
        "espeak": {"voice": "en-gb-x-rp"},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0,
                      "noise_w": 0.8},
        "phoneme_type": "espeak",
        "phoneme_id_map": default_phoneme_id_map(256),
        "num_symbols": 256,
        "num_speakers": n_speakers,
    }))
    return cfg


class _FakeOrt:
    """A stand-in onnxruntime module: InferenceSession LOADS the rewritten
    checkpoint through the repo's own parser (so a rewrite/save bug fails
    here) and 'runs' it by synthesizing through an independent PiperRuntime
    with the fed noise — exercising the tool's feed construction, frame
    retry loop, and error math end to end."""

    def __init__(self, config_path):
        self._config = config_path
        outer = self

        class InferenceSession:
            def __init__(self, path, providers=None):
                from piper_tpu.onnx import load_model

                m = load_model(path)
                ops = [n.op_type for n in m.graph.nodes]
                assert "RandomNormalLike" not in ops, \
                    "rewrite left RNG nodes in the graph"
                names = [v.name for v in m.graph.inputs]
                assert "/dp/dp_noise" in names and "/flow/main_noise" in names
                self._path = path

            def run(self, outs, feeds):
                from piper_tpu.engine.runtime import PiperRuntime, \
                    RuntimeOptions

                # The rewritten file itself is the weights source — its
                # initializers are untouched by the rewrite.
                rt = PiperRuntime(self._path, outer._config, RuntimeOptions(
                    frame_buckets=(128,), phoneme_buckets=(16,)))
                ids = [int(i) for i in feeds["input"][0]]
                audio = rt.synthesize(
                    ids, dp_noise=feeds["/dp/dp_noise"],
                    main_noise=feeds["/flow/main_noise"])
                return [np.asarray(audio, np.float32).reshape(1, 1, 1, -1)]

        self.InferenceSession = InferenceSession


@pytest.mark.slow
def test_compare_with_ort_plumbing(tmp_path):
    """The whole tool pipeline with a stubbed ORT: noise recording, RNG
    externalization, rewritten-file round-trip, feed naming, and the
    PASS/FAIL math. With both sides synthesizing from the same weights and
    noise the error must be ~0 — any drift in the tool's plumbing (wrong
    noise input order, stale feed names, broken rewrite) fails loudly."""
    from tools.compare_with_ort import compare

    path = tmp_path / "real_like.onnx"
    build_real_like_checkpoint(path, seed=3)
    cfg = _write_config(tmp_path)
    r = compare(str(path), str(cfg), ids=FIXTURE_IDS,
                ort=_FakeOrt(str(cfg)))
    assert r["ok"], f"stubbed comparison failed: err={r['err']}"
    assert r["err"] <= 1e-6  # same weights, same noise, same math
    assert len(r["ours"]) == len(r["theirs"])


@pytest.mark.skipif(
    not os.environ.get("PIPER_TPU_ONNXRUNTIME"),
    reason="onnxruntime not installable offline — set PIPER_TPU_ONNXRUNTIME=1 "
           "on a machine with the package to run the real oracle",
)
def test_compare_with_ort_live(tmp_path):
    """The REAL oracle on the reconstruction (or a real voice if
    PIPER_TPU_VOICE points at one): runs the exact BASELINE fidelity gate."""
    import onnxruntime  # noqa: F401 — the skipif promises it exists

    from tools.compare_with_ort import compare

    model = os.environ.get("PIPER_TPU_VOICE")
    config = None
    if not model:
        model = str(tmp_path / "real_like.onnx")
        build_real_like_checkpoint(model, seed=3)
        config = str(_write_config(tmp_path))
    r = compare(model, config, ids=FIXTURE_IDS)
    assert r["ok"], f"ORT fidelity gate failed: err={r['err']}"


@pytest.mark.skipif(
    not os.environ.get("PIPER_TPU_LIVE_NET"),
    reason="no network egress offline — set PIPER_TPU_LIVE_NET=1 on a "
           "networked machine to download and validate a real voice",
)
def test_real_voice_download_live(tmp_path):
    """Download the fingerprinted real voice over the live network, check
    the committed structural fingerprint against the actual bytes, and
    synthesize once — the validation the offline reconstruction
    approximates (tests/test_real_fingerprint.py)."""
    from piper_tpu.core.voices import VoiceManager
    from piper_tpu.engine.runtime import PiperRuntime
    from piper_tpu.onnx import load_model

    mgr = VoiceManager(cache_root=tmp_path)
    model, config = mgr.ensure_voice("en_GB-northern_english_male-medium")
    fp = json.load(open("tests/fixtures/real_voice_fingerprint.json"))
    m = load_model(model)
    assert len(m.graph.nodes) == fp["facts"]["node_count"]
    assert len(m.graph.initializers) == fp["facts"]["initializer_count"]
    assert [v.name for v in m.graph.inputs] == fp["facts"]["graph_inputs"]
    rt = PiperRuntime(model, config)
    audio = rt.synthesize(FIXTURE_IDS)
    assert len(audio) > 0 and np.isfinite(np.asarray(audio)).all()


@pytest.mark.slow
def test_release_check_plumbing(tmp_path):
    """The one-command release drill (tools/release_check.py) end to end
    with injected fakes: a 'downloaded' voice set served from the repo's
    real-architecture reconstructions, the stub ORT, and a fake espeak
    binary. Every step must run and report ok so the tool is one network
    cable / pip install away from closing the env-bound gaps for real."""
    from tools.release_check import _fingerprints, run_release_check

    cfg = _write_config(tmp_path)
    voices = {}
    for fp in _fingerprints():
        v = fp["voice"]
        path = tmp_path / f"{v}.onnx"
        build_real_like_checkpoint(path, seed=3, voice=v)
        voices[v] = (path, cfg)

    class _Manager:
        def ensure_voice(self, vid):
            return voices[vid]

    fake = tmp_path / "espeak-ng"
    fake.write_text("#!/bin/sh\necho 'ab'\n")
    fake.chmod(0o755)

    out = run_release_check(
        ("download", "fingerprints", "ort", "espeak"),
        manager=_Manager(), ort=_FakeOrt(str(cfg)), espeak_cmd=str(fake))
    for step in ("download", "fingerprints", "ort", "espeak"):
        assert out["steps"][step]["status"] == "ok", out["steps"][step]
    assert out["steps"]["bench"]["status"] == "skipped"
    assert out["ok"] is True


def test_release_check_blocked_offline(tmp_path):
    """Offline, the drill must degrade to a checklist — blocked with
    reasons, exit-fail aggregate — not crash."""
    from tools.release_check import run_release_check

    class _NoNet:
        def ensure_voice(self, vid):
            raise OSError("network unreachable (offline test)")

    out = run_release_check(("download", "fingerprints", "espeak"),
                            manager=_NoNet(),
                            espeak_cmd=str(tmp_path / "missing-binary"))
    assert out["steps"]["download"]["status"] == "blocked"
    assert out["steps"]["fingerprints"]["status"] == "blocked"
    assert out["steps"]["espeak"]["status"] == "blocked"
    assert out["ok"] is False
