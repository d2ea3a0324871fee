"""Multi-voice server tests."""

import numpy as np
import pytest

from piper_tpu.engine.server import VoiceServer
from piper_tpu.models.vits.synthetic import make_synthetic_voice

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def voices(tmp_path_factory):
    d = tmp_path_factory.mktemp("server_voices")
    v1, _ = make_synthetic_voice(d / "a", quality="test", seed=1, voice_name="voice-a")
    v2, _ = make_synthetic_voice(d / "b", quality="test", seed=2, voice_name="voice-b")
    v3, _ = make_synthetic_voice(
        d / "c", quality="test", seed=3, n_speakers=4, gin_channels=16,
        voice_name="voice-multispeaker",
    )
    return v1, v2, v3


def test_multi_voice_loading_and_synthesis(voices):
    v1, v2, v3 = voices
    with VoiceServer() as server:
        k1 = server.load(v1)
        k2 = server.load(v2)
        assert server.loaded_voices == ["voice-a", "voice-b"]
        a1 = server.synthesize(k1, FIXTURE_IDS)
        a2 = server.synthesize(k2, FIXTURE_IDS)
        assert len(a1) > 0 and len(a2) > 0
        # Different weights => different audio.
        if a1.shape == a2.shape:
            assert not np.allclose(a1, a2)
        # Loading again is a no-op (same runtime object).
        rt = server.runtime(k1)
        server.load(v1)
        assert server.runtime(k1) is rt


def test_multispeaker_voice_via_server(voices):
    _, _, v3 = voices
    with VoiceServer() as server:
        k = server.load(v3)
        a0 = server.synthesize(k, FIXTURE_IDS, speaker_id=0)
        a2 = server.synthesize(k, FIXTURE_IDS, speaker_id=2)
        assert len(a0) > 0 and len(a2) > 0
        if a0.shape == a2.shape:
            assert not np.allclose(a0, a2)


def test_lru_eviction(voices):
    v1, v2, v3 = voices
    with VoiceServer(max_voices=2) as server:
        server.load(v1)
        server.load(v2)
        server.load(v3)
        assert len(server.loaded_voices) == 2
        assert "voice-a" not in server.loaded_voices
        # Touch voice-b, then load voice-a again: voice-multispeaker evicts.
        server.synthesize("voice-b", FIXTURE_IDS)
        server.load(v1)
        assert set(server.loaded_voices) == {"voice-b", "voice-a"}


def test_server_pipeline(voices):
    v1, _, _ = voices
    with VoiceServer() as server:
        k = server.load(v1)
        pipe = server.pipeline(k)
        futs = [pipe.submit(FIXTURE_IDS, seed=i) for i in range(3)]
        audios = [f.result(timeout=300) for f in futs]
        assert all(len(a) > 0 for a in audios)
        assert server.pipeline(k) is pipe


def test_multivoice_batching_server_real_voices(voices):
    """Continuous batching across two resident voices on one worker: mixed
    per-voice traffic resolves with finite audio and per-voice metrics."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    v1, v2, _ = voices
    from piper_tpu.engine.runtime import PiperRuntime

    rts = {"a": PiperRuntime(v1), "b": PiperRuntime(v2)}
    with MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=30) as srv:
        futs = []
        for i in range(4):
            futs.append(("a", srv.submit("a", FIXTURE_IDS)))
            futs.append(("b", srv.submit("b", FIXTURE_IDS[: 6 + i])))
        audios = [(v, f.result(timeout=600)) for v, f in futs]
    for _, a in audios:
        assert len(a) > 0 and np.isfinite(a).all()
    m = srv.metrics()
    assert m["a"]["rows"] == 4 and m["b"]["rows"] == 4
    assert m["a"]["completed"] == 4 and m["b"]["completed"] == 4
