"""Multi-speaker coverage across all serving paths."""

import numpy as np
import pytest

from piper_tpu import cli
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.engine.server import VoiceServer
from piper_tpu.models.vits.synthetic import make_synthetic_voice
from piper_tpu.utils.wav import read_wav

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def ms_voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("ms_paths")
    return make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                gin_channels=32)


@pytest.fixture(scope="module")
def runtime(ms_voice):
    return PiperRuntime(*ms_voice)


def test_multispeaker_incremental_streaming(runtime):
    chunks = list(runtime.synthesize_stream(FIXTURE_IDS, incremental=True,
                                            speaker_id=2))
    audio = np.concatenate([c.samples for c in chunks])
    assert len(audio) > 0 and np.isfinite(audio).all()
    # A different speaker gives different audio through the streaming path.
    other = np.concatenate([
        c.samples for c in runtime.synthesize_stream(FIXTURE_IDS, incremental=True,
                                                     speaker_id=3)
    ])
    if audio.shape == other.shape:
        assert not np.allclose(audio, other)


def test_multispeaker_streaming_matches_full(runtime):
    """Injected noise: multi-speaker streaming equals the full decode."""
    hp = runtime.hparams
    rng = np.random.default_rng(3)
    dp_noise = rng.standard_normal((1, 2, len(FIXTURE_IDS))).astype(np.float32)
    runtime.synthesize(FIXTURE_IDS, speaker_id=1, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    full = runtime.synthesize(FIXTURE_IDS, speaker_id=1, dp_noise=dp_noise,
                              main_noise=main_noise)
    streamed = np.concatenate([
        c.samples for c in runtime.synthesize_stream_incremental(
            FIXTURE_IDS, chunk_frames=16, speaker_id=1,
            dp_noise=dp_noise, main_noise=main_noise, total_frames=fb)
    ])
    assert len(streamed) == len(full)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_cli_speaker_id(ms_voice, tmp_path, capsys):
    model, _ = ms_voice
    out0 = tmp_path / "s0.wav"
    out2 = tmp_path / "s2.wav"
    cli.main(["--model", str(model), "--phoneme-ids",
              ",".join(map(str, FIXTURE_IDS)), "--speaker-id", "0", "-o", str(out0)])
    cli.main(["--model", str(model), "--phoneme-ids",
              ",".join(map(str, FIXTURE_IDS)), "--speaker-id", "2", "-o", str(out2)])
    a0, _ = read_wav(out0)
    a2, _ = read_wav(out2)
    assert len(a0) > 0 and len(a2) > 0
    if a0.shape == a2.shape:
        assert not np.allclose(a0, a2)


def test_server_streaming_passthrough(ms_voice):
    model, config = ms_voice
    with VoiceServer() as server:
        key = server.load(model, config)
        chunks = list(server.synthesize_stream(key, FIXTURE_IDS, speaker_id=1))
        assert chunks[-1].is_final
        assert sum(len(c.samples) for c in chunks) > 0
