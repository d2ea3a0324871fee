"""PiperRuntime end-to-end tests on a synthetic voice (CPU)."""

import numpy as np
import pytest
import torch

from piper_tpu.engine.bucketing import BucketOverflowError, bucket_for
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
from piper_tpu.models.vits.hparams import PRESETS
from piper_tpu.models.vits.synthetic import make_synthetic_voice, synthetic_params
from piper_tpu.utils.wav import read_wav, write_wav

from oracle import vits_torch as oracle

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_bucket_for():
    assert bucket_for(14, (16, 32, 64)) == 16
    assert bucket_for(16, (16, 32, 64)) == 16
    assert bucket_for(17, (16, 32, 64)) == 32
    with pytest.raises(BucketOverflowError):
        bucket_for(100, (16, 32, 64))


def test_synthesize_basic(runtime):
    audio = runtime.synthesize(FIXTURE_IDS)
    assert audio.dtype == np.float32
    assert len(audio) > 0
    assert len(audio) % runtime.hparams.hop_length == 0
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0
    t = runtime.last_run_timings
    assert t.phoneme_bucket == 16
    assert t.samples == len(audio)
    assert t.rtf > 0


@pytest.mark.slow
def test_prewarm_compiles_ladder(tiny_voice):
    rt = PiperRuntime(*tiny_voice)
    stats = rt.prewarm(phoneme_lengths=(14,), batch_sizes=(1, 2))
    assert stats["programs"] >= 2
    assert stats["seconds"] > 0
    # Subsequent calls at covered shapes hit compiled programs.
    rt.synthesize(FIXTURE_IDS)
    assert rt.last_run_timings.compiled is False
    rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS])
    assert rt.last_run_timings.compiled is False
    # Prewarming again is a no-op.
    assert rt.prewarm(phoneme_lengths=(14,), batch_sizes=(1, 2))["programs"] == 0


def test_synthesize_deterministic(runtime):
    a1 = runtime.synthesize(FIXTURE_IDS)
    a2 = runtime.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(a1, a2)
    a3 = runtime.synthesize(FIXTURE_IDS, seed=7)
    assert len(a3) > 0
    assert a3.shape != a1.shape or not np.array_equal(a3, a1)


def test_no_recompile_on_repeat_and_scale_change(runtime):
    runtime.synthesize(FIXTURE_IDS)
    count = runtime.last_run_timings.compile_count
    runtime.synthesize(FIXTURE_IDS, noise_scale=0.5, length_scale=1.2, noise_w=0.6)
    t = runtime.last_run_timings
    # Scale changes are traced scalars: no new program may be compiled
    # unless the duration change moved us to a different frame bucket.
    assert t.compile_count <= count + 1


def test_synthesize_batch(runtime):
    batch = [FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS * 2]
    audios = runtime.synthesize_batch(batch)
    assert len(audios) == 3
    for a in audios:
        assert len(a) > 0 and np.isfinite(a).all()


def test_synthesize_stream(runtime):
    chunks = list(runtime.synthesize_stream(FIXTURE_IDS, chunk_size=1024))
    assert chunks[-1].is_final
    assert all(not c.is_final for c in chunks[:-1])
    full = np.concatenate([c.samples for c in chunks])
    offsets = [c.start_sample_index for c in chunks]
    assert offsets == sorted(offsets)
    ref = runtime.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(full, ref)


def test_injected_noise_matches_oracle(runtime, tmp_path_factory):
    """The BASELINE.json fidelity gate: injected-RNG waveform must match the
    independent oracle within 1e-3 max-abs."""
    hp = runtime.hparams
    rng = np.random.default_rng(21)
    p = len(FIXTURE_IDS)
    dp_noise = rng.standard_normal((1, 2, p)).astype(np.float32)
    # Probe durations first to size main_noise to the selected bucket.
    audio_probe = runtime.synthesize(FIXTURE_IDS, dp_noise=dp_noise)
    f_bucket = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, f_bucket)).astype(np.float32)

    audio = runtime.synthesize(FIXTURE_IDS, dp_noise=dp_noise, main_noise=main_noise)
    assert len(audio) == len(audio_probe)

    weights = synthetic_params(PRESETS["test"], seed=5)
    ids = np.asarray([FIXTURE_IDS])
    dp_padded = np.zeros((1, 2, runtime.last_run_timings.phoneme_bucket), np.float32)
    dp_padded[:, :, :p] = dp_noise
    ids_padded = np.zeros((1, runtime.last_run_timings.phoneme_bucket), np.int64)
    ids_padded[0, :p] = ids
    with torch.no_grad():
        audio_t, ylen_t = oracle.infer(
            weights, runtime.hparams, ids_padded, np.asarray([p]),
            dp_padded, main_noise, max_frames=f_bucket,
            noise_scale=runtime.config.inference.noise_scale,
            length_scale=runtime.config.inference.length_scale,
            noise_w=runtime.config.inference.noise_w,
        )
    valid = int(ylen_t[0]) * hp.hop_length
    assert len(audio) == valid
    err = np.max(np.abs(audio - audio_t[0, :valid]))
    assert err <= 1e-3, f"max-abs waveform err {err} exceeds 1e-3"


def test_multispeaker_runtime(tmp_path_factory):
    d = tmp_path_factory.mktemp("voice_ms")
    model_path, config_path = make_synthetic_voice(
        d, quality="test", seed=6, n_speakers=4, gin_channels=32
    )
    rt = PiperRuntime(model_path, config_path)
    a0 = rt.synthesize(FIXTURE_IDS, speaker_id=0)
    a1 = rt.synthesize(FIXTURE_IDS, speaker_id=1)
    assert len(a0) > 0 and len(a1) > 0
    # Different speakers should produce different audio.
    if a0.shape == a1.shape:
        assert not np.allclose(a0, a1)
    # Default speaker is 0.
    a_default = rt.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(a_default, a0)


def test_wav_roundtrip(runtime, tmp_path):
    audio = runtime.synthesize(FIXTURE_IDS)
    path = tmp_path / "out.wav"
    write_wav(path, audio, runtime.sample_rate)
    loaded, rate = read_wav(path)
    assert rate == runtime.sample_rate
    assert len(loaded) == len(audio)
    np.testing.assert_allclose(loaded, audio, atol=1.0 / 32000)


def test_vocoder_precision_env_parsing(monkeypatch):
    """PIPER_TPU_VOCODER_PRECISION: single tier or per-level comma list."""
    monkeypatch.setenv("PIPER_TPU_VOCODER_PRECISION", "high")
    assert RuntimeOptions.from_env().vocoder_precision == "high"
    monkeypatch.setenv("PIPER_TPU_VOCODER_PRECISION", "highest,high,,default")
    assert RuntimeOptions.from_env().vocoder_precision == (
        "highest", "high", None, "default"
    )
    monkeypatch.delenv("PIPER_TPU_VOCODER_PRECISION")
    assert RuntimeOptions.from_env().vocoder_precision is None


def test_vocoder_precision_schedule_synthesizes(tiny_voice, tiny_runtime):
    """A per-level schedule (a mixed tuple, covering the calibrated-'high'
    plumbing) runs end to end; XLA-CPU computes every precision tier in
    fp32, so the waveform must match the default runtime bit-for-bit."""
    rt_mix = PiperRuntime(
        *tiny_voice, RuntimeOptions(vocoder_precision=("highest", "high"))
    )
    a_ref = tiny_runtime.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(rt_mix.synthesize(FIXTURE_IDS), a_ref)


def test_batch_axis_bucketing(tiny_voice):
    """Batched calls pad the ROW axis to the batch_buckets ladder (dummy
    rows copy row 0; outputs sliced to the real count), so varying group
    sizes — the continuous-batching reality — reuse a bounded program set
    instead of compiling one per distinct size."""
    rt = PiperRuntime(*tiny_voice)
    out3 = rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS[:6]],
                               seed=3)
    assert len(out3) == 3 and all(len(a) > 0 for a in out3)
    n_programs = len(rt._compiled_keys)
    # b=4 hits the same bucket-4 programs: no new compile
    out4 = rt.synthesize_batch([FIXTURE_IDS] * 4, seed=3)
    assert len(out4) == 4
    assert len(rt._compiled_keys) == n_programs
    # a padded b=3 call equals the b=4 call row-for-row when the requests
    # match (identical program, identical noise draw)
    out3b = rt.synthesize_batch([FIXTURE_IDS] * 3, seed=3)
    for a, r in zip(out3b, out4[:3]):
        np.testing.assert_array_equal(a, r)


def test_flow_precision_plumbing(tiny_voice, tiny_runtime, monkeypatch):
    """flow_precision scopes a matmul tier to the decode flows (streaming
    included); XLA-CPU computes every tier in fp32, so output must match the
    default runtime bit-for-bit. Env flag parses like the other tiers."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(flow_precision="high"))
    a_ref = tiny_runtime.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(rt.synthesize(FIXTURE_IDS), a_ref)
    # streaming path compiles with the tier too
    chunks = list(rt.synthesize_stream(FIXTURE_IDS, incremental=True))
    assert sum(len(c.samples) for c in chunks) == len(a_ref)
    monkeypatch.setenv("PIPER_TPU_FLOW_PRECISION", "high")
    assert RuntimeOptions.from_env().flow_precision == "high"
    monkeypatch.delenv("PIPER_TPU_FLOW_PRECISION")
    assert RuntimeOptions.from_env().flow_precision is None


def test_int16_output_mode(tiny_voice, tiny_runtime, tmp_path):
    """output_dtype='int16': device-converted PCM16, within one quantization
    step of the float32 waveform, and WAV-writable without re-conversion."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(output_dtype="int16"))
    a16 = rt.synthesize(FIXTURE_IDS)
    ref = tiny_runtime.synthesize(FIXTURE_IDS)  # same seed/options otherwise
    assert a16.dtype == np.int16
    assert len(a16) == len(ref)
    np.testing.assert_allclose(
        a16.astype(np.float32) / 32767.0, ref, atol=1.5 / 32767.0
    )
    with pytest.raises(ValueError):
        PiperRuntime(*tiny_voice, RuntimeOptions(output_dtype="int8"))
    # WAV round trip: int16 PCM is written without re-conversion.
    audio = a16
    path = tmp_path / "pcm16.wav"
    write_wav(path, audio, rt.sample_rate)
    loaded, rate = read_wav(path)
    assert rate == rt.sample_rate
    np.testing.assert_allclose(loaded * 32767.0, audio.astype(np.float32),
                               atol=0.5)
