"""Edge-case robustness: extreme scales, degenerate inputs, truncation."""

import numpy as np
import pytest

from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_frame_overflow_truncates_with_warning(tiny_voice, capsys):
    model, config = tiny_voice
    rt = PiperRuntime(
        model, config,
        RuntimeOptions(frame_buckets=(32, 64)),  # artificially tiny ladder
    )
    audio = rt.synthesize(FIXTURE_IDS, length_scale=10.0)
    # Clamped to the largest bucket instead of raising — and says so.
    assert len(audio) == 64 * rt.hparams.hop_length
    assert np.isfinite(audio).all()
    assert "truncated" in capsys.readouterr().err


def test_extreme_scales(runtime):
    a_fast = runtime.synthesize(FIXTURE_IDS, length_scale=0.1)
    a_slow = runtime.synthesize(FIXTURE_IDS, length_scale=2.5)
    assert 0 < len(a_fast) < len(a_slow)
    for a in (a_fast, a_slow):
        assert np.isfinite(a).all()
    a_noisy = runtime.synthesize(FIXTURE_IDS, noise_scale=5.0, noise_w=5.0)
    assert np.isfinite(a_noisy).all()
    assert np.abs(a_noisy).max() <= 1.0  # tanh-bounded even at silly noise
    a_silent = runtime.synthesize(FIXTURE_IDS, noise_scale=0.0, noise_w=0.0)
    assert np.isfinite(a_silent).all()


def test_single_phoneme(runtime):
    audio = runtime.synthesize([1])
    assert len(audio) >= runtime.hparams.hop_length
    assert np.isfinite(audio).all()


def test_repeated_synthesize_stable(runtime):
    """No state leaks across calls: interleaved shapes stay deterministic."""
    a1 = runtime.synthesize(FIXTURE_IDS)
    runtime.synthesize(FIXTURE_IDS * 3)
    runtime.synthesize(FIXTURE_IDS[:4])
    a2 = runtime.synthesize(FIXTURE_IDS)
    np.testing.assert_array_equal(a1, a2)
