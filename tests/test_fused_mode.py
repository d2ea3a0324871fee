"""Fused single-round-trip execution mode."""

import numpy as np
import pytest

from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def voice(tiny_voice):
    return tiny_voice


def test_fused_basic(voice):
    model, config = voice
    rt = PiperRuntime(model, config, RuntimeOptions(mode="fused"))
    audio = rt.synthesize(FIXTURE_IDS)
    assert len(audio) > 0 and np.isfinite(audio).all()
    t = rt.last_run_timings
    assert t.frame_bucket >= 32
    # Deterministic
    np.testing.assert_array_equal(audio, rt.synthesize(FIXTURE_IDS))


def test_fused_matches_split_when_bucket_aligns(voice):
    model, config = voice
    rt_split = PiperRuntime(model, config, RuntimeOptions(mode="split"))
    a_split = rt_split.synthesize(FIXTURE_IDS)
    split_bucket = rt_split.last_run_timings.frame_bucket

    # Choose a fused budget that lands on the same frame bucket: then the
    # noise shapes (and thus the audio) are identical.
    rt_fused = PiperRuntime(
        model, config,
        RuntimeOptions(mode="fused",
                       fused_frames_per_phoneme=max(1, split_bucket // len(FIXTURE_IDS))),
    )
    a_fused = rt_fused.synthesize(FIXTURE_IDS)
    if rt_fused.last_run_timings.frame_bucket == split_bucket:
        np.testing.assert_array_equal(a_fused, a_split)
    else:
        assert len(a_fused) == len(a_split)


@pytest.mark.slow
def test_fused_overflow_falls_back_to_split(voice):
    model, config = voice
    rt = PiperRuntime(
        model, config, RuntimeOptions(mode="fused", fused_frames_per_phoneme=1)
    )
    audio = rt.synthesize(FIXTURE_IDS, length_scale=3.0)  # long durations
    rt_split = PiperRuntime(model, config, RuntimeOptions(mode="split"))
    a_split = rt_split.synthesize(FIXTURE_IDS, length_scale=3.0)
    np.testing.assert_array_equal(audio, a_split)
