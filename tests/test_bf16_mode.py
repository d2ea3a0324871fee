"""bfloat16 end-to-end mode (throughput-only tier) smoke tests."""

import numpy as np
import pytest

from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def bf16_runtime(tiny_voice):
    return PiperRuntime(*tiny_voice, RuntimeOptions(precision="bfloat16"))


def test_bf16_synthesize(bf16_runtime):
    audio = bf16_runtime.synthesize(FIXTURE_IDS)
    assert audio.dtype == np.float32  # output converts back to f32 PCM
    assert len(audio) > 0 and np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0


def test_bf16_batch_and_stream(bf16_runtime):
    audios = bf16_runtime.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:6]])
    assert all(len(a) > 0 and np.isfinite(a).all() for a in audios)
    chunks = list(bf16_runtime.synthesize_stream(FIXTURE_IDS, incremental=True))
    assert chunks[-1].is_final
    assert np.isfinite(np.concatenate([c.samples for c in chunks])).all()
