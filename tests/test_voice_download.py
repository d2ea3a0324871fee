"""VoiceManager download/cache paths, exercised offline via file:// URLs."""

import hashlib

import numpy as np
import pytest

from piper_tpu.core.voices import VoiceDownloadError, VoiceEntry, VoiceIndex, VoiceManager
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def hosted_voice(tmp_path_factory):
    """A synthetic voice 'hosted' at file:// URLs with real sha256 sums."""
    d = tmp_path_factory.mktemp("hosted")
    model, config = make_synthetic_voice(d, quality="test", seed=5,
                                         voice_name="xx_XX-test-x_low")
    def sha(p):
        return hashlib.sha256(p.read_bytes()).hexdigest()

    entry = VoiceEntry(
        id="xx_XX-test-x_low",
        language="xx_XX",
        quality="test",
        model_url=model.as_uri(),
        config_url=config.as_uri(),
        model_sha256=sha(model),
        config_sha256=sha(config),
    )
    return entry


def test_ensure_voice_downloads_and_caches(hosted_voice, tmp_path):
    vm = VoiceManager(cache_root=tmp_path, index=VoiceIndex([hosted_voice]))
    model_path, config_path = vm.ensure_voice("xx_XX-test-x_low")
    assert model_path.exists() and config_path.exists()
    assert "voices/xx_XX-test-x_low" in str(model_path)
    # Second call reuses the cache (mtimes unchanged).
    m1 = model_path.stat().st_mtime_ns
    vm.ensure_voice("xx_XX-test-x_low")
    assert model_path.stat().st_mtime_ns == m1
    # No .partial leftovers.
    assert not list(tmp_path.rglob("*.partial"))


def test_sha_mismatch_rejected(hosted_voice, tmp_path):
    bad = VoiceEntry(**{**hosted_voice.__dict__, "model_sha256": "0" * 64})
    vm = VoiceManager(cache_root=tmp_path, index=VoiceIndex([bad]))
    with pytest.raises(VoiceDownloadError, match="validation"):
        vm.ensure_voice("xx_XX-test-x_low")
    assert not list(tmp_path.rglob("*.partial"))


def test_poisoned_cache_redownloaded(hosted_voice, tmp_path):
    vm = VoiceManager(cache_root=tmp_path, index=VoiceIndex([hosted_voice]))
    model_path, _ = vm.ensure_voice("xx_XX-test-x_low")
    # Poison the cached model with an HTML error page.
    model_path.write_bytes(b"<html>502 Bad Gateway</html>")
    model_path2, _ = vm.ensure_voice("xx_XX-test-x_low")
    assert model_path2.read_bytes()[:1] != b"<"


def test_load_voice_end_to_end(hosted_voice, tmp_path):
    vm = VoiceManager(cache_root=tmp_path, index=VoiceIndex([hosted_voice]))
    rt = PiperRuntime.load_voice("xx_XX-test-x_low", manager=vm)
    audio = rt.synthesize(FIXTURE_IDS)
    assert len(audio) > 0 and np.isfinite(audio).all()
    assert rt.sample_rate == 16000
