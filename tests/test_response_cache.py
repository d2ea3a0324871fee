"""Response cache: identical requests served from memory.

Synthesis is deterministic (seeded, row-invariant noise), so the batcher
can legally cache results — the canned-phrase traffic pattern of real TTS
deployments. Off by default (cache_mb=0)."""

import numpy as np
import pytest

from piper_tpu.engine.batcher import BatchingServer
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_cache_hit_is_identical_and_counted(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10,
                        cache_mb=8) as server:
        a1 = server.submit(FIXTURE_IDS).result(timeout=300)
        a2 = server.submit(FIXTURE_IDS).result(timeout=300)
        m = server.metrics()
    np.testing.assert_array_equal(a1, a2)
    assert m["cache_hits"] == 1
    assert m["cache_bytes"] > 0
    assert m["completed"] == 2
    # cached results are read-only (shared across hits)
    with pytest.raises(ValueError):
        a2[0] = 0.0


def test_cache_keys_separate_conditioning(tmp_path_factory):
    d = tmp_path_factory.mktemp("cache_ms_voice")
    rt = PiperRuntime(*make_synthetic_voice(d, quality="test", seed=6,
                                            n_speakers=4, gin_channels=32))
    with BatchingServer(rt, max_batch=4, max_wait_ms=10,
                        cache_mb=8) as server:
        a0 = server.submit(FIXTURE_IDS, speaker_id=0).result(timeout=300)
        a1 = server.submit(FIXTURE_IDS, speaker_id=1).result(timeout=300)
        a_mix = server.submit(FIXTURE_IDS,
                              speaker_mix={0: 0.5, 1: 0.5}).result(timeout=300)
        a_ls = server.submit(FIXTURE_IDS,
                             length_scale=1.3).result(timeout=300)
        m = server.metrics()
        assert m["cache_hits"] == 0  # four distinct keys
        # and each repeats from cache
        b0 = server.submit(FIXTURE_IDS, speaker_id=0).result(timeout=300)
        b_mix = server.submit(
            FIXTURE_IDS, speaker_mix={0: 0.5, 1: 0.5}).result(timeout=300)
        assert server.metrics()["cache_hits"] == 2
    np.testing.assert_array_equal(a0, b0)
    np.testing.assert_array_equal(a_mix, b_mix)
    if a0.shape == a1.shape:
        assert not np.array_equal(a0, a1)
    assert np.isfinite(a_ls).all()


def test_cache_durations_and_forced(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10,
                        cache_mb=8) as server:
        d1 = server.submit_durations(FIXTURE_IDS).result(timeout=300)
        d2 = server.submit_durations(FIXTURE_IDS).result(timeout=300)
        np.testing.assert_array_equal(d1, d2)
        f1 = server.submit_forced(FIXTURE_IDS, list(d1)).result(timeout=300)
        f2 = server.submit_forced(FIXTURE_IDS, list(d1)).result(timeout=300)
        np.testing.assert_array_equal(f1, f2)
        m = server.metrics()
    assert m["cache_hits"] == 2
    # a durations hit must never satisfy a synth request or vice versa
    # (kind is part of the key) — shapes alone prove nothing, so check a
    # fresh synth still computes
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10,
                        cache_mb=8) as server:
        server.submit_durations(FIXTURE_IDS).result(timeout=300)
        server.submit(FIXTURE_IDS).result(timeout=300)
        assert server.metrics()["cache_hits"] == 0


def test_cache_evicts_lru(runtime):
    audio = None
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10,
                        cache_mb=8) as server:
        audio = server.submit(FIXTURE_IDS).result(timeout=300)
        nbytes = np.asarray(audio).nbytes
    # budget fits ONE entry: a second same-length request evicts the
    # first, so repeating the first recomputes (no hit)
    other = list(reversed(FIXTURE_IDS))
    budget_mb = (nbytes + nbytes // 2) / (1 << 20)
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10,
                        cache_mb=budget_mb) as server:
        server.submit(FIXTURE_IDS).result(timeout=300)
        server.submit(other).result(timeout=300)  # evicts the first
        server.submit(FIXTURE_IDS).result(timeout=300)  # -> miss
        m = server.metrics()
        assert m["cache_hits"] == 0
        assert 0 < m["cache_bytes"] <= budget_mb * (1 << 20)


def test_cache_disabled_by_default(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10) as server:
        server.submit(FIXTURE_IDS).result(timeout=300)
        server.submit(FIXTURE_IDS).result(timeout=300)
        m = server.metrics()
    assert m["cache_hits"] == 0 and m["cache_bytes"] == 0
