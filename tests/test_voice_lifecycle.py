"""Voice lifecycle memory discipline (round-5 VERDICT #5).

A deployment that loads and unloads voices must release device memory:
PiperRuntime.close() deletes the weight buffers, UnifiedServer.remove_voice
(close_runtime=True) calls it once the voice's last stream drains, metrics
expose per-voice HBM, and the shared program-set cache has an explicit
eviction surface (engine.runtime.evict_program_sets).
"""

import time

import numpy as np
import pytest

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIX
from piper_tpu.engine.runtime import (PiperRuntime, evict_program_sets,
                                      program_set_count)
from piper_tpu.engine.unified import UnifiedServer


def test_runtime_close_releases_weights(tiny_voice):
    rt = PiperRuntime(*tiny_voice)
    assert rt.hbm_bytes() > 0 and not rt.closed
    audio = rt.synthesize(FIX, seed=1)
    assert np.isfinite(audio).all()
    buffers = list(rt.params.values())
    rt.close()
    assert rt.closed and rt.hbm_bytes() == 0
    assert all(b.is_deleted() for b in buffers)
    with pytest.raises(RuntimeError, match="closed"):
        rt.synthesize(FIX, seed=1)
    rt.close()  # idempotent


def test_program_set_eviction_and_count(tiny_voice):
    rt = PiperRuntime(*tiny_voice)
    assert program_set_count() >= 1
    assert evict_program_sets() >= 1
    assert program_set_count() == 0
    # Existing runtimes keep their own jit handles — still synthesizes.
    audio = rt.synthesize(FIX, seed=2)
    assert np.isfinite(audio).all()
    # And the next same-arch runtime repopulates the shared set.
    rt2 = PiperRuntime(*tiny_voice)
    assert program_set_count() >= 1
    rt2.close()
    rt.close()


def test_unified_remove_voice_closes_runtime(tiny_voice):
    rt_a = PiperRuntime(*tiny_voice)
    srv = UnifiedServer(
        {"a": rt_a}, max_batch=2, max_wait_ms=5,
        stream_kwargs=dict(emit_frames=16, c0=8, row_rungs=(1, 2),
                           max_sessions=4))
    try:
        rt_b = PiperRuntime(*tiny_voice)
        srv.add_voice("b", rt_b, prewarm=False,
                      stream_prewarm=False).result(timeout=120)
        # Serve both surfaces on b, then remove with close_runtime.
        srv.submit("b", FIX).result(timeout=600)
        chunks = list(srv.submit_stream("b", FIX))
        assert chunks[-1].is_final
        assert srv.metrics()["batch"]["a"]["hbm_bytes"] > 0
        base = rt_b.hbm_bytes()
        assert base > 0
        srv.remove_voice("b", close_runtime=True).result(timeout=120)
        deadline = time.monotonic() + 60
        while not rt_b.closed and time.monotonic() < deadline:
            time.sleep(0.05)
        assert rt_b.closed, "runtime not closed after streams drained"
        assert rt_b.hbm_bytes() == 0
        # The resident voice is untouched and still serves.
        assert rt_a.hbm_bytes() > 0
        audio = srv.submit("a", FIX).result(timeout=600)
        assert np.isfinite(audio).all()
    finally:
        srv.close()
    assert not rt_a.closed  # caller-owned; close() is the caller's call


def test_unified_close_closes_pending_remove_runtime(tiny_voice):
    """close_runtime removals whose streams never drained are closed by
    UnifiedServer.close() (their consumers were failed)."""
    rt_a = PiperRuntime(*tiny_voice)
    rt_b = PiperRuntime(*tiny_voice)
    srv = UnifiedServer(
        {"a": rt_a, "b": rt_b}, max_batch=2, max_wait_ms=5,
        stream_kwargs=dict(emit_frames=16, c0=8, row_rungs=(1, 2),
                           max_sessions=4))
    try:
        srv.remove_voice("b", close_runtime=True).result(timeout=120)
    finally:
        srv.close()
    assert rt_b.closed
    assert not rt_a.closed
