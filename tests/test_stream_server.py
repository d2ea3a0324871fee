"""Batched multi-stream serving (engine/stream_server.py).

The load-bearing property: a stream decoded in a batch with other streams
produces EXACTLY the audio it would produce alone (per-row window positions,
per-row seeds, per-row sequence edges). Everything else is scheduling.
"""

import threading

import numpy as np
import pytest

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS
from piper_tpu.engine.batcher import ServerOverloaded
from piper_tpu.engine.stream_server import StreamingServer


@pytest.fixture(scope="module")
def server(tiny_runtime):
    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2, 4), max_sessions=8)
    yield srv
    srv.shutdown()


def _collect(chunks):
    chunks = list(chunks)
    assert chunks[-1].is_final
    assert all(not c.is_final for c in chunks[:-1])
    offs = [c.start_sample_index for c in chunks]
    sizes = [len(c.samples) for c in chunks]
    assert offs == [int(np.sum(sizes[:i])) for i in range(len(sizes))]
    return np.concatenate([c.samples for c in chunks])


def _reference(rt, ids, seed):
    return np.concatenate([
        c.samples for c in rt.synthesize_stream_incremental(ids, seed=seed)
    ])


def test_single_stream_matches_incremental(server, tiny_runtime):
    ids = FIXTURE_IDS * 3
    got = _collect(server.submit(ids, seed=5))
    ref = _reference(tiny_runtime, ids, seed=5)
    assert len(got) == len(ref)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_concurrent_streams_are_exact(server, tiny_runtime):
    """Streams batched together must each equal their solo decode — across
    different lengths, seeds, and finish times."""
    cases = [(FIXTURE_IDS * 2, 11), (FIXTURE_IDS * 5, 12), (FIXTURE_IDS, 13),
             (FIXTURE_IDS * 4, 14)]
    results = {}
    errors = []

    def run(i, ids, seed):
        try:
            results[i] = _collect(server.submit(ids, seed=seed))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i, ids, seed))
               for i, (ids, seed) in enumerate(cases)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == len(cases)
    for i, (ids, seed) in enumerate(cases):
        ref = _reference(tiny_runtime, ids, seed)
        assert len(results[i]) == len(ref), (i, len(results[i]), len(ref))
        np.testing.assert_allclose(results[i], ref, atol=1e-5,
                                   err_msg=f"stream {i}")
    m = server.metrics()
    assert m["window_dispatches"] >= 1
    # concurrency actually batched rows (not 4 serialized B=1 decodes)
    assert m["window_rows"] > m["window_dispatches"]


def test_chunk_cadence(server, tiny_runtime):
    """Chunk 0 carries c0 frames, steady chunks emit_frames, tail trimmed."""
    hop = tiny_runtime.hparams.hop_length
    chunks = list(server.submit(FIXTURE_IDS * 3, seed=2))
    sizes = [len(c.samples) for c in chunks]
    assert sizes[0] == 8 * hop
    assert all(s == 16 * hop for s in sizes[1:-1])
    assert 0 < sizes[-1] <= 16 * hop


def test_short_stream_is_single_final_chunk(server, tiny_runtime):
    """An utterance that fits in the head window ends in one chunk."""
    big = StreamingServer(tiny_runtime, emit_frames=16, c0=4096,
                          row_rungs=(1,), max_sessions=2)
    try:
        chunks = list(big.submit(FIXTURE_IDS, seed=3))
        assert len(chunks) == 1 and chunks[0].is_final
        ref = _reference(tiny_runtime, FIXTURE_IDS, seed=3)
        assert len(chunks[0].samples) == len(ref)
    finally:
        big.shutdown()


def test_overload_rejects(tiny_runtime):
    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1,), max_sessions=1)
    try:
        it = srv.submit(FIXTURE_IDS * 3, seed=1)
        with pytest.raises(ServerOverloaded):
            srv.submit(FIXTURE_IDS, seed=2)
        _collect(it)  # drain; the slot frees
        _collect(srv.submit(FIXTURE_IDS, seed=2))
    finally:
        srv.shutdown()


def test_invalid_ids_fail_only_that_stream(server):
    with pytest.raises(ValueError):
        list(server.submit([10 ** 9], seed=1))
    # server still serves
    _collect(server.submit(FIXTURE_IDS, seed=4))


def _mk_session(ids, seed):
    import queue

    from piper_tpu.engine.stream_server import _Session

    return _Session(sid=0, ids=list(ids), seed=seed, noise_scale=None,
                    length_scale=None, noise_w=None, speaker_id=None,
                    out=queue.Queue(maxsize=100))


def test_burst_heads_batch_and_match_solo(tiny_runtime):
    """Simultaneous same-bucket arrivals run ONE batched head program;
    each row's first chunk equals the solo stream's audio — including a
    shorter row sharing the bucket (the seeded duration-noise draw spans
    the bucket, so same-bucket grouping is the exactness condition)."""
    import jax

    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2, 4), max_sessions=8)
    try:
        short = (FIXTURE_IDS * 2)[:17]  # bucket 32, same as 28 phonemes
        cases = [(FIXTURE_IDS * 2, 31), (FIXTURE_IDS * 2, 32), (short, 33)]
        sessions = [_mk_session(ids, seed) for ids, seed in cases]
        with srv._lock:
            srv._n_open += len(sessions)
        work = srv._dispatch_heads(sessions)
        assert [w[0] for w in work] == ["headb"]
        m = srv.metrics()
        assert m["head_dispatches"] == 1 and m["head_rows"] == 3
        assert m["padded_head_rows"] == 1  # 3 rows pad to rung 4
        srv._process("headb", work[0][1], jax.device_get(work[0][2]))
        for (ids, seed), s in zip(cases, sessions):
            chunk = s.out.get(timeout=30)
            ref = _reference(tiny_runtime, ids, seed)
            np.testing.assert_allclose(
                chunk.samples, ref[: len(chunk.samples)], atol=1e-5)
            if chunk.is_final:
                assert len(chunk.samples) == len(ref)
    finally:
        srv.shutdown()


def test_burst_mixed_buckets_split_into_groups(tiny_runtime):
    """Arrivals from different phoneme buckets never share a head batch
    (bucket-dependent noise would change a stream's audio)."""
    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2, 4), max_sessions=8)
    try:
        cases = [(FIXTURE_IDS, 41), (FIXTURE_IDS * 2, 42),
                 (FIXTURE_IDS * 2, 43)]  # buckets 16, 32, 32
        sessions = [_mk_session(ids, seed) for ids, seed in cases]
        with srv._lock:
            srv._n_open += len(sessions)
        work = srv._dispatch_heads(sessions)
        kinds = sorted(w[0] for w in work)
        assert kinds == ["head", "headb"]
        import jax

        for kind, target, handles in work:
            srv._process(kind, target, jax.device_get(handles))
        for (ids, seed), s in zip(cases, sessions):
            chunk = s.out.get(timeout=30)
            ref = _reference(tiny_runtime, ids, seed)
            np.testing.assert_allclose(
                chunk.samples, ref[: len(chunk.samples)], atol=1e-5)
    finally:
        srv.shutdown()


def test_bad_row_fails_only_that_stream_in_a_burst(tiny_runtime):
    """A validation error inside a burst falls back to solo heads: the
    good streams play, only the offending one fails."""
    import jax

    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2, 4), max_sessions=8)
    try:
        good = _mk_session(FIXTURE_IDS * 2, 51)
        bad = _mk_session((FIXTURE_IDS * 2)[:-1] + [10 ** 9], 52)
        with srv._lock:
            srv._n_open += 2
        work = srv._dispatch_heads([good, bad])
        assert [w[0] for w in work] == ["head"]  # solo fallback, bad failed
        assert isinstance(bad.out.get_nowait(), ValueError)
        for kind, target, handles in work:
            srv._process(kind, target, jax.device_get(handles))
        ref = _reference(tiny_runtime, good.ids, 51)
        chunk = good.out.get(timeout=30)
        np.testing.assert_allclose(
            chunk.samples, ref[: len(chunk.samples)], atol=1e-5)
    finally:
        srv.shutdown()


def test_prewarm_covers_traffic_programs(tiny_runtime):
    srv = StreamingServer(tiny_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2), max_sessions=4)
    try:
        srv.prewarm(phoneme_lengths=(len(FIXTURE_IDS),))
        before = len(tiny_runtime._compiled_keys)
        done = []

        def run(seed):
            done.append(_collect(srv.submit(FIXTURE_IDS, seed=seed)))

        threads = [threading.Thread(target=run, args=(s,)) for s in (1, 2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(done) == 2
        assert len(tiny_runtime._compiled_keys) == before
    finally:
        srv.shutdown()


def test_cancel_frees_session_slot(tiny_runtime):
    """An abandoned stream (consumer stops early) must release its
    max_sessions slot once cancelled — review finding: without a cancel
    path an abandoned iterator parks the session forever."""
    import time as _t

    from piper_tpu.engine.stream_server import StreamingServer

    srv = StreamingServer(tiny_runtime, max_sessions=2, emit_frames=16,
                          c0=8)
    try:
        handle = srv.submit(FIXTURE_IDS * 4)
        it = iter(handle)
        next(it)  # read the head chunk, then walk away
        handle.cancel()
        deadline = _t.time() + 30
        while _t.time() < deadline and srv.metrics()["open_sessions"] > 0:
            _t.sleep(0.02)
        assert srv.metrics()["open_sessions"] == 0
        # slot is reusable: a fresh stream completes
        chunks = list(srv.submit(FIXTURE_IDS))
        assert chunks and chunks[-1].is_final
        # cancel-before-head also frees
        h2 = srv.submit(FIXTURE_IDS * 4)
        h2.cancel()
        deadline = _t.time() + 30
        while _t.time() < deadline and srv.metrics()["open_sessions"] > 0:
            _t.sleep(0.02)
        assert srv.metrics()["open_sessions"] == 0
    finally:
        srv.shutdown()


def test_cancel_as_context_manager(tiny_runtime):
    from piper_tpu.engine.stream_server import StreamingServer

    srv = StreamingServer(tiny_runtime, max_sessions=2, emit_frames=16,
                          c0=8)
    try:
        with srv.submit(FIXTURE_IDS * 4) as handle:
            next(iter(handle))
        import time as _t

        deadline = _t.time() + 30
        while _t.time() < deadline and srv.metrics()["open_sessions"] > 0:
            _t.sleep(0.02)
        assert srv.metrics()["open_sessions"] == 0
    finally:
        srv.shutdown()


def test_worker_crash_fails_every_session(tiny_runtime, monkeypatch):
    """Review finding: sessions dispatched in the CURRENT tick (new_work /
    ready) were missed by the crash handler — their consumers hung forever
    and their slots leaked. Inject a window-dispatch failure and require
    every open stream to resolve (with an error) and every slot to free."""
    import time as _t

    from piper_tpu.engine.stream_server import StreamingServer

    srv = StreamingServer(tiny_runtime, max_sessions=4, emit_frames=16, c0=8)
    try:
        def boom(*a, **k):
            raise RuntimeError("injected window failure")

        handles = [srv.submit(FIXTURE_IDS * 4, seed=i) for i in range(3)]
        monkeypatch.setattr(srv.rt, "dispatch_window_batch", boom)
        results = []
        for h in handles:
            try:
                results.append(sum(len(c.samples) for c in h))
            except Exception as e:  # noqa: BLE001
                results.append(e)
        # every consumer resolved (no hang), none silently truncated
        assert all(isinstance(r, Exception) for r in results
                   if not isinstance(r, int))
        deadline = _t.time() + 30
        while _t.time() < deadline and srv.metrics()["open_sessions"] > 0:
            _t.sleep(0.02)
        assert srv.metrics()["open_sessions"] == 0
    finally:
        srv.shutdown()
