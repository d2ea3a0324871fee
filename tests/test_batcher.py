"""Continuous-batching server tests."""

import time

import numpy as np
import pytest

from piper_tpu.engine.batcher import BatchingServer
from piper_tpu.engine.runtime import PiperRuntime

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_batched_group_serves_all(runtime):
    with BatchingServer(runtime, max_batch=8, max_wait_ms=50) as server:
        futs = [server.submit(FIXTURE_IDS) for _ in range(8)]
        audios = [f.result(timeout=300) for f in futs]
    assert len(audios) == 8
    for a in audios:
        assert len(a) > 0 and np.isfinite(a).all()
    # Seeded noise is derived per row from (seed, bucket) alone, so
    # identical requests produce identical audio no matter how the server
    # grouped them — served results are reproducible under co-traffic.
    for a in audios[1:]:
        np.testing.assert_array_equal(audios[0], a)


def test_mixed_lengths_batch(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=50) as server:
        futs = [
            server.submit(FIXTURE_IDS),
            server.submit(FIXTURE_IDS[:6]),
            server.submit(FIXTURE_IDS * 2),
        ]
        audios = [f.result(timeout=300) for f in futs]
    lengths = [len(a) for a in audios]
    assert all(n > 0 for n in lengths)
    # Longer input should not produce shorter audio than a 6-id input.
    assert lengths[2] > lengths[1]


def test_length_bucketed_grouping(runtime):
    """Mixed lengths are served as same-phoneme-bucket batches (short
    prompts never pad to the longest paragraph in the window); results are
    correct per request, and the scheduler picks the oldest-waiting bucket
    first so neither bucket starves."""
    short, long = FIXTURE_IDS[:4], FIXTURE_IDS * 4  # buckets 16 and 64
    with BatchingServer(runtime, max_batch=4, max_wait_ms=100) as server:
        futs = [server.submit(short), server.submit(long),
                server.submit(short), server.submit(long)]
        audios = [f.result(timeout=300) for f in futs]
    assert len(audios) == 4
    assert len(audios[1]) > len(audios[0])
    # grouping math: per-(scales, bucket) queues
    from piper_tpu.engine.batcher import _Request

    srv = BatchingServer.__new__(BatchingServer)
    srv.rt = runtime
    srv.max_batch = 4
    srv.max_rows = 128
    srv.group_scale = 1.0
    srv.phoneme_budget = 4 * 128
    srv.max_wait_s = 0.0
    srv.deadline_s = None
    srv.fused = False
    srv._pending = 3
    srv._metrics = {"groups": 0, "rows": 0, "padded_rows": 0,
                    "wait_ms_sum": 0.0, "wait_ms_max": 0.0}
    srv._closed = True  # drain mode: no batching window
    import threading
    from collections import deque

    srv._cond = threading.Condition()
    srv._queues = {}
    for ids in (short, long, short):
        key = ((None, None, None),
               16 if len(ids) <= 16 else 64)
        srv._queues.setdefault(key, deque()).append(
            _Request(ids, (None, None, None), None, None))
    g1 = srv._take_group(block=False)
    g2 = srv._take_group(block=False)
    sizes = sorted([sorted(len(r.ids) for r in g) for g in (g1, g2)])
    assert sizes == [[4, 4], [56]]


def test_oversized_request_fails_its_future_only(runtime):
    """A request beyond the largest phoneme bucket must fail ITS future
    (BucketOverflowError surfaced per group) without killing the serve
    thread — the server keeps serving afterwards."""
    too_long = FIXTURE_IDS * 400  # 5600 > 4096-bucket ladder max
    with BatchingServer(runtime, max_batch=4, max_wait_ms=50) as server:
        f_bad = server.submit(too_long)
        f_ok = server.submit(FIXTURE_IDS)
        with pytest.raises(Exception):
            f_bad.result(timeout=300)
        assert len(f_ok.result(timeout=300)) > 0
        # server still alive for new work
        assert len(server.submit(FIXTURE_IDS[:6]).result(timeout=300)) > 0


def test_depth2_pipeline_drains_on_idle(runtime):
    """With sparse traffic every future resolves promptly (the pending
    fetch is completed as soon as the queue is empty, not held for a
    successor group)."""
    with BatchingServer(runtime, max_batch=8, max_wait_ms=5) as server:
        for i in range(3):
            a = server.submit(FIXTURE_IDS).result(timeout=300)
            assert len(a) > 0
        time.sleep(0.05)  # idle gap; server must not be wedged
        assert len(server.submit(FIXTURE_IDS[:6]).result(timeout=300)) > 0


def test_scale_mismatch_served_separately(runtime):
    with BatchingServer(runtime, max_batch=8, max_wait_ms=100) as server:
        f1 = server.submit(FIXTURE_IDS)
        f2 = server.submit(FIXTURE_IDS, length_scale=2.0)
        a1 = f1.result(timeout=300)
        a2 = f2.result(timeout=300)
    assert len(a2) > len(a1)  # length_scale=2 roughly doubles duration


def test_bad_request_fails_fast(runtime):
    with BatchingServer(runtime) as server:
        with pytest.raises(ValueError):
            server.submit([999999])
        # Server still healthy.
        a = server.submit(FIXTURE_IDS).result(timeout=300)
        assert len(a) > 0


def test_submit_after_close(runtime):
    server = BatchingServer(runtime)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(FIXTURE_IDS)


# -- fused single-round-trip group dispatch ---------------------------------


@pytest.fixture(scope="module")
def fused_runtime(tiny_voice):
    from piper_tpu.engine.runtime import RuntimeOptions

    return PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"))


def test_fused_batch_dispatch_fetch(fused_runtime):
    """dispatch_batch(fused=True) returns a group whose audio/lengths come
    back in ONE fetch; rows are finite and non-empty."""
    rt = fused_runtime
    batch = [FIXTURE_IDS, FIXTURE_IDS[:6], FIXTURE_IDS + FIXTURE_IDS[:2]]
    outs, meta = rt.dispatch_batch(batch, fused=True)
    assert meta.get("fused_batch")
    audios = rt.fetch_batch(outs, meta)
    assert len(audios) == 3
    for a in audios:
        assert len(a) > 0 and np.isfinite(np.asarray(a, np.float32)).all()
    # Longer input row should not produce shorter audio than the 6-id row.
    assert len(audios[2]) > len(audios[1])


def test_fused_batch_matches_split_when_bucket_matches(tiny_voice):
    """With a single-rung frame ladder both paths are forced onto the same
    frame bucket, so the noise realizations coincide and the audio must
    match (tight tolerance: fused vs split programs may fuse differently)."""
    from piper_tpu.engine.runtime import RuntimeOptions

    base = PiperRuntime(*tiny_voice)
    base.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:6]])
    f_bucket = base.last_run_timings.frame_bucket
    opts = RuntimeOptions(mode="fused", frame_buckets=(f_bucket,))
    rt = PiperRuntime(*tiny_voice, options=opts)
    split = rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:6]])
    outs, meta = rt.dispatch_batch([FIXTURE_IDS, FIXTURE_IDS[:6]], fused=True)
    fused = rt.fetch_batch(outs, meta)
    assert len(fused) == len(split) == 2
    for a, b in zip(fused, split):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-5, rtol=0,
        )


def test_fused_batch_overflow_rows_redone(tiny_voice):
    """Rows whose duration overflows the fused budget bucket are redone via
    the exact split path: same audio as a direct split-mode batch of those
    rows (bit-equal: the redo IS that call)."""
    from piper_tpu.engine.runtime import RuntimeOptions

    # A 1-frame-per-phoneme budget plus a stretched length_scale is always
    # exceeded, so EVERY row overflows — the bit-equality below needs the
    # redo set to be the whole batch (a partial redo runs at a different
    # batch shape, which matches only to XLA's ~1e-6 reassociation).
    opts = RuntimeOptions(mode="fused", fused_frames_per_phoneme=1)
    rt = PiperRuntime(*tiny_voice, options=opts)
    batch = [FIXTURE_IDS, FIXTURE_IDS[:6]]
    outs, meta = rt.dispatch_batch(batch, fused=True, length_scale=5.0)
    audios = rt.fetch_batch(outs, meta)
    expected = rt.synthesize_batch(batch, length_scale=5.0)
    for a, b in zip(audios, expected):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batcher_uses_fused_dispatch(fused_runtime):
    """A fused-mode runtime's BatchingServer serves groups through the
    single-round-trip path end to end."""
    with BatchingServer(fused_runtime, max_batch=8, max_wait_ms=50) as server:
        assert server.fused
        futs = [server.submit(FIXTURE_IDS) for _ in range(6)]
        audios = [f.result(timeout=300) for f in futs]
    assert all(len(a) > 0 for a in audios)
    m = server.metrics()
    assert m["completed"] == 6 and m["failed"] == 0


def test_fused_grid_rungs(fused_runtime):
    """Fused groups pad to a tiny rung set per bucket (small/mid/limit)."""
    srv = BatchingServer(fused_runtime, max_batch=8, max_wait_ms=1)
    try:
        assert srv._rungs(16) == (8, 16, 64)  # limit 8*128/16=64, mid 16
        assert srv._rungs(128) == (2, 8)      # limit 8, mid 2
        assert srv._pad_rows_for(16, 3) == 8
        assert srv._pad_rows_for(16, 9) == 16
        assert srv._pad_rows_for(16, 200) == 64  # capped at the limit rung
    finally:
        srv.close()


def test_prewarm_covers_grid(tiny_voice):
    """After prewarm(), serving a mixed burst hits ONLY prewarmed programs
    (no new compile keys — the whole point of the pinned grid)."""
    from piper_tpu.engine.runtime import RuntimeOptions

    rt = PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"))
    with BatchingServer(rt, max_batch=8, max_wait_ms=20) as server:
        stats = server.prewarm(p_buckets=[16, 32])
        assert stats["programs"] >= 2
        n_programs = len(rt._compiled_keys)
        futs = [server.submit(FIXTURE_IDS) for _ in range(12)]
        futs += [server.submit(FIXTURE_IDS * 2) for _ in range(3)]
        for f in futs:
            assert len(f.result(timeout=300)) > 0
        assert len(rt._compiled_keys) == n_programs, (
            "traffic compiled new programs beyond the prewarmed grid")


def test_pad_rows_to_and_budget_frames(fused_runtime):
    """Explicit grid controls: rows pad to the requested rung; the frame
    bucket derives from the pinned frame budget."""
    rt = fused_runtime
    outs, meta = rt.dispatch_batch([FIXTURE_IDS, FIXTURE_IDS[:6]],
                                   fused=True, pad_rows_to=8,
                                   budget_frames=48)
    assert outs[0].shape[0] == 8  # padded rows
    audios = rt.fetch_batch(outs, meta)
    assert len(audios) == 2 and all(len(a) > 0 for a in audios)
    with pytest.raises(ValueError):
        rt.dispatch_batch([FIXTURE_IDS] * 4, fused=True, pad_rows_to=2)


def test_overflow_redo_stays_on_fused_grid(tiny_voice):
    """Rows overflowing the pinned budget are redone via the taller fused
    grid program, NOT the split path (which would compile new programs
    mid-traffic)."""
    from piper_tpu.engine.runtime import RuntimeOptions

    rt = PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"))
    # budget_frames=32 is too small for this voice's 28-id utterance
    # (~2 frames/phoneme on the test voice x 28 > 32), so the row
    # overflows; 256 is plenty for the redo.
    outs, meta = rt.dispatch_batch(
        [FIXTURE_IDS * 2], fused=True, pad_rows_to=4, budget_frames=32,
        overflow_budget_frames=256, overflow_pad_rows=4)
    audios = rt.fetch_batch(outs, meta)
    assert len(audios) == 1 and len(audios[0]) > 32 * rt.hparams.hop_length
    # Only fused programs were compiled — no split enc/dec keys.
    kinds = {k for (k, _) in rt._compiled_keys}
    assert kinds == {"fused"}, kinds


def test_calibration_measures_fpp(fused_runtime):
    srv = BatchingServer(fused_runtime, max_batch=8, max_wait_ms=1)
    try:
        fpp = srv.calibrate()
        assert 0.5 <= fpp < 20.0
        assert srv._budget_frames(16) >= 32
    finally:
        srv.close()


# -- admission control ------------------------------------------------------


class _StubRuntime:
    """Deterministic runtime stand-in: dispatch blocks until released, so
    tests control exactly how much queue builds up."""

    def __init__(self):
        import threading
        from types import SimpleNamespace

        self.hparams = SimpleNamespace(n_vocab=1000, hop_length=4)
        self.options = SimpleNamespace(
            phoneme_buckets=(16, 32, 64), batch_buckets=(1, 2, 4, 8),
            mode="split",
        )
        self.release = threading.Event()
        self.dispatched = []

    def dispatch_batch(self, ids_batch, **kw):
        self.release.wait(timeout=60)
        self.dispatched.append(len(ids_batch))
        return None, {"b": len(ids_batch)}

    def fetch_batch(self, outs, meta):
        return [np.zeros(8, np.float32)] * meta["b"]


def test_overload_sheds_at_the_door():
    from piper_tpu.engine.batcher import ServerOverloaded

    rt = _StubRuntime()
    server = BatchingServer(rt, max_batch=4, max_wait_ms=1, max_pending=2)
    try:
        futs = [server.submit(FIXTURE_IDS) for _ in range(2)]
        # Worker may have taken up to one group already; submit until the cap
        # trips, bounded by a few attempts.
        with pytest.raises(ServerOverloaded):
            for _ in range(8):
                futs.append(server.submit(FIXTURE_IDS))
        assert server.metrics()["shed_overload"] >= 1
    finally:
        rt.release.set()
        server.close()
    # Every admitted request still completes.
    assert all(len(f.result(timeout=60)) == 8 for f in futs)


def test_deadline_sheds_stale_requests():
    from piper_tpu.engine.batcher import DeadlineExceeded

    rt = _StubRuntime()
    server = BatchingServer(rt, max_batch=4, max_wait_ms=1, deadline_ms=30)
    try:
        # First submit occupies the worker (blocked in dispatch); the rest
        # age past the deadline in the queue.
        f0 = server.submit(FIXTURE_IDS)
        time.sleep(0.1)
        stale = [server.submit(FIXTURE_IDS) for _ in range(3)]
        time.sleep(0.1)
        rt.release.set()  # worker finishes; next group selection sheds
        fresh = server.submit(FIXTURE_IDS)
        assert len(fresh.result(timeout=60)) == 8
        assert len(f0.result(timeout=60)) == 8
        n_shed = 0
        for f in stale:
            try:
                f.result(timeout=60)
            except DeadlineExceeded:
                n_shed += 1
        assert n_shed >= 1
        assert server.metrics()["shed_deadline"] == n_shed
    finally:
        rt.release.set()
        server.close()


def test_metrics_snapshot(runtime):
    with BatchingServer(runtime, max_batch=8, max_wait_ms=20) as server:
        futs = [server.submit(FIXTURE_IDS) for _ in range(5)]
        [f.result(timeout=300) for f in futs]
        m = server.metrics()
    assert m["submitted"] == 5
    assert m["completed"] == 5
    assert m["rows"] == 5
    assert m["groups"] >= 1
    assert m["wait_ms_max"] >= m["wait_ms_mean"] >= 0.0
    assert m["queue_depth"] == 0


# -- multi-voice batching -----------------------------------------------------


class _TaggedStub(_StubRuntime):
    """Stub whose fetched audio is filled with a per-voice tag value, and
    which logs (tag, rows) into a shared cross-voice dispatch log."""

    def __init__(self, tag: float, log):
        super().__init__()
        self.tag = tag
        self.log = log
        self.release.set()  # non-blocking by default

    def dispatch_batch(self, ids_batch, **kw):
        self.release.wait(timeout=60)
        self.log.append((self.tag, len(ids_batch)))
        return None, {"b": len(ids_batch)}

    def fetch_batch(self, outs, meta):
        return [np.full(8, self.tag, np.float32)] * meta["b"]


def test_multivoice_single_worker_no_cross_talk():
    """Requests to different voices resolve from THEIR voice's runtime,
    all served by one worker thread."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    log: list = []
    rts = {"a": _TaggedStub(1.0, log), "b": _TaggedStub(2.0, log)}
    with MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=5) as srv:
        assert sorted(srv.voices) == ["a", "b"]
        futs = [(v, srv.submit(v, FIXTURE_IDS))
                for v in ("a", "b", "a", "b", "b", "a")]
        for v, f in futs:
            audio = f.result(timeout=60)
            assert audio.shape == (8,)
            assert float(audio[0]) == (1.0 if v == "a" else 2.0)
    m = srv.metrics()
    assert m["a"]["rows"] == 3 and m["b"]["rows"] == 3
    assert sum(b for _, b in log) == 6


def test_multivoice_oldest_request_served_first():
    """The multiplexer picks the voice holding the globally oldest head
    request (fair across voices)."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    log: list = []
    rts = {"a": _TaggedStub(1.0, log), "b": _TaggedStub(2.0, log)}
    rts["a"].release.clear()  # block the first dispatch so queues build
    with MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=1) as srv:
        f_a = srv.submit("a", FIXTURE_IDS)
        time.sleep(0.05)  # a's group is taken and blocks in dispatch
        f_b1 = srv.submit("b", FIXTURE_IDS)
        time.sleep(0.02)
        f_a2 = srv.submit("a", FIXTURE_IDS)
        rts["a"].release.set()
        assert float(f_b1.result(timeout=60)[0]) == 2.0
        assert float(f_a.result(timeout=60)[0]) == 1.0
        assert float(f_a2.result(timeout=60)[0]) == 1.0
    # First dispatched group is voice a's (oldest head), then b's (queued
    # before a's second request).
    assert [t for t, _ in log[:2]] == [1.0, 2.0]


def test_multivoice_per_voice_admission():
    """max_pending bounds each voice's queue independently: one voice's
    backlog never sheds another voice's traffic."""
    from piper_tpu.engine.batcher import (MultiVoiceBatchingServer,
                                          ServerOverloaded)

    log: list = []
    rts = {"a": _TaggedStub(1.0, log), "b": _TaggedStub(2.0, log)}
    rts["a"].release.clear()
    rts["b"].release.clear()
    srv = MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=1,
                                   max_pending=2)
    futs = []
    try:
        futs.append(srv.submit("a", FIXTURE_IDS))
        time.sleep(0.05)  # worker takes a's group, blocks in dispatch
        futs += [srv.submit("a", FIXTURE_IDS) for _ in range(2)]
        with pytest.raises(ServerOverloaded):
            for _ in range(8):
                futs.append(srv.submit("a", FIXTURE_IDS))
        # voice b is unaffected by a's backlog
        futs.append(srv.submit("b", FIXTURE_IDS))
    finally:
        rts["a"].release.set()
        rts["b"].release.set()
        srv.close()
    assert all(len(f.result(timeout=60)) == 8 for f in futs)
    assert srv.metrics()["a"]["shed_overload"] >= 1
    assert srv.metrics()["b"]["shed_overload"] == 0


def test_multivoice_unknown_voice():
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    with MultiVoiceBatchingServer({"a": _TaggedStub(1.0, [])}) as srv:
        with pytest.raises(KeyError):
            srv.submit("nope", FIXTURE_IDS)


def test_multivoice_concurrent_submitters_stress():
    """Thread-safety under load: many submitter threads, three voices, one
    worker — every request completes exactly once with its voice's audio,
    and the counters reconcile."""
    import threading as _t
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    log: list = []
    rts = {f"v{i}": _TaggedStub(float(i + 1), log) for i in range(3)}
    results: list = []
    lock = _t.Lock()
    with MultiVoiceBatchingServer(rts, max_batch=8, max_wait_ms=2) as srv:
        def client(seed):
            rng = np.random.default_rng(seed)
            for _ in range(100):
                v = int(rng.integers(3))
                fut = srv.submit(f"v{v}", FIXTURE_IDS[: int(rng.integers(4, 14))])
                audio = fut.result(timeout=60)
                with lock:
                    results.append((v, float(audio[0])))
        threads = [_t.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        m = srv.metrics()
    assert len(results) == 800
    assert all(tag == v + 1 for v, tag in results)
    total_rows = sum(m[f"v{i}"]["rows"] for i in range(3))
    total_done = sum(m[f"v{i}"]["completed"] for i in range(3))
    assert total_rows == 800 and total_done == 800


def test_multivoice_add_voice_live():
    """A voice added to a live server starts serving; its prewarm runs on
    the worker thread (other voices' traffic resumes afterwards)."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    log: list = []
    rts = {"a": _TaggedStub(1.0, log)}
    with MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=2) as srv:
        assert srv.voices == ["a"]
        f1 = srv.submit("a", FIXTURE_IDS)
        with pytest.raises(KeyError):
            srv.submit("b", FIXTURE_IDS)
        stats = srv.add_voice("b", _TaggedStub(2.0, log),
                              prewarm=False).result(timeout=60)
        assert stats == {}
        f2 = srv.submit("b", FIXTURE_IDS)
        assert float(f1.result(timeout=60)[0]) == 1.0
        assert float(f2.result(timeout=60)[0]) == 2.0
        assert sorted(srv.voices) == ["a", "b"]
        # duplicate key fails on the future, not the worker
        with pytest.raises(ValueError):
            srv.add_voice("b", _TaggedStub(3.0, log),
                          prewarm=False).result(timeout=60)


def test_multivoice_remove_voice_fails_queued():
    from piper_tpu.engine.batcher import (MultiVoiceBatchingServer,
                                          ServerOverloaded)

    log: list = []
    rts = {"a": _TaggedStub(1.0, log), "b": _TaggedStub(2.0, log)}
    rts["b"].release.clear()  # hold b's dispatch so its queue builds
    srv = MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=2)
    try:
        fb0 = srv.submit("b", FIXTURE_IDS)
        time.sleep(0.05)  # worker takes b's group, blocks in dispatch
        queued = [srv.submit("b", FIXTURE_IDS) for _ in range(3)]
        rts["b"].release.set()
        n_failed = srv.remove_voice("b").result(timeout=60)
        # the in-flight group completes; only still-queued requests fail
        assert len(fb0.result(timeout=60)) == 8
        failed = 0
        for f in queued:
            try:
                f.result(timeout=60)
            except ServerOverloaded:
                failed += 1
        assert failed == n_failed
        with pytest.raises(KeyError):
            srv.submit("b", FIXTURE_IDS)
        # voice a unaffected
        assert float(srv.submit("a", FIXTURE_IDS).result(timeout=60)[0]) == 1.0
    finally:
        srv.close()


def test_worker_crash_fails_open_not_hang():
    """A scheduler bug escaping the worker loop must fail every queued and
    in-flight future instead of stranding callers forever."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    log: list = []
    rts = {"a": _TaggedStub(1.0, log)}
    rts["a"].release.clear()
    srv = MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=2)
    f0 = srv.submit("a", FIXTURE_IDS)
    time.sleep(0.05)  # in flight
    queued = [srv.submit("a", FIXTURE_IDS) for _ in range(2)]

    def boom(*a, **k):
        raise AssertionError("injected scheduler bug")

    srv._take_group = boom
    rts["a"].release.set()
    results = []
    for f in [f0] + queued:
        try:
            results.append(f.result(timeout=30))
        except Exception as e:  # noqa: BLE001
            results.append(e)
    # nothing hangs; the in-flight group may complete (its dispatch already
    # happened) but every queued future resolves with the worker-death error
    assert all(isinstance(r, (np.ndarray, Exception)) for r in results)
    assert any(isinstance(r, RuntimeError) and "worker died" in str(r)
               for r in results)
    with pytest.raises(RuntimeError):
        srv.submit("a", FIXTURE_IDS)  # server closed itself


def test_speaker_id_validated_at_submit(runtime):
    """Out-of-range speaker ids must 400 at the door: JAX clamps gather
    indices, which would silently return the LAST speaker's voice."""
    with BatchingServer(runtime, max_batch=4, max_wait_ms=5) as server:
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_id=999)
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_id=-1)


def test_mesh_rungs_snap_up_not_down():
    """Review finding: a group limit above the dp ladder's top snapped DOWN
    to ladder[-1], making pad_rows_to smaller than full groups (every
    dispatch would fail). It must snap UP to a dp-multiple."""
    from types import SimpleNamespace

    rt = _StubRuntime()
    rt.mesh = object()  # truthy: triggers the dp-divisibility snap
    rt.batch_ladder = (8, 16, 32, 64, 128)
    srv = BatchingServer(rt, max_batch=32, max_rows=256, max_wait_ms=1,
                         start_worker=False)
    rungs = srv._rungs(16)  # group limit = 32*128/16 = 256 > ladder top
    assert rungs[-1] >= srv._group_limit(((), 16))
    assert all(r % 8 == 0 for r in rungs)
    assert srv._pad_rows_for(16, 200) >= 200


def test_submit_durations_matches_served_audio(runtime):
    """Durations futures resolve to the plan the server's synthesis of the
    same request realizes (row-invariant seeded noise), batched with other
    duration requests on the same worker."""
    hop = runtime.hparams.hop_length
    with BatchingServer(runtime, max_batch=8, max_wait_ms=50) as server:
        d_futs = [server.submit_durations(FIXTURE_IDS),
                  server.submit_durations(FIXTURE_IDS[:6])]
        a_futs = [server.submit(FIXTURE_IDS), server.submit(FIXTURE_IDS[:6])]
        durs = [f.result(timeout=300) for f in d_futs]
        audios = [f.result(timeout=300) for f in a_futs]
    assert durs[0].shape == (len(FIXTURE_IDS),)
    assert durs[1].shape == (6,)
    assert int(durs[0].sum()) * hop == len(audios[0])
    assert int(durs[1].sum()) * hop == len(audios[1])
    m = server.metrics()
    assert m["completed"] == 4 and m["failed"] == 0


def test_submit_durations_validates(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=10) as server:
        with pytest.raises(ValueError):
            server.submit_durations([])
        with pytest.raises(ValueError):
            server.submit_durations([10 ** 9])
        with pytest.raises(ValueError):
            server.submit_durations(FIXTURE_IDS, speaker_id=5)


def test_multivoice_submit_durations(tiny_voice):
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    rts = {"a": PiperRuntime(*tiny_voice)}
    with MultiVoiceBatchingServer(rts, max_batch=4, max_wait_ms=10) as srv:
        d = srv.submit_durations("a", FIXTURE_IDS).result(timeout=300)
        a = srv.submit("a", FIXTURE_IDS).result(timeout=300)
    assert int(d.sum()) * rts["a"].hparams.hop_length == len(a)


def test_durations_groups_use_one_pinned_program(tiny_voice):
    """Every durations group of a phoneme bucket pads to ONE pinned row
    rung: varying traffic shapes reuse a single compiled encode program
    (a new row count would compile mid-serve and stall the worker), and
    prewarm compiles it up front."""
    rt = PiperRuntime(*tiny_voice)
    with BatchingServer(rt, max_batch=8, max_wait_ms=20) as server:
        server.prewarm(p_buckets=[16], calibrate=False)
        programs = set(rt._compiled_keys)
        # 1-request and 3-request durations groups: same program
        server.submit_durations(FIXTURE_IDS).result(timeout=300)
        futs = [server.submit_durations(FIXTURE_IDS[:k]) for k in (6, 8, 10)]
        durs = [f.result(timeout=300) for f in futs]
        assert [len(d) for d in durs] == [6, 8, 10]
        new = {k for k in rt._compiled_keys - programs if k[0] == "enc_key"}
        assert new == set(), f"durations compiled mid-traffic: {new}"
    # correctness under the pinned padding: matches the direct call
    direct = rt.phoneme_durations([FIXTURE_IDS[:6]])[0]
    np.testing.assert_array_equal(durs[0], direct)
