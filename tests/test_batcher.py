"""Continuous-batching server tests."""

import time

import numpy as np
import pytest

from piper_tpu.engine.batcher import BatchingServer
from piper_tpu.engine.runtime import PiperRuntime

FIXTURE_IDS = [1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2]


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
    # Each batch row draws independent prior noise: same utterance, same
    # group, but (stochastically) distinct samples.
    if audios[0].shape == audios[1].shape:
        assert not np.array_equal(audios[0], audios[1])


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
    srv.phoneme_budget = 4 * 128
    srv.max_wait_s = 0.0
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
