"""Multi-chip serving through the SAME stack as single-chip: a PiperRuntime
built on a dp mesh drives BatchingServer / dispatch paths with rows sharded
over devices (SURVEY.md §2.9 — batched *serving* across a slice, not just a
sharded forward function)."""

import jax
import numpy as np
import pytest

from piper_tpu.engine.batcher import BatchingServer
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
from piper_tpu.parallel.mesh import make_mesh

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh_runtime(tiny_voice, mesh):
    return PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"),
                        mesh=mesh)


def test_runtime_rejects_pp_mesh(tiny_voice):
    # The runtime's whole-graph jits would run replicated (idle) across a
    # pp axis; pipelining is ShardedVits.synthesize_pipelined's job.
    with pytest.raises(NotImplementedError):
        PiperRuntime(*tiny_voice, mesh=make_mesh(4, pipeline_parallel=2))


def test_batch_ladder_is_dp_divisible(mesh_runtime):
    assert all(x % 8 == 0 for x in mesh_runtime.batch_ladder)
    assert mesh_runtime.batch_ladder[0] == 8


def test_params_replicated(mesh_runtime, mesh):
    w = next(iter(mesh_runtime.params.values()))
    assert w.sharding.is_fully_replicated
    assert set(w.sharding.device_set) == set(np.asarray(mesh.devices).ravel())


def test_single_utterance_on_mesh(mesh_runtime):
    audio = mesh_runtime.synthesize(FIXTURE_IDS)
    assert len(audio) > 0 and np.isfinite(audio).all()


def test_batch_shards_rows_over_dp(mesh_runtime):
    """A 3-row batch pads to the 8-rung and shards one row per device; the
    sliced results stay per-request exact lengths."""
    audios = mesh_runtime.synthesize_batch(
        [FIXTURE_IDS, FIXTURE_IDS[:6], FIXTURE_IDS * 2])
    assert len(audios) == 3
    assert len(audios[2]) > len(audios[1])
    for a in audios:
        assert np.isfinite(a).all()


def test_dispatch_fetch_fused_on_mesh(mesh_runtime):
    outs, meta = mesh_runtime.dispatch_batch(
        [FIXTURE_IDS, FIXTURE_IDS[:6]], fused=True)
    assert meta["fused_batch"]
    audios = mesh_runtime.fetch_batch(outs, meta)
    assert len(audios) == 2 and all(len(a) > 0 for a in audios)


def test_injected_noise_matches_single_device(tiny_voice, mesh):
    """The replicated injected-noise path is numerically the single-device
    computation — the fidelity/bisection contract survives the mesh."""
    rng = np.random.default_rng(7)
    p_bucket = 16
    dp_noise = rng.standard_normal((1, 2, p_bucket)).astype(np.float32)
    single = PiperRuntime(*tiny_voice)
    main_frames = 64
    main_noise = rng.standard_normal(
        (1, single.hparams.inter_channels, main_frames)).astype(np.float32)
    a_single = single.synthesize(FIXTURE_IDS, dp_noise=dp_noise,
                                 main_noise=main_noise)
    meshed = PiperRuntime(*tiny_voice, mesh=mesh)
    a_mesh = meshed.synthesize(FIXTURE_IDS, dp_noise=dp_noise,
                               main_noise=main_noise)
    assert a_single.shape == a_mesh.shape
    np.testing.assert_allclose(a_mesh, a_single, atol=1e-5, rtol=0)


def test_batching_server_over_mesh(mesh_runtime):
    """The continuous batcher — the same scheduler as single-chip — serves a
    mixed-length workload across the 8-device mesh."""
    with BatchingServer(mesh_runtime, max_batch=8, max_wait_ms=50) as server:
        assert server.fused
        futs = [server.submit(FIXTURE_IDS) for _ in range(10)]
        futs += [server.submit(FIXTURE_IDS[:6]) for _ in range(5)]
        futs += [server.submit(FIXTURE_IDS * 2) for _ in range(3)]
        audios = [f.result(timeout=600) for f in futs]
    assert len(audios) == 18
    assert all(len(a) > 0 and np.isfinite(a).all() for a in audios)
    m = server.metrics()
    assert m["completed"] == 18 and m["failed"] == 0


def test_streaming_on_mesh(mesh_runtime):
    chunks = list(mesh_runtime.synthesize_stream(FIXTURE_IDS * 2,
                                                 incremental=True))
    assert chunks[-1].is_final
    n = sum(len(c.samples) for c in chunks)
    assert n > 0


def test_stream_server_on_mesh(mesh_runtime):
    """Concurrent streams through StreamingServer on a mesh runtime match
    their solo mesh decodes (the multi-stream scheduler is mesh-agnostic:
    heads/windows ride the replicated dispatch paths)."""
    import threading

    from piper_tpu.engine.stream_server import StreamingServer

    srv = StreamingServer(mesh_runtime, emit_frames=16, c0=8,
                          row_rungs=(1, 2, 4), max_sessions=8)
    try:
        cases = [(FIXTURE_IDS * 2, 61), (FIXTURE_IDS, 62)]
        results = {}
        errors = []

        def run(i, ids, seed):
            try:
                chunks = list(srv.submit(ids, seed=seed))
                assert chunks[-1].is_final
                results[i] = np.concatenate([c.samples for c in chunks])
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=run, args=(i, ids, seed))
                   for i, (ids, seed) in enumerate(cases)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for i, (ids, seed) in enumerate(cases):
            ref = np.concatenate([
                c.samples
                for c in mesh_runtime.synthesize_stream_incremental(
                    ids, seed=seed)])
            assert len(results[i]) == len(ref)
            np.testing.assert_allclose(results[i], ref, atol=1e-5)
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_multivoice_batching_over_mesh(tiny_voice, mesh):
    """Two mesh runtimes (same dp mesh, independently replicated params)
    behind one MultiVoiceBatchingServer: multi-voice continuous batching and
    dp sharding compose — still one worker thread owning all device I/O."""
    from piper_tpu.engine.batcher import MultiVoiceBatchingServer

    rts = {
        "a": PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"),
                          mesh=mesh),
        "b": PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"),
                          mesh=mesh),
    }
    with MultiVoiceBatchingServer(rts, max_batch=8, max_wait_ms=30) as srv:
        futs = []
        for i in range(6):
            futs.append(srv.submit("a" if i % 2 else "b",
                                   FIXTURE_IDS[: 6 + i]))
        audios = [f.result(timeout=600) for f in futs]
    assert all(len(a) > 0 and np.isfinite(a).all() for a in audios)
    m = srv.metrics()
    assert m["a"]["rows"] == 3 and m["b"]["rows"] == 3


def test_phoneme_durations_on_mesh_snaps_pad_rows(mesh_runtime):
    """A pinned row count that isn't dp-divisible snaps UP inside
    phoneme_durations (review finding: callers shouldn't have to know the
    mesh to pin a durations program), and durations still match audio."""
    d = mesh_runtime.phoneme_durations([FIXTURE_IDS], pad_rows_to=3)[0]
    assert d.shape == (len(FIXTURE_IDS),)
    audio = mesh_runtime.synthesize(FIXTURE_IDS)
    assert int(d.sum()) * mesh_runtime.hparams.hop_length >= len(audio)
    # durations via the server path agree with the direct call
    with BatchingServer(mesh_runtime, max_batch=8, max_wait_ms=20) as server:
        d2 = server.submit_durations(FIXTURE_IDS).result(timeout=300)
    np.testing.assert_array_equal(d, d2)
