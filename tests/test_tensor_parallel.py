"""Tensor-parallel (tp) decode tests on the virtual CPU mesh.

tp is weight-sharding only (parallel/tp.py): the model code is unchanged and
GSPMD inserts the collectives, so the defining property to test is exactness
against the replicated single-device run — same seeds, same audio (up to
reduction-order fp noise from the row-parallel psums).
"""

import numpy as np
import pytest

from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params
from piper_tpu.parallel.mesh import TENSOR_AXIS, make_mesh
from piper_tpu.parallel.serving import ShardedVits
from piper_tpu.parallel.tp import _spec_for, tp_param_shardings

TINY = VitsHParams(
    n_vocab=40,
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=1,
    dp_filter_channels=16,
    dp_n_flows=2,
    flow_n_flows=1,
    flow_hidden_channels=16,
    flow_n_layers=1,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[4, 2],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[8, 4],
)

TINY_MULTI = VitsHParams(
    **{**TINY.__dict__, "n_speakers": 4, "gin_channels": 8}
)


def _synthesize(mesh, hp, *, b, p, sid=None, seed=11):
    params = params_from_arrays(synthetic_params(hp, seed=3))
    sharded = ShardedVits.create(mesh, params, hp)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, hp.n_vocab, size=(b, p))
    lengths = np.full((b,), p, np.int32)
    return sharded.synthesize_batch(
        ids, lengths, max_frames=24, sid=sid, seed=seed
    )


def test_tp_specs_shard_the_expected_axes():
    hp = TINY_MULTI
    params = params_from_arrays(synthetic_params(hp, seed=0))
    mesh = make_mesh(8, tensor_parallel=2)
    shardings = tp_param_shardings(params, mesh)
    assert set(shardings) == set(params)

    def spec(name):
        return tuple(shardings[name].spec)

    # Column-parallel: output channels sharded (weight axis 0, bias axis 0).
    assert spec("dec.conv_pre.weight")[0] == TENSOR_AXIS
    assert spec("dec.conv_pre.bias")[0] == TENSOR_AXIS
    assert spec("dec.cond.weight")[0] == TENSOR_AXIS
    # conv_transpose layout (C_in, C_out, K): column on axis 1.
    assert spec("dec.ups.0.weight")[1] == TENSOR_AXIS
    assert spec("dec.ups.0.bias")[0] == TENSOR_AXIS
    # ResBlock1 pair: convs1 column, convs2 row with replicated bias.
    assert spec("dec.resblocks.0.convs1.0.weight")[0] == TENSOR_AXIS
    assert spec("dec.resblocks.0.convs2.0.weight")[1] == TENSOR_AXIS
    assert spec("dec.resblocks.0.convs2.0.bias") == ()
    # conv_post reduces channels away: row-parallel.
    assert spec("dec.conv_post.weight")[1] == TENSOR_AXIS
    # Flow WaveNet: in_layers column / res_skip row.
    assert spec("flow.flows.0.enc.in_layers.0.weight")[0] == TENSOR_AXIS
    assert spec("flow.flows.0.enc.res_skip_layers.0.weight")[1] == TENSOR_AXIS
    # Encoder stays replicated.
    assert all(
        all(ax is None for ax in tuple(shardings[n].spec))
        for n in params
        if n.startswith("enc_p.")
    )


def test_tp_spec_falls_back_to_replicated_when_not_divisible():
    # 3 output channels with tp=2: must replicate, not error.
    assert _spec_for("dec.conv_pre.weight", (3, 16, 7), 2) == ()
    assert _spec_for("dec.conv_pre.bias", (3,), 2) == ()
    # conv_post weight's C_out is 1 — axis 0 is never sharded anyway.
    assert _spec_for("dec.conv_post.weight", (1, 15, 7), 2) == ()


@pytest.mark.slow
def test_tp_infer_matches_replicated():
    ref_audio, ref_len = _synthesize(make_mesh(1), TINY, b=2, p=10)
    audio, y_len = _synthesize(make_mesh(4, tensor_parallel=4), TINY, b=2, p=10)
    assert (y_len == ref_len).all()
    np.testing.assert_allclose(audio, ref_audio, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_tp_composes_with_dp():
    ref_audio, ref_len = _synthesize(make_mesh(1), TINY, b=4, p=10)
    audio, y_len = _synthesize(
        make_mesh(8, tensor_parallel=2), TINY, b=4, p=10
    )  # dp=4, tp=2
    assert (y_len == ref_len).all()
    np.testing.assert_allclose(audio, ref_audio, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_tp_multispeaker_matches_replicated():
    sid = np.array([1, 3], np.int32)
    ref_audio, ref_len = _synthesize(make_mesh(1), TINY_MULTI, b=2, p=8, sid=sid)
    audio, y_len = _synthesize(
        make_mesh(4, tensor_parallel=2), TINY_MULTI, b=2, p=8, sid=sid
    )  # dp=2, tp=2
    assert (y_len == ref_len).all()
    np.testing.assert_allclose(audio, ref_audio, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_tp_runtime_serving_matches_single_device(tiny_voice):
    """A PiperRuntime on a dp x tp mesh serves the SAME stack (fused dispatch,
    BatchingServer) and its audio matches the single-device runtime exactly:
    seeded noise is row-invariant, so only GSPMD reduction order differs."""
    from piper_tpu.engine.batcher import BatchingServer
    from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

    from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIX

    single = PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"))
    rt = PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="fused"),
                      mesh=make_mesh(8, tensor_parallel=2))
    assert rt._tp_size == 2 and rt._dp_size == 4
    # tp-sharded weight actually sharded, not replicated.
    w = rt.params["dec.conv_pre.weight"]
    assert not w.sharding.is_fully_replicated
    ref = single.synthesize(FIX, seed=5)
    a = rt.synthesize(FIX, seed=5)
    np.testing.assert_allclose(a, ref, atol=2e-5, rtol=0)
    # Served audio depends on the (seed, f_bucket) realization the scheduler
    # picks, so the exactness oracle is the SAME server config on the
    # single-device runtime (row-invariant noise makes row rungs moot).
    def serve(runtime):
        with BatchingServer(runtime, max_batch=8, max_wait_ms=20) as server:
            futs = [server.submit(FIX) for _ in range(5)]
            futs += [server.submit(FIX[:6]) for _ in range(3)]
            out = [f.result(timeout=600) for f in futs]
        m = server.metrics()
        assert m["completed"] == 8 and m["failed"] == 0
        return out

    audios = serve(rt)
    ref_audios = serve(single)
    assert all(np.isfinite(x).all() and len(x) > 0 for x in audios)
    for got, want in zip(audios, ref_audios):
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_tp_rejects_sp_decode():
    params = params_from_arrays(synthetic_params(TINY, seed=3))
    sharded = ShardedVits.create(
        make_mesh(4, tensor_parallel=2), params, TINY
    )
    with pytest.raises(NotImplementedError):
        sharded.sp_decode_fn(span=16)
    # synthesize_long must fail up front too — not after compiling the
    # encoder just to hit sp_decode_fn's raise.
    with pytest.raises(NotImplementedError):
        sharded.synthesize_long(
            np.zeros((1, 8), np.int32), np.full((1,), 8, np.int32), span=16
        )


def test_tp_rejects_explicit_pallas(tiny_voice):
    """use_pallas=True contradicts tp (single-device Pallas programs can't be
    GSPMD-partitioned): both serving surfaces raise instead of silently
    measuring XLA's lowering."""
    from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

    params = params_from_arrays(synthetic_params(TINY, seed=3))
    mesh = make_mesh(4, tensor_parallel=2)
    with pytest.raises(ValueError, match="use_pallas"):
        ShardedVits.create(mesh, params, TINY, use_pallas=True)
    with pytest.raises(ValueError, match="use_pallas"):
        PiperRuntime(*tiny_voice, options=RuntimeOptions(use_pallas=True),
                     mesh=make_mesh(8, tensor_parallel=2))
