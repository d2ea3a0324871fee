"""Pipeline-parallel (pp) decode tests on the virtual CPU mesh.

The pp path (parallel/pp.py) is hand-scheduled SPMD (shard_map + ppermute +
lax.scan), so exactness against the single-device decode is the whole test:
any stage-boundary, mask-reconstruction, or schedule bug shows up as a
numeric mismatch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.models.vits import model as vits
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params
from piper_tpu.parallel.mesh import make_mesh
from piper_tpu.parallel.pp import (
    balanced_cuts,
    build_pp_decode,
    default_microbatches,
    pp_decode,
    unit_flops,
)
from piper_tpu.parallel.serving import ShardedVits

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
    resblock_dilation_sizes=[[1, 2]],
    upsample_rates=[4, 2],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[8, 4],
)

import dataclasses

TINY_MS = dataclasses.replace(TINY, n_speakers=3, gin_channels=8)


def _encode_and_reference(hp, b=4, p=8, max_frames=16, seed=0, sid=None):
    params = params_from_arrays(synthetic_params(hp, seed=11))
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, hp.n_vocab, size=(b, p)), jnp.int32)
    lengths = jnp.asarray(np.full((b,), p, np.int32))
    dpn = jnp.asarray(rng.standard_normal((b, 2, p)).astype(np.float32))
    mn = jnp.asarray(
        rng.standard_normal((b, hp.inter_channels, max_frames)).astype(
            np.float32))
    sid_j = jnp.asarray(sid, jnp.int32) if sid is not None else None
    with jax.default_matmul_precision("highest"):
        enc = jax.jit(
            lambda pa, i, l, d, s: vits.encode(pa, hp, i, l, d, sid=s)
        )(params, ids, lengths, dpn, sid_j)
        audio, ylen = jax.jit(
            lambda pa, e, n: vits.decode(pa, hp, e, n, max_frames=max_frames)
        )(params, enc, mn)
    return params, enc, mn, np.asarray(audio), np.asarray(ylen)


def test_balanced_cuts_properties():
    # 6 units (front + 4 levels + post) split 3 ways: contiguous, covering,
    # and no better contiguous split exists (checked exhaustively here too).
    costs = [5.0, 3.0, 8.0, 8.0, 2.0, 1.0]
    cuts = balanced_cuts(costs, 3)
    assert cuts[0] == 0 and cuts[-1] == len(costs) and sorted(cuts) == cuts
    worst = max(sum(costs[cuts[s]: cuts[s + 1]]) for s in range(3))
    assert worst == 11.0  # e.g. [5,3][8][8,2,1] — no split beats max=11

    with pytest.raises(ValueError):
        balanced_cuts([1.0, 2.0], 3)

    # The real cost model orders the heavy units where the FLOPs are: the
    # flows+conv_pre front and the wide early levels dominate post.
    fl = unit_flops(TINY, 16)
    assert len(fl) == 2 + TINY.num_upsamples
    assert fl[-1] == min(fl)


def test_default_microbatches():
    assert default_microbatches(8, 2) == 4
    assert default_microbatches(8, 4) == 8
    assert default_microbatches(6, 4) == 6
    assert default_microbatches(1, 4) == 1
    assert default_microbatches(7, 2) == 1  # prime rows: no divisor <= 2*S


def test_pp_rejects_bad_meshes():
    params = params_from_arrays(synthetic_params(TINY, seed=11))
    mesh_sp = make_mesh(4, seq_parallel=2, pipeline_parallel=2)
    with pytest.raises(NotImplementedError):
        build_pp_decode(mesh_sp, TINY, max_frames=16, rows_per_dp=4,
                        with_g=False)
    mesh_dp = make_mesh(4)
    with pytest.raises(ValueError):
        build_pp_decode(mesh_dp, TINY, max_frames=16, rows_per_dp=4,
                        with_g=False)
    sv = ShardedVits.create(make_mesh(4, tensor_parallel=2), params, TINY)
    with pytest.raises(NotImplementedError):
        sv.pp_decode_fn(16, 4)
    # More stages than units (TINY has 4 units).
    with pytest.raises(ValueError):
        build_pp_decode(make_mesh(8, pipeline_parallel=8), TINY,
                        max_frames=16, rows_per_dp=8, with_g=False)
    # Rows not divisible by the microbatch count.
    with pytest.raises(ValueError):
        build_pp_decode(make_mesh(2, pipeline_parallel=2), TINY,
                        max_frames=16, rows_per_dp=4, with_g=False,
                        microbatches=3)


@pytest.mark.slow
def test_pp_matches_single_device_decode():
    params, enc, mn, ref_audio, ref_ylen = _encode_and_reference(TINY)
    mesh = make_mesh(2, pipeline_parallel=2)
    audio, ylen = pp_decode(params, TINY, enc, mn, mesh=mesh, max_frames=16)
    np.testing.assert_allclose(np.asarray(audio), ref_audio, atol=2e-5,
                               rtol=0)
    np.testing.assert_array_equal(np.asarray(ylen), ref_ylen)


@pytest.mark.slow
def test_pp_microbatch_count_is_invisible():
    # The schedule (M=1 vs M=4) must not change the audio: microbatching is
    # a pure row split, convs are row-independent.
    params, enc, mn, ref_audio, _ = _encode_and_reference(TINY)
    mesh = make_mesh(2, pipeline_parallel=2)
    a1, _ = pp_decode(params, TINY, enc, mn, mesh=mesh, max_frames=16,
                      microbatches=1)
    a4, _ = pp_decode(params, TINY, enc, mn, mesh=mesh, max_frames=16,
                      microbatches=4)
    np.testing.assert_allclose(np.asarray(a1), ref_audio, atol=2e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a4))


@pytest.mark.slow
def test_pp_composes_with_dp():
    # dp=2 x pp=2 over 4 devices through the ShardedVits surface, against
    # the dp-fused program with the identical noise derivation.
    params = params_from_arrays(synthetic_params(TINY, seed=11))
    rng = np.random.default_rng(3)
    b, p, F = 4, 8, 16
    ids = rng.integers(0, TINY.n_vocab, size=(b, p))
    lengths = np.full((b,), p, np.int32)
    sv_pp = ShardedVits.create(make_mesh(4, pipeline_parallel=2), params, TINY)
    a_pp, l_pp = sv_pp.synthesize_pipelined(ids, lengths, max_frames=F)
    sv_dp = ShardedVits.create(make_mesh(4), params, TINY)
    a_dp, l_dp = sv_dp.synthesize_batch(ids, lengths, max_frames=F)
    np.testing.assert_allclose(a_pp, a_dp, atol=2e-5, rtol=0)
    np.testing.assert_array_equal(l_pp.astype(np.int64), l_dp.astype(np.int64))


@pytest.mark.slow
def test_pp_multispeaker():
    # The speaker embedding rides only into stage 0 (flows + cond); a
    # 4-stage pipeline on the multispeaker tiny voice must match the
    # single-device decode per speaker id.
    sid = np.array([0, 1, 2, 1], np.int32)
    params, enc, mn, ref_audio, ref_ylen = _encode_and_reference(
        TINY_MS, sid=sid)
    mesh = make_mesh(4, pipeline_parallel=4)
    audio, ylen = pp_decode(params, TINY_MS, enc, mn, mesh=mesh,
                            max_frames=16)
    np.testing.assert_allclose(np.asarray(audio), ref_audio, atol=2e-5,
                               rtol=0)
    np.testing.assert_array_equal(np.asarray(ylen), ref_ylen)


def test_pp_mesh_guards_on_whole_graph_paths():
    # ShardedVits on a pp mesh must refuse the whole-graph programs (they
    # would run replicated across pp — correct output, idle devices) and
    # point at synthesize_pipelined instead (advisor r3).
    params = params_from_arrays(synthetic_params(TINY, seed=11))
    sv = ShardedVits.create(make_mesh(4, pipeline_parallel=2), params, TINY)
    with pytest.raises(NotImplementedError, match="synthesize_pipelined"):
        sv.infer_fn(16)
    with pytest.raises(NotImplementedError, match="synthesize_pipelined"):
        sv.sp_decode_fn(8)
    with pytest.raises(NotImplementedError, match="synthesize_pipelined"):
        sv.synthesize_batch(
            np.zeros((4, 8), np.int32), np.full((4,), 8, np.int32),
            max_frames=16)


def test_pp_decode_fn_cache_resolves_default_microbatches():
    # microbatches=None and the explicit resolved default must share ONE
    # compiled program (advisor r3: the key used to store None verbatim).
    from piper_tpu.parallel.pp import default_microbatches

    params = params_from_arrays(synthetic_params(TINY, seed=11))
    sv = ShardedVits.create(make_mesh(2, pipeline_parallel=2), params, TINY)
    rows = 4
    m = default_microbatches(rows, 2)
    fn_default = sv.pp_decode_fn(16, rows)
    fn_explicit = sv.pp_decode_fn(16, rows, microbatches=m)
    assert fn_default is fn_explicit
    assert len(sv._pp_decode_fns) == 1


def test_encode_fn_is_cached_across_calls():
    # synthesize_pipelined / synthesize_long must reuse one jitted encoder
    # per (length_scale, noise_w, keyed) instead of retracing per call
    # (advisor r3).
    params = params_from_arrays(synthetic_params(TINY, seed=11))
    sv = ShardedVits.create(make_mesh(2, pipeline_parallel=2), params, TINY)
    assert sv.encode_fn(1.0, 0.8) is sv.encode_fn(1.0, 0.8)
    assert sv.encode_fn(1.0, 0.8, keyed=True) is sv.encode_fn(
        1.0, 0.8, keyed=True)
    assert sv.encode_fn(1.0, 0.8) is not sv.encode_fn(1.1, 0.8)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, TINY.n_vocab, size=(2, 8))
    lengths = np.full((2,), 8, np.int32)
    n_before = len(sv._enc_fns)
    sv.synthesize_pipelined(ids, lengths, max_frames=16)
    sv.synthesize_pipelined(ids, lengths, max_frames=16)
    # Default scales (ls=1.0, nw=0.8) hit the entry warmed above — repeated
    # serving adds no new traces.
    assert len(sv._enc_fns) == n_before
