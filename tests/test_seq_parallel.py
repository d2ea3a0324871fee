"""Sequence-parallel (sp) decode tests on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piper_tpu.models.vits.hparams import VitsHParams, receptive_field_frames
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params
from piper_tpu.parallel.mesh import make_mesh
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
    resblock_dilation_sizes=[[1]],
    upsample_rates=[4],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[8],
)


@pytest.mark.slow
def test_sp_decode_matches_single_device_windows():
    """sp-sharded decode must equal the same windowed decode run serially."""
    mesh = make_mesh(4, seq_parallel=4)  # dp=1, sp=4
    weights = synthetic_params(TINY, seed=17)
    params = params_from_arrays(weights)
    sharded = ShardedVits.create(mesh, params, TINY)

    rng = np.random.default_rng(0)
    b, p, span = 2, 10, 16
    ids = rng.integers(0, TINY.n_vocab, size=(b, p))
    lengths = np.full((b,), p)
    audio, y_len = sharded.synthesize_long(
        ids, lengths, span=span, seed=77
    )
    n_sp = 4
    assert audio.shape == (b, n_sp * span * TINY.hop_length)
    assert np.isfinite(audio).all()

    # Serial reference: run the same decode_window per shard offset on one
    # device with the same per-frame noise derivation.
    from piper_tpu.models.vits import model as vits

    halo = receptive_field_frames(TINY)
    window = span + 2 * halo
    total = n_sp * span
    base_enc = jax.random.fold_in(jax.random.PRNGKey(jnp.uint32(77)), 0)
    # Same row-invariant derivation synthesize_long uses: one (2, P) draw
    # broadcast over the batch.
    dp_noise = jnp.broadcast_to(jax.random.normal(base_enc, (2, p)),
                                (b, 2, p))
    enc = vits.encode(params, TINY, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(lengths, jnp.int32), dp_noise)
    base = jax.random.fold_in(jax.random.PRNGKey(jnp.uint32(77)), 1)
    pieces = []
    for k in range(n_sp):
        t_offset = k * span - halo
        t_idx = t_offset + jnp.arange(window)
        noise = vits.per_frame_noise(base, t_idx, b, TINY.inter_channels)
        aw = vits.decode_window(params, TINY, enc, noise, jnp.int32(t_offset),
                                window=window, total_frames=jnp.int32(total))
        h = TINY.hop_length
        pieces.append(np.asarray(aw)[:, halo * h : (halo + span) * h])
    ref = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(audio, ref, atol=1e-5)


def test_sp_dp_combined_mesh_still_works():
    mesh = make_mesh(8, seq_parallel=2)  # dp=4, sp=2
    weights = synthetic_params(TINY, seed=18)
    sharded = ShardedVits.create(mesh, params_from_arrays(weights), TINY)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.n_vocab, size=(1, 8))
    audio, y_len = sharded.synthesize_long(ids, np.array([8]), span=8, seed=3)
    assert audio.shape == (1, 2 * 8 * TINY.hop_length)
    assert np.isfinite(audio).all()
