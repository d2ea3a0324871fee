"""JAX-vs-torch-oracle parity tests for every VITS module and the full graph.

The torch oracle (tests/oracle/vits_torch.py) is an independent implementation
using torch.nn.functional primitives; agreement within float tolerance on
random weights validates the JAX modules the same way the reference validates
Metal kernels against its CPUBackend (SURVEY.md §4).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.models.vits.duration_predictor import stochastic_duration_predictor_reverse
from piper_tpu.models.vits.flows import flow_reverse
from piper_tpu.models.vits.hifigan import hifigan_generator
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.model import infer
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params
from piper_tpu.models.vits.text_encoder import text_encoder
from piper_tpu.ops.masking import generate_path, sequence_mask

from oracle import vits_torch as oracle

SMALL = VitsHParams(
    n_vocab=40,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    window_size=4,
    dp_filter_channels=32,
    dp_n_flows=2,
    flow_n_flows=2,
    flow_hidden_channels=32,
    flow_n_layers=2,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[4, 4],
    upsample_initial_channel=64,
    upsample_kernel_sizes=[8, 8],
)

SMALL_MS = VitsHParams(
    **{
        **SMALL.__dict__,
        "n_speakers": 4,
        "gin_channels": 16,
    }
)

# The high-preset ARCHITECTURE (5-level upsample stack, 3 resblock kernel
# sets — hparams.py PRESETS["high"]) at test-sized channels: exercises the
# deeper-stack branch end to end against the oracle.
SMALL_HIGH = VitsHParams(
    **{
        **SMALL.__dict__,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3,
        "upsample_rates": [8, 4, 2, 2, 2],
        "upsample_kernel_sizes": [16, 8, 4, 4, 4],
        "upsample_initial_channel": 128,
    }
)


@pytest.fixture(scope="module")
def weights():
    return synthetic_params(SMALL, seed=7)


@pytest.fixture(scope="module")
def jparams(weights):
    return params_from_arrays(weights)


def _ids(rng, b, p, n_vocab):
    return rng.integers(0, n_vocab, size=(b, p))


def test_text_encoder_parity(weights, jparams):
    rng = np.random.default_rng(0)
    ids = _ids(rng, 2, 12, SMALL.n_vocab)
    lengths = np.array([12, 9])
    x_j, m_j, logs_j, mask_j = text_encoder(
        jnp.asarray(ids), jnp.asarray(lengths), jparams, SMALL
    )
    with torch.no_grad():
        x_t, m_t, logs_t, mask_t = oracle.text_encoder(
            torch.as_tensor(ids), torch.as_tensor(lengths), weights, SMALL
        )
    np.testing.assert_allclose(np.asarray(mask_j), mask_t.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logs_j), logs_t.numpy(), atol=2e-5)


def test_text_encoder_short_sequence(weights, jparams):
    # P < window_size + 1 exercises the other relative-embedding branch.
    rng = np.random.default_rng(1)
    ids = _ids(rng, 1, 3, SMALL.n_vocab)
    lengths = np.array([3])
    x_j, *_ = text_encoder(jnp.asarray(ids), jnp.asarray(lengths), jparams, SMALL)
    with torch.no_grad():
        x_t, *_ = oracle.text_encoder(
            torch.as_tensor(ids), torch.as_tensor(lengths), weights, SMALL
        )
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy(), atol=2e-5)


def test_sdp_reverse_parity(weights, jparams):
    rng = np.random.default_rng(2)
    b, p = 2, 12
    x = rng.standard_normal((b, SMALL.hidden_channels, p)).astype(np.float32)
    lengths = np.array([12, 7])
    mask = np.asarray(sequence_mask(jnp.asarray(lengths), p))
    noise = rng.standard_normal((b, 2, p)).astype(np.float32)
    logw_j = stochastic_duration_predictor_reverse(
        jnp.asarray(x), jnp.asarray(mask), jnp.asarray(noise), jparams, SMALL, noise_scale=0.8
    )
    with torch.no_grad():
        logw_t = oracle.sdp_reverse(
            torch.as_tensor(x), torch.as_tensor(mask), torch.as_tensor(noise),
            weights, SMALL, noise_scale=0.8,
        )
    np.testing.assert_allclose(np.asarray(logw_j), logw_t.numpy(), atol=5e-5)


def test_flow_reverse_parity(weights, jparams):
    rng = np.random.default_rng(3)
    b, t = 2, 20
    z_p = rng.standard_normal((b, SMALL.inter_channels, t)).astype(np.float32)
    lengths = np.array([20, 13])
    mask = np.asarray(sequence_mask(jnp.asarray(lengths), t))
    z_j = flow_reverse(jnp.asarray(z_p), jnp.asarray(mask), jparams, SMALL)
    with torch.no_grad():
        z_t = oracle.flow_reverse(
            torch.as_tensor(z_p), torch.as_tensor(mask), weights, SMALL
        )
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=2e-5)


def test_hifigan_parity(weights, jparams):
    rng = np.random.default_rng(4)
    b, t = 2, 16
    z = rng.standard_normal((b, SMALL.inter_channels, t)).astype(np.float32)
    a_j = hifigan_generator(jnp.asarray(z), jparams, SMALL)
    with torch.no_grad():
        a_t = oracle.hifigan(torch.as_tensor(z), weights, SMALL)
    assert a_j.shape == (b, 1, t * SMALL.hop_length)
    np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=2e-5)


def test_generate_path_parity():
    rng = np.random.default_rng(5)
    b, p, t = 2, 6, 24
    w_ceil = rng.integers(0, 5, size=(b, p)).astype(np.float32)
    x_len = np.array([6, 4])
    x_mask = np.asarray(sequence_mask(jnp.asarray(x_len), p))
    w_ceil = w_ceil * x_mask[:, 0]
    y_len = np.clip(w_ceil.sum(-1), 1, t)
    y_mask = np.asarray(sequence_mask(jnp.asarray(y_len.astype(np.int32)), t))
    path_j = generate_path(jnp.asarray(w_ceil), jnp.asarray(x_mask), jnp.asarray(y_mask))
    with torch.no_grad():
        path_t = oracle.generate_path(
            torch.as_tensor(w_ceil), torch.as_tensor(x_mask), torch.as_tensor(y_mask)
        )
    np.testing.assert_array_equal(np.asarray(path_j), path_t.numpy())
    # Each valid frame maps to exactly one phoneme.
    sums = np.asarray(path_j).sum(-1)
    for bi in range(b):
        valid = int(y_len[bi])
        assert (sums[bi, :valid] == 1).all()
        assert (sums[bi, valid:] == 0).all()


def test_full_infer_parity(weights, jparams):
    rng = np.random.default_rng(6)
    b, p, max_frames = 2, 14, 64
    ids = _ids(rng, b, p, SMALL.n_vocab)
    lengths = np.array([14, 10])
    dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
    main_noise = rng.standard_normal((b, SMALL.inter_channels, max_frames)).astype(np.float32)

    audio_j, ylen_j = infer(
        jparams, SMALL, jnp.asarray(ids), jnp.asarray(lengths),
        jnp.asarray(dp_noise), jnp.asarray(main_noise), max_frames=max_frames,
    )
    with torch.no_grad():
        audio_t, ylen_t = oracle.infer(
            weights, SMALL, ids, lengths, dp_noise, main_noise, max_frames=max_frames
        )
    np.testing.assert_array_equal(np.asarray(ylen_j), ylen_t)
    assert np.isfinite(np.asarray(audio_j)).all()
    np.testing.assert_allclose(np.asarray(audio_j), audio_t, atol=1e-4)
    # Max-abs criterion from BASELINE.json (<= 1e-3 vs reference).
    assert np.max(np.abs(np.asarray(audio_j) - audio_t)) <= 1e-3


@pytest.mark.slow
def test_full_infer_high_architecture_parity():
    """Full graph parity on the high-preset architecture (deeper 5-level
    upsample stack, BASELINE.json config #4)."""
    weights_h = synthetic_params(SMALL_HIGH, seed=12)
    jparams_h = params_from_arrays(weights_h)
    rng = np.random.default_rng(13)
    b, p, max_frames = 2, 10, 32
    ids = _ids(rng, b, p, SMALL_HIGH.n_vocab)
    lengths = np.array([10, 8])
    dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
    main_noise = rng.standard_normal(
        (b, SMALL_HIGH.inter_channels, max_frames)
    ).astype(np.float32)
    audio_j, ylen_j = infer(
        jparams_h, SMALL_HIGH, jnp.asarray(ids), jnp.asarray(lengths),
        jnp.asarray(dp_noise), jnp.asarray(main_noise), max_frames=max_frames,
    )
    with torch.no_grad():
        audio_t, ylen_t = oracle.infer(
            weights_h, SMALL_HIGH, ids, lengths, dp_noise, main_noise,
            max_frames=max_frames,
        )
    assert SMALL_HIGH.hop_length == 256
    assert audio_j.shape == (b, max_frames * 256)
    np.testing.assert_array_equal(np.asarray(ylen_j), ylen_t)
    np.testing.assert_allclose(np.asarray(audio_j), audio_t, atol=1e-4)
    assert np.max(np.abs(np.asarray(audio_j) - audio_t)) <= 1e-3


@pytest.mark.slow
def test_full_infer_multispeaker_parity():
    weights_ms = synthetic_params(SMALL_MS, seed=11)
    jparams_ms = params_from_arrays(weights_ms)
    rng = np.random.default_rng(8)
    b, p, max_frames = 2, 10, 48
    ids = _ids(rng, b, p, SMALL_MS.n_vocab)
    lengths = np.array([10, 10])
    sid = np.array([1, 3])
    dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
    main_noise = rng.standard_normal((b, SMALL_MS.inter_channels, max_frames)).astype(
        np.float32
    )
    audio_j, ylen_j = infer(
        jparams_ms, SMALL_MS, jnp.asarray(ids), jnp.asarray(lengths),
        jnp.asarray(dp_noise), jnp.asarray(main_noise),
        max_frames=max_frames, sid=jnp.asarray(sid),
    )
    with torch.no_grad():
        audio_t, ylen_t = oracle.infer(
            weights_ms, SMALL_MS, ids, lengths, dp_noise, main_noise,
            max_frames=max_frames, sid=sid,
        )
    np.testing.assert_array_equal(np.asarray(ylen_j), ylen_t)
    np.testing.assert_allclose(np.asarray(audio_j), audio_t, atol=1e-4)


def test_padding_invariance(weights, jparams):
    """Padding the phoneme axis must not change the audible samples."""
    rng = np.random.default_rng(9)
    p, p_padded, max_frames = 8, 16, 48
    ids = _ids(rng, 1, p, SMALL.n_vocab)
    ids_padded = np.concatenate([ids, np.zeros((1, p_padded - p), np.int64)], axis=1)
    lengths = np.array([p])
    dp_noise = rng.standard_normal((1, 2, p)).astype(np.float32)
    dp_noise_padded = np.concatenate(
        [dp_noise, rng.standard_normal((1, 2, p_padded - p)).astype(np.float32)], axis=2
    )
    main_noise = rng.standard_normal((1, SMALL.inter_channels, max_frames)).astype(np.float32)

    a1, y1 = infer(jparams, SMALL, jnp.asarray(ids), jnp.asarray(lengths),
                   jnp.asarray(dp_noise), jnp.asarray(main_noise), max_frames=max_frames)
    a2, y2 = infer(jparams, SMALL, jnp.asarray(ids_padded), jnp.asarray(lengths),
                   jnp.asarray(dp_noise_padded), jnp.asarray(main_noise),
                   max_frames=max_frames)
    assert int(y1[0]) == int(y2[0])
    n = int(y1[0]) * SMALL.hop_length
    np.testing.assert_allclose(np.asarray(a1)[0, :n], np.asarray(a2)[0, :n], atol=1e-5)
