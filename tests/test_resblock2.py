"""ResBlock2-style vocoder (low/x_low quality voices) parity + load path."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.hifigan import hifigan_generator
from piper_tpu.models.vits.hparams import PRESETS, VitsHParams, derive_hparams
from piper_tpu.models.vits.model import infer
from piper_tpu.models.vits.params import params_from_arrays, params_from_graph
from piper_tpu.models.vits.synthetic import make_synthetic_voice, synthetic_params
from piper_tpu.onnx import load_model

from oracle import vits_torch as oracle

SMALL_RB2 = VitsHParams(
    n_vocab=40,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=1,
    dp_filter_channels=32,
    dp_n_flows=2,
    flow_n_flows=1,
    flow_hidden_channels=32,
    flow_n_layers=2,
    resblock="2",
    resblock_kernel_sizes=[3, 5],
    resblock_dilation_sizes=[[1, 2], [2, 6]],
    upsample_rates=[4, 4],
    upsample_initial_channel=64,
    upsample_kernel_sizes=[8, 8],
)

FIXTURE_IDS = [1, 20, 0, 30, 0, 2]


def test_resblock2_hifigan_parity():
    weights = synthetic_params(SMALL_RB2, seed=23)
    jparams = params_from_arrays(weights)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, SMALL_RB2.inter_channels, 16)).astype(np.float32)
    a_j = hifigan_generator(jnp.asarray(z), jparams, SMALL_RB2)
    with torch.no_grad():
        a_t = oracle.hifigan(torch.as_tensor(z), weights, SMALL_RB2)
    np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=2e-5)


@pytest.mark.slow
def test_resblock2_full_infer_parity():
    weights = synthetic_params(SMALL_RB2, seed=24)
    jparams = params_from_arrays(weights)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, SMALL_RB2.n_vocab, size=(1, 8))
    dp_noise = rng.standard_normal((1, 2, 8)).astype(np.float32)
    main_noise = rng.standard_normal((1, SMALL_RB2.inter_channels, 32)).astype(np.float32)
    a_j, y_j = infer(jparams, SMALL_RB2, jnp.asarray(ids), jnp.asarray([8]),
                     jnp.asarray(dp_noise), jnp.asarray(main_noise), max_frames=32)
    with torch.no_grad():
        a_t, y_t = oracle.infer(weights, SMALL_RB2, ids, np.asarray([8]),
                                dp_noise, main_noise, max_frames=32)
    np.testing.assert_array_equal(np.asarray(y_j), y_t)
    np.testing.assert_allclose(np.asarray(a_j), a_t, atol=1e-4)


def test_x_low_preset_is_resblock2_and_derives(tmp_path):
    """The x_low preset now mirrors real Piper low-quality voices (ResBlock2,
    kernels [3,5,7], dilations [[1,2],[2,6],[3,12]]); the checkpoint must
    round-trip through derivation."""
    model_path, config_path = make_synthetic_voice(tmp_path, quality="x_low", seed=25)
    m = load_model(model_path)
    hp = derive_hparams(m.graph, sample_rate=16000)
    assert hp.resblock == "2"
    assert hp.resblock_kernel_sizes == [3, 5, 7]
    assert hp.resblock_dilation_sizes == [[1, 2], [2, 6], [3, 12]]
    assert hp.upsample_rates == [8, 8, 4]

    rt = PiperRuntime(model_path, config_path)
    audio = rt.synthesize(FIXTURE_IDS)
    assert len(audio) > 0 and np.isfinite(audio).all()
