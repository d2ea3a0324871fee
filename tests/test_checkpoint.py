"""Checkpoint load path: synthetic ONNX -> hparams derivation -> params -> infer."""

import numpy as np
import pytest

import jax.numpy as jnp

from piper_tpu.core.config import VoiceConfig
from piper_tpu.models.vits.hparams import PRESETS, derive_hparams
from piper_tpu.models.vits.model import infer
from piper_tpu.models.vits.params import params_from_graph
from piper_tpu.models.vits.synthetic import make_synthetic_voice, synthetic_params
from piper_tpu.onnx import load_model


@pytest.fixture(scope="module")
def medium_voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("voice")
    return make_synthetic_voice(d, quality="medium", seed=3)


def test_hparams_derivation_medium(medium_voice):
    model_path, config_path = medium_voice
    cfg = VoiceConfig.load(config_path)
    m = load_model(model_path)
    hp = derive_hparams(m.graph, sample_rate=cfg.audio.sample_rate)
    expected = PRESETS["medium"]
    assert hp.hidden_channels == expected.hidden_channels == 192
    assert hp.filter_channels == expected.filter_channels == 768
    assert hp.n_layers == expected.n_layers == 6
    assert hp.n_heads == expected.n_heads == 2
    assert hp.window_size == 4
    assert hp.inter_channels == 192
    assert hp.dp_num_bins == 10
    assert hp.dp_n_flows == 4
    assert hp.flow_n_flows == 4
    assert hp.flow_n_layers == 4
    assert hp.flow_kernel_size == 5
    assert hp.upsample_rates == [8, 8, 2, 2]
    assert hp.upsample_kernel_sizes == [16, 16, 4, 4]
    assert hp.upsample_initial_channel == 512
    assert hp.resblock_kernel_sizes == [3, 7, 11]
    assert hp.resblock_dilation_sizes == [[1, 3, 5]] * 3
    assert hp.hop_length == 256
    assert hp.gin_channels == 0


def test_hparams_derivation_high_roundtrip(tmp_path):
    """The high preset (deeper 5-level upsample stack, BASELINE.json config
    #4) must survive ONNX write -> parse -> derive_hparams unchanged —
    the derivation path is what loads a real en_US-ryan-high export."""
    model_path, config_path = make_synthetic_voice(tmp_path, quality="high", seed=6)
    cfg = VoiceConfig.load(config_path)
    m = load_model(model_path)
    hp = derive_hparams(m.graph, sample_rate=cfg.audio.sample_rate)
    expected = PRESETS["high"]
    assert expected.upsample_rates != PRESETS["medium"].upsample_rates
    assert hp.upsample_rates == expected.upsample_rates == [8, 4, 2, 2, 2]
    assert hp.upsample_kernel_sizes == expected.upsample_kernel_sizes == [16, 8, 4, 4, 4]
    assert hp.num_upsamples == 5
    assert hp.hop_length == 256  # same 22.05 kHz hop as medium
    assert hp.upsample_initial_channel == 512
    assert hp.resblock_kernel_sizes == [3, 7, 11]
    assert hp.resblock_dilation_sizes == [[1, 3, 5]] * 3
    assert hp.sample_rate == 22050
    # The deeper stack carries an extra resblock set (15 vs medium's 12).
    assert sum(1 for k in m.graph.initializers
               if k.startswith("dec.resblocks.") and k.endswith("convs1.0.weight")) == 15


def test_hparams_derivation_multispeaker(tmp_path):
    model_path, config_path = make_synthetic_voice(
        tmp_path, quality="x_low", seed=4, n_speakers=8, gin_channels=64
    )
    m = load_model(model_path)
    hp = derive_hparams(m.graph)
    assert hp.n_speakers == 8
    assert hp.gin_channels == 64
    assert hp.hidden_channels == 96
    assert hp.upsample_rates == [8, 8, 4]
    cfg = VoiceConfig.load(config_path)
    assert cfg.num_speakers == 8
    assert cfg.speaker_id_map["spk3"] == 3


def test_loaded_params_match_generated(medium_voice):
    model_path, _ = medium_voice
    m = load_model(model_path)
    params = params_from_graph(m.graph)
    reference = synthetic_params(PRESETS["medium"], seed=3)
    assert set(params) == set(reference)
    for k in ("enc_p.emb.weight", "dec.ups.0.weight", "dp.flows.1.proj.weight"):
        np.testing.assert_array_equal(np.asarray(params[k]), reference[k])


def test_infer_from_loaded_checkpoint(tmp_path):
    # Tiny end-to-end: x_low is the smallest preset; still ~2s on CPU.
    model_path, config_path = make_synthetic_voice(tmp_path, quality="x_low", seed=5)
    cfg = VoiceConfig.load(config_path)
    m = load_model(model_path)
    hp = derive_hparams(m.graph, sample_rate=cfg.audio.sample_rate)
    params = params_from_graph(m.graph)
    ids = np.array([[1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2]])
    rng = np.random.default_rng(0)
    max_frames = 96
    audio, y_len = infer(
        params,
        hp,
        jnp.asarray(ids),
        jnp.asarray([ids.shape[1]]),
        jnp.asarray(rng.standard_normal((1, 2, ids.shape[1])).astype(np.float32)),
        jnp.asarray(
            rng.standard_normal((1, hp.inter_channels, max_frames)).astype(np.float32)
        ),
        max_frames=max_frames,
    )
    audio = np.asarray(audio)
    assert audio.shape == (1, max_frames * hp.hop_length)
    assert np.isfinite(audio).all()
    assert 1 <= int(y_len[0]) <= max_frames
    # tanh output bound
    assert np.abs(audio).max() <= 1.0
