"""Per-layer debug trace: bisecting a divergence to the responsible layer.

The reference can execute to any of its 2755 nodes and inspect the value
table (GraphExecutor.swift:73-152); the native analog is debug_infer's
per-layer trace. These tests inject a single-weight perturbation and assert
the first divergent trace entry (in execution order) is exactly the layer
that owns the perturbed weight.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.model import debug_infer
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params

HP = VitsHParams(
    n_vocab=40,
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=2,
    dp_filter_channels=16,
    dp_n_flows=2,
    flow_n_flows=2,
    flow_hidden_channels=16,
    flow_n_layers=2,
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 2]],
    upsample_rates=[4, 2],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[8, 4],
)

MODULE_KEYS = {
    "enc_hidden", "m_p", "logs_p", "x_mask", "logw", "w_ceil", "y_lengths",
    "y_mask", "path", "m_p_expanded", "logs_p_expanded", "z_p", "z", "audio",
}


def _run(weights, per_layer=True, max_frames=16):
    rng = np.random.default_rng(0)
    b, p = 1, 12
    ids = rng.integers(0, HP.n_vocab, size=(b, p))
    return debug_infer(
        params_from_arrays(weights), HP,
        jnp.asarray(ids, jnp.int32), jnp.asarray([p], jnp.int32),
        jnp.asarray(rng.standard_normal((b, 2, p)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((b, HP.inter_channels, max_frames)).astype(np.float32)),
        max_frames=max_frames, per_layer=per_layer,
    )


def _first_divergent_layer(clean, dirty):
    for k in clean:
        if k in MODULE_KEYS:
            continue
        if not np.allclose(np.asarray(clean[k]), np.asarray(dirty[k])):
            return k
    return None


def test_per_layer_trace_present_and_ordered():
    weights = synthetic_params(HP, seed=7)
    out = _run(weights)
    layer_keys = [k for k in out if k not in MODULE_KEYS]
    # One entry per conv/flow step across all four modules.
    assert any(k.startswith("enc_p.encoder.attn_layers.") for k in layer_keys)
    assert any(k.startswith("dp.flows.") for k in layer_keys)
    assert any(k.startswith("flow.flows.") for k in layer_keys)
    assert any(k.startswith("dec.resblocks.") for k in layer_keys)
    assert any(k.startswith("dec.ups.") for k in layer_keys)
    # per_layer=False keeps the old surface exactly.
    out2 = _run(weights, per_layer=False)
    assert set(out2) == MODULE_KEYS


@pytest.mark.parametrize(
    "weight,expected_first",
    [
        # A flow-decoder WaveNet conv: reverse order runs flows.2 before
        # flows.0, and within flows.2 in_layers.1 comes after in_layers.0.
        ("flow.flows.2.enc.in_layers.1.weight", "flow.flows.2.enc.in_layers.1"),
        # An encoder FFN conv in layer 1 (layer 0 entries must match).
        ("enc_p.encoder.ffn_layers.1.conv_1.weight", "enc_p.encoder.ffn_layers.1"),
        # A vocoder resblock conv at the second upsample level.
        ("dec.resblocks.1.convs1.0.weight", "dec.resblocks.1.convs1.0"),
    ],
)
def test_bisects_injected_perturbation(weight, expected_first):
    weights = synthetic_params(HP, seed=7)
    dirty = dict(weights)
    dirty[weight] = dirty[weight] + 0.05 * np.ones_like(dirty[weight])
    clean_out = _run(weights)
    dirty_out = _run(dirty)
    assert _first_divergent_layer(clean_out, dirty_out) == expected_first
