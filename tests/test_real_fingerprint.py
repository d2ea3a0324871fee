"""Real-checkpoint readiness: parse a reconstruction of the real
en_GB-northern_english_male-medium export — encoded by an INDEPENDENT
protobuf writer (tests/real_export_fixture.py), matching the committed
structural fingerprint — through the python loader, the native C++ parser,
derive_hparams, and the runtime end to end.

This breaks the round-trip-through-our-own-writer loop the round-2 review
flagged: the bytes here are produced by different code with the payload
encodings (float_data, int32_data, Constant-node weights, output_padding,
doc strings, metadata) a real torch export uses and our writer never emits.
Mirrors the reference's loader golden test
(/root/reference/Tests/PiperONNXTests/ONNXParsingTests.swift:21-37)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.real_export_fixture import (FINGERPRINT_INITIALIZERS,
                                       FINGERPRINT_NODES,
                                       build_real_like_checkpoint)

FIXTURE_DIR = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def fingerprint():
    return json.loads((FIXTURE_DIR / "real_voice_fingerprint.json").read_text())


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("real_like")
    path = d / "en_GB-northern_english_male-medium.onnx"
    weights = build_real_like_checkpoint(path, seed=3)
    return path, weights


def _structural_asserts(model, fp):
    facts = fp["facts"]
    assert model.opset_version == facts["opset_version"]
    g = model.graph
    assert len(g.nodes) == facts["node_count"] == FINGERPRINT_NODES
    assert len(g.initializers) == facts["initializer_count"] == FINGERPRINT_INITIALIZERS
    assert [vi.name for vi in g.inputs] == facts["graph_inputs"]
    assert [vi.name for vi in g.outputs] == facts["graph_outputs"]
    assert g.nodes[0].op_type == facts["first_node_op"]
    for name in facts["initializers_present"]:
        assert name in g.initializers, name


def test_python_loader_matches_fingerprint(checkpoint, fingerprint):
    from piper_tpu.onnx.loader import _load_model_python

    path, _ = checkpoint
    model = _load_model_python(path)
    _structural_asserts(model, fingerprint)
    assert model.producer_name == "pytorch"
    assert model.ir_version == 8
    # sid decoded from int64_data (non-raw).
    sid = model.graph.initializers["sid"]
    assert sid.array.dtype == np.int64 and sid.array.tolist() == [0]


def test_native_parser_matches_fingerprint(checkpoint, fingerprint):
    from piper_tpu.onnx.native import load_model_native

    path, _ = checkpoint
    model = load_model_native(path)
    if model is None:
        pytest.skip("native parser unavailable on this box")
    _structural_asserts(model, fingerprint)


def test_weights_decode_exactly(checkpoint):
    """Every float parameter — raw_data, float_data, or Constant-node —
    round-trips bit-exactly through the loader."""
    from piper_tpu.models.vits.params import host_arrays_from_graph
    from piper_tpu.onnx import load_model

    path, weights = checkpoint
    arrays = host_arrays_from_graph(load_model(path).graph)
    assert set(arrays) == set(weights)
    for k, v in weights.items():
        np.testing.assert_array_equal(arrays[k], v, err_msg=k)


def test_derive_hparams_from_real_shape(checkpoint):
    """hparams derivation reads the reconstruction's node attributes
    (ConvTranspose strides with output_padding present, Conv dilations) and
    recovers the exact medium architecture."""
    from piper_tpu.models.vits.hparams import PRESETS, derive_hparams
    from piper_tpu.onnx import load_model

    path, _ = checkpoint
    hp = derive_hparams(load_model(path).graph, sample_rate=22050)
    ref = PRESETS["medium"]
    assert hp.upsample_rates == ref.upsample_rates
    assert hp.upsample_kernel_sizes == ref.upsample_kernel_sizes
    assert hp.resblock_kernel_sizes == ref.resblock_kernel_sizes
    assert hp.resblock_dilation_sizes == ref.resblock_dilation_sizes
    assert hp.hidden_channels == ref.hidden_channels
    assert hp.inter_channels == ref.inter_channels
    assert hp.filter_channels == ref.filter_channels
    assert hp.n_layers == ref.n_layers
    assert hp.n_heads == ref.n_heads
    assert hp.window_size == ref.window_size
    assert hp.flow_n_flows == ref.flow_n_flows
    assert hp.flow_n_layers == ref.flow_n_layers
    assert hp.flow_kernel_size == ref.flow_kernel_size
    assert hp.dp_filter_channels == ref.dp_filter_channels
    assert hp.dp_num_bins == ref.dp_num_bins
    assert hp.n_vocab == ref.n_vocab


@pytest.mark.slow
def test_runtime_loads_real_shape_end_to_end(checkpoint, tmp_path):
    """The full runtime path on the reconstruction: config + checkpoint ->
    synthesize finite audio (medium architecture, so slow on one CPU core —
    one small bucket only)."""
    from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
    from piper_tpu.models.vits.synthetic import default_phoneme_id_map

    path, _ = checkpoint
    config = {
        "audio": {"sample_rate": 22050, "quality": "medium"},
        "espeak": {"voice": "en-gb-x-rp"},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0, "noise_w": 0.8},
        "phoneme_type": "espeak",
        "phoneme_id_map": default_phoneme_id_map(256),
        "num_symbols": 256,
        "num_speakers": 1,
    }
    cfg = tmp_path / "c.onnx.json"
    cfg.write_text(json.dumps(config))
    rt = PiperRuntime(path, cfg, RuntimeOptions(
        frame_buckets=(128,), phoneme_buckets=(16,)))
    audio = rt.synthesize([1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2])
    assert len(audio) > 0 and np.isfinite(audio).all()
