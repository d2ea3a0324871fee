"""ONNX codec tests: wire-format roundtrip, loader field coverage."""

import numpy as np
import pytest

from piper_tpu.onnx import load_model
from piper_tpu.onnx.ir import AttrType, OnnxValueInfo, TensorDataType
from piper_tpu.onnx.wire import Reader, Writer, decode_signed_varint
from piper_tpu.onnx.writer import node, save_model


def test_varint_roundtrip():
    w = Writer()
    values = [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)]
    for v in values:
        w.varint_field(1, v)
    r = Reader(w.to_bytes())
    out = []
    for _field, wt in r.fields():
        assert wt == 0
        out.append(decode_signed_varint(r.read_varint()))
    assert out == values


def test_model_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    weights = {
        "enc_p.emb.weight": rng.standard_normal((256, 192)).astype(np.float32),
        "dec.ups.0.weight": rng.standard_normal((512, 256, 16)).astype(np.float32),
        "some.int64": np.arange(7, dtype=np.int64),
        "some.bool": np.array([True, False, True]),
    }
    nodes = [
        node(
            "ConvTranspose",
            ["x", "dec.ups.0.weight"],
            ["y"],
            name="up0",
            strides=[8],
            pads=[4, 4],
            group=1,
            dilations=[1],
            kernel_shape=[16],
        ),
        node("Gather", ["enc_p.emb.weight", "input"], ["emb_out"], axis=0),
        node("LeakyRelu", ["y"], ["z"], alpha=0.1),
        node("Constant", [], ["c"], value_string="hello"),
    ]
    inputs = [
        OnnxValueInfo("input", TensorDataType.INT64, [1, "P"]),
        OnnxValueInfo("input_lengths", TensorDataType.INT64, [1]),
        OnnxValueInfo("scales", TensorDataType.FLOAT, [3]),
    ]
    outputs = [OnnxValueInfo("output", TensorDataType.FLOAT, [1, 1, "T"])]
    p = tmp_path / "model.onnx"
    save_model(str(p), nodes, weights, inputs, outputs, opset=15)

    m = load_model(p)
    assert m.opset_version == 15
    assert m.producer_name == "piper-tpu"
    g = m.graph
    assert [n.op_type for n in g.nodes] == ["ConvTranspose", "Gather", "LeakyRelu", "Constant"]
    assert len(g.initializers) == 4
    np.testing.assert_array_equal(
        g.initializers["enc_p.emb.weight"].array, weights["enc_p.emb.weight"]
    )
    np.testing.assert_array_equal(g.initializers["some.int64"].array, weights["some.int64"])
    assert g.initializers["some.bool"].data_type == TensorDataType.BOOL

    up = g.nodes[0]
    assert up.attr_ints("strides") == [8]
    assert up.attr_ints("pads") == [4, 4]
    assert up.attr_i("group") == 1
    assert g.nodes[1].attr_i("axis") == 0
    assert g.nodes[2].attr_f("alpha") == pytest.approx(0.1)
    assert g.nodes[2].attributes["alpha"].type == AttrType.FLOAT
    assert g.nodes[3].attr_s("value_string") == "hello"

    assert [vi.name for vi in g.inputs] == ["input", "input_lengths", "scales"]
    assert g.inputs[0].shape == [1, "P"]
    assert g.outputs[0].name == "output"
    assert g.outputs[0].elem_type == TensorDataType.FLOAT


def test_loader_rejects_garbage():
    with pytest.raises(Exception):
        load_model(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")


def _tiny_model_bytes(tmp_path):
    rng = np.random.default_rng(7)
    weights = {
        "w.a": rng.standard_normal((8, 4)).astype(np.float32),
        "w.b": np.arange(5, dtype=np.int64),
    }
    nodes = [node("Gather", ["w.a", "input"], ["y"], axis=0)]
    inputs = [OnnxValueInfo("input", TensorDataType.INT64, [1, "P"])]
    outputs = [OnnxValueInfo("y", TensorDataType.FLOAT, [1, "P", 4])]
    p = tmp_path / "fuzz.onnx"
    save_model(str(p), nodes, weights, inputs, outputs, opset=15)
    return p.read_bytes()


def test_truncated_checkpoint_fails_loudly(tmp_path):
    """A checkpoint cut off anywhere must raise a loader error (from either
    the native or the python path), never return a silently-partial model
    with fabricated weights."""
    data = _tiny_model_bytes(tmp_path)
    for cut in (1, len(data) // 4, len(data) // 2, len(data) - 3):
        trunc = data[:cut]
        try:
            m = load_model(trunc)
        except ValueError:
            continue  # OnnxLoadError subclasses ValueError — good
        # If a prefix happens to decode as a complete message, every weight
        # it reports must be intact; a Gather model with missing/zeroed
        # weights is the silent-corruption case this guards against.
        got = {t.name for t in m.graph.initializers.values()} if isinstance(
            m.graph.initializers, dict) else {t.name for t in m.graph.initializers}
        assert got == {"w.a", "w.b"}, f"cut={cut}: partial model {got}"


def test_bitflipped_checkpoint_never_misloads_weights(tmp_path):
    """Flip single bytes across the file: each load either raises a clean
    ValueError/OnnxLoadError or returns a model whose decoded weights are
    all shape-consistent (no crashes, no numpy broadcasting surprises)."""
    data = bytearray(_tiny_model_bytes(tmp_path))
    step = max(1, len(data) // 40)
    for pos in range(0, len(data), step):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        try:
            m = load_model(bytes(mutated))
        except (ValueError, KeyError):
            continue  # clean rejection (bad wire type / dtype enum)
        for t in (m.graph.initializers.values() if isinstance(
                m.graph.initializers, dict) else m.graph.initializers):
            arr = t.array
            if arr is not None and t.dims:
                assert list(arr.shape) == [int(d) for d in t.dims]
