"""Graph rewrite: externalizing RandomNormalLike nodes."""

import numpy as np

from piper_tpu.onnx import load_model
from piper_tpu.onnx.ir import OnnxValueInfo, TensorDataType
from piper_tpu.onnx.rewrite import externalize_random
from piper_tpu.onnx.writer import node, save_model, save_model_ir


def test_externalize_random_roundtrip(tmp_path):
    nodes = [
        node("Gather", ["emb", "input"], ["x"], axis=0),
        node("RandomNormalLike", ["x"], ["dp_noise"], seed=1234.0),
        node("Add", ["x", "dp_noise"], ["y"]),
        node("RandomNormalLike", ["y"], ["main_noise"]),
        node("Mul", ["y", "main_noise"], ["output"]),
    ]
    inits = {"emb": np.zeros((4, 2), np.float32)}
    p = tmp_path / "m.onnx"
    save_model(str(p), nodes, inits,
               inputs=[OnnxValueInfo("input", TensorDataType.INT64, [1, "P"])],
               outputs=[OnnxValueInfo("output", TensorDataType.FLOAT, None)])

    m = load_model(p)
    rewritten, noise_names = externalize_random(m)
    assert noise_names == ["dp_noise", "main_noise"]
    assert [n.op_type for n in rewritten.graph.nodes] == ["Gather", "Add", "Mul"]
    input_names = [v.name for v in rewritten.graph.inputs]
    assert input_names == ["input", "dp_noise", "main_noise"]
    # Original untouched.
    assert len(m.graph.nodes) == 5

    # Round-trips through the writer + loader.
    p2 = tmp_path / "m.norng.onnx"
    save_model_ir(str(p2), rewritten)
    m2 = load_model(p2)
    assert [n.op_type for n in m2.graph.nodes] == ["Gather", "Add", "Mul"]
    assert [v.name for v in m2.graph.inputs] == input_names
    np.testing.assert_array_equal(m2.graph.initializers["emb"].array, inits["emb"])
