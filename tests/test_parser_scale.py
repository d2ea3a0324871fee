"""Parser scale test: a checkpoint with the real voice's structural stats.

The reference's loader golden test pins exactly 2755 nodes and 401
initializers for en_GB-northern_english_male-medium
(Tests/PiperONNXTests/ONNXParsingTests.swift:29-30); offline we reproduce a
graph at that scale and pin the same counts through both parser paths.
"""

import time

import numpy as np
import pytest

from piper_tpu.onnx.ir import OnnxValueInfo, TensorDataType
from piper_tpu.onnx.loader import _load_model_python, load_model
from piper_tpu.onnx.native import load_model_native, native_available
from piper_tpu.onnx.writer import node, save_model

N_NODES = 2755
N_INITS = 401


@pytest.fixture(scope="module")
def big_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("parser_scale")
    rng = np.random.default_rng(0)
    inits = {}
    # ~400 weights totalling ~60MB, shaped like conv/linear params.
    for i in range(N_INITS - 1):
        ch = int(rng.integers(16, 256))
        inits[f"layer.{i}.weight"] = rng.standard_normal(
            (ch, 192, 3)
        ).astype(np.float32)
    inits["sid"] = np.array([0], dtype=np.int64)

    nodes = [node("Gather", ["emb", "input"], ["n0_out"], axis=0)]
    ops = ["Conv", "Add", "Mul", "Relu", "Transpose", "Reshape", "Slice",
           "Concat", "Softmax", "MatMul"]
    for i in range(1, N_NODES):
        op = ops[i % len(ops)]
        attrs = {}
        if op == "Conv":
            attrs = dict(dilations=[1], strides=[1], pads=[1, 1], group=1,
                         kernel_shape=[3])
        elif op == "Transpose":
            attrs = dict(perm=[0, 2, 1])
        elif op == "Softmax":
            attrs = dict(axis=-1)
        nodes.append(
            node(op, [f"n{i-1}_out", f"layer.{i % (N_INITS-1)}.weight"],
                 [f"n{i}_out"], name=f"node_{i}", **attrs)
        )
    p = d / "big.onnx"
    save_model(
        str(p), nodes, inits,
        inputs=[
            OnnxValueInfo("input", TensorDataType.INT64, [1, "P"]),
            OnnxValueInfo("input_lengths", TensorDataType.INT64, [1]),
            OnnxValueInfo("scales", TensorDataType.FLOAT, [3]),
        ],
        outputs=[OnnxValueInfo("output", TensorDataType.FLOAT, [1, 1, 1, "T"])],
        opset=15,
    )
    return p


def test_golden_counts_python(big_model):
    m = _load_model_python(big_model)
    assert m.opset_version == 15
    assert len(m.graph.nodes) == N_NODES
    assert len(m.graph.initializers) == N_INITS
    assert "sid" in m.graph.initializers
    assert m.graph.nodes[0].op_type == "Gather"
    assert [v.name for v in m.graph.inputs] == ["input", "input_lengths", "scales"]
    assert m.graph.outputs[0].name == "output"


@pytest.mark.skipif(not native_available(), reason="native toolchain unavailable")
def test_golden_counts_native_and_speed(big_model):
    def best_of(f, n=3):
        best = float("inf")
        result = None
        for _ in range(n):
            t0 = time.perf_counter()
            result = f()
            best = min(best, time.perf_counter() - t0)
        return result, best

    m, t_native = best_of(lambda: load_model_native(big_model))
    assert m is not None
    assert len(m.graph.nodes) == N_NODES
    assert len(m.graph.initializers) == N_INITS
    m_py, t_py = best_of(lambda: _load_model_python(big_model))
    # Structural equality on a sample.
    assert m.graph.nodes[1234].op_type == m_py.graph.nodes[1234].op_type
    assert m.graph.nodes[1234].inputs == m_py.graph.nodes[1234].inputs
    np.testing.assert_array_equal(
        np.asarray(m.graph.initializers["layer.7.weight"].array),
        m_py.graph.initializers["layer.7.weight"].array,
    )
    # Best-of-3 with generous slack: this guards against the native path
    # being CATASTROPHICALLY slower (a regression to scalar decoding), not
    # a perf claim — measured speedups live in docs/BENCH.md. Observed
    # flake: under a fully loaded box (test suite + TPU tools in parallel)
    # best-of-3 native exceeded 1.5x python once.
    assert t_native < t_py * 3.0, (t_native, t_py)
