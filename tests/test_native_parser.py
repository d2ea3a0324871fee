"""Native C++ ONNX parser: parity with the pure-Python loader."""

import time

import numpy as np
import pytest

from piper_tpu.models.vits.synthetic import make_synthetic_voice
from piper_tpu.onnx.loader import _load_model_python, load_model
from piper_tpu.onnx.native import load_model_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_voice")
    model, _ = make_synthetic_voice(d, quality="test", seed=9)
    return model


def test_native_matches_python(voice):
    m_py = _load_model_python(voice)
    m_nat = load_model_native(voice)
    assert m_nat is not None
    assert m_nat.opset_version == m_py.opset_version
    assert m_nat.ir_version == m_py.ir_version
    assert m_nat.producer_name == m_py.producer_name
    assert m_nat.graph.name == m_py.graph.name
    assert len(m_nat.graph.nodes) == len(m_py.graph.nodes)
    assert set(m_nat.graph.initializers) == set(m_py.graph.initializers)
    for name, t_py in m_py.graph.initializers.items():
        t_nat = m_nat.graph.initializers[name]
        assert t_nat.dims == t_py.dims
        assert t_nat.data_type == t_py.data_type
        np.testing.assert_array_equal(np.asarray(t_nat.array), np.asarray(t_py.array))
    for n_nat, n_py in zip(m_nat.graph.nodes, m_py.graph.nodes):
        assert n_nat.op_type == n_py.op_type
        assert n_nat.inputs == n_py.inputs
        assert n_nat.outputs == n_py.outputs
        assert set(n_nat.attributes) == set(n_py.attributes)
        for k in n_py.attributes:
            if n_py.attributes[k].type == 7:  # INTS
                assert n_nat.attr_ints(k) == n_py.attr_ints(k)
    assert [v.name for v in m_nat.graph.inputs] == [v.name for v in m_py.graph.inputs]
    assert m_nat.graph.inputs[0].shape == m_py.graph.inputs[0].shape
    assert [v.name for v in m_nat.graph.outputs] == [v.name for v in m_py.graph.outputs]


def test_native_is_default_path(voice):
    m = load_model(voice)
    # Zero-copy mapping: the native loader returns views into the file buffer
    # (read-only), while the python path builds fresh arrays.
    some = next(iter(m.graph.initializers.values()))
    assert not some.array.flags.writeable


def test_native_rejects_garbage():
    assert load_model_native(b"\xff" * 64) is None


def test_native_speedup(voice):
    data = voice.read_bytes()
    # Best-of-3 each: single-sample timing flakes under box load (observed
    # failing in a full-suite run while a serving sim saturated the CPUs).
    t_py = min(_timed(_load_model_python, data) for _ in range(3))
    t_nat = min(_timed(load_model_native, data) for _ in range(3))
    # Informational: the native path should not be slower.
    assert t_nat <= t_py * 2.5, (t_nat, t_py)


def _timed(fn, data) -> float:
    t0 = time.perf_counter()
    fn(data)
    return time.perf_counter() - t0
