from piper_tpu.onnx.ir import (
    OnnxAttribute,
    OnnxGraph,
    OnnxModel,
    OnnxNode,
    OnnxTensor,
    TensorDataType,
)
from piper_tpu.onnx.loader import OnnxLoadError, load_model

__all__ = [
    "OnnxAttribute",
    "OnnxGraph",
    "OnnxModel",
    "OnnxNode",
    "OnnxTensor",
    "TensorDataType",
    "OnnxLoadError",
    "load_model",
]
