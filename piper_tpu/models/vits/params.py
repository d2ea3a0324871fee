"""Parameter store: the checkpoint's named weights as a flat JAX pytree.

Keys are the original exported PyTorch parameter paths (`enc_p.*`, `dp.*`,
`flow.*`, `dec.*`, `emb_g.*`) so every module cites weights by the same
names the reference's tests pin (ONNXParsingTests.swift:29-37). A flat
dict[str, Array] is a valid pytree, jit-friendly, and donation-friendly.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax.numpy as jnp
import numpy as np

from piper_tpu.onnx.ir import OnnxGraph, TensorDataType

Params = Dict[str, jnp.ndarray]


_FLOAT_TYPES = (TensorDataType.FLOAT, TensorDataType.DOUBLE, TensorDataType.FLOAT16)


def _constant_weights(graph: OnnxGraph):
    """Float weights that a real torch export emitted as Constant NODES
    instead of initializers (constant folding moves some module parameters
    — layer-norm gammas/betas in particular — out of the initializer list).
    Yields (param_path, OnnxTensor) for Constant outputs named like
    exported module parameters."""
    for n in graph.nodes:
        if n.op_type != "Constant" or not n.outputs:
            continue
        attr = n.attributes.get("value")
        if attr is None or not hasattr(attr.value, "data_type"):
            continue
        t = attr.value
        name = n.outputs[0]
        looks_like_param = "." in name and name.split(".", 1)[0] in (
            "enc_p", "dp", "flow", "dec", "emb_g")
        if looks_like_param and t.data_type in _FLOAT_TYPES:
            yield name, t


def params_from_graph(graph: OnnxGraph, dtype=jnp.float32) -> Params:
    """Extract all float weights as JAX arrays keyed by name — initializers
    plus parameter-named Constant nodes (see _constant_weights).

    Non-float initializers (shape constants the exported graph needed, the
    baked `sid`, etc.) are skipped — the native forward pass doesn't use them.
    """
    out: Params = {}
    for name, t in graph.initializers.items():
        if t.data_type in _FLOAT_TYPES:
            out[name] = jnp.asarray(np.asarray(t.array), dtype=dtype)
    for name, t in _constant_weights(graph):
        out.setdefault(name, jnp.asarray(np.asarray(t.array), dtype=dtype))
    return out


def params_from_arrays(arrays: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    return {k: jnp.asarray(v, dtype=dtype) for k, v in arrays.items()}


def host_arrays_from_graph(graph: OnnxGraph) -> Dict[str, np.ndarray]:
    """Float weights (initializers + parameter-named Constant nodes) as host
    numpy arrays (no device transfer)."""
    out: Dict[str, np.ndarray] = {}
    for name, t in graph.initializers.items():
        if t.data_type in _FLOAT_TYPES:
            out[name] = np.asarray(t.array)
    for name, t in _constant_weights(graph):
        out.setdefault(name, np.asarray(t.array))
    return out


def device_put_packed(arrays: Dict[str, np.ndarray], dtype=jnp.float32) -> Params:
    """Upload a whole parameter set as ONE flat transfer + on-device unpack.

    Uploading ~500 small arrays individually serializes device round trips
    (measured 11.5 s for a 113 MB checkpoint over the tunneled TPU); a single
    packed upload plus a jitted split/reshape takes the link-bandwidth time."""
    import jax

    names = sorted(arrays)
    shapes = {n: arrays[n].shape for n in names}
    flat = np.concatenate(
        [np.ascontiguousarray(arrays[n], dtype=np.float32).ravel() for n in names]
    )
    flat_j = jnp.asarray(flat)

    def unpack(f):
        out = {}
        offset = 0
        for n in names:
            size = int(np.prod(shapes[n])) if shapes[n] else 1
            out[n] = f[offset : offset + size].reshape(shapes[n]).astype(dtype)
            offset += size
        return out

    return jax.jit(unpack)(flat_j)


class Prefix:
    """Convenience accessor: p = Prefix(params, 'enc_p.encoder'); p['ffn_layers.0.conv_1.weight']."""

    __slots__ = ("params", "prefix")

    def __init__(self, params: Params, prefix: str = ""):
        self.params = params
        self.prefix = prefix

    def __getitem__(self, key: str) -> jnp.ndarray:
        full = f"{self.prefix}.{key}" if self.prefix else key
        return self.params[full]

    def __contains__(self, key: str) -> bool:
        full = f"{self.prefix}.{key}" if self.prefix else key
        return full in self.params

    def sub(self, key: str) -> "Prefix":
        full = f"{self.prefix}.{key}" if self.prefix else key
        return Prefix(self.params, full)

    def keys(self) -> Iterator[str]:
        pre = self.prefix + "." if self.prefix else ""
        for k in self.params:
            if k.startswith(pre):
                yield k[len(pre):]
