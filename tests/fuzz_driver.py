"""Subprocess driver for ONNX parser fuzzing (run by tests/test_onnx_fuzz.py).

Runs in its own process so (a) a native-parser crash (segfault/abort) fails
the test instead of killing pytest, and (b) an address-space rlimit bounds
any pathological allocation a corrupt dims field could provoke.

Contract checked per mutated checkpoint (the loader analog of the reference's
bad-tag handling, ONNXLoader.swift:280-288):
  - `_load_model_python(bytes)` returns OnnxModel or raises OnnxLoadError —
    never any other exception type.
  - `load_model_native(bytes)` returns OnnxModel or None, or raises a Python
    exception (tolerated: the public `load_model` wraps it) — but must not
    crash or hang the process.
  - Differential: when BOTH parsers accept the same mutated file, they must
    agree on graph structure and initializer payload bytes.

Usage: python tests/fuzz_driver.py MODEL_PATH SEED COUNT
Prints one JSON summary line on success; on a contract violation prints a
JSON line with the case descriptor and exits 1.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _limit_address_space(gib: int = 4) -> None:
    try:
        import resource

        limit = gib * (1 << 30)
        soft, hard = resource.getrlimit(resource.RLIMIT_AS)
        if hard != resource.RLIM_INFINITY:
            limit = min(limit, hard)
        resource.setrlimit(resource.RLIMIT_AS, (limit, hard))
    except Exception:  # noqa: BLE001 — best-effort guard
        pass


def mutate(data: bytes, rng: np.random.RandomState):
    """One deterministic mutation of `data`; returns (descriptor, bytes)."""
    n = len(data)
    op = rng.randint(0, 6)
    if op == 0:  # truncate
        cut = int(rng.randint(0, n))
        return f"truncate@{cut}", data[:cut]
    if op == 1:  # flip 1-8 bytes
        buf = bytearray(data)
        k = int(rng.randint(1, 9))
        idx = rng.randint(0, n, size=k)
        for i in idx:
            buf[int(i)] ^= int(rng.randint(1, 256))
        return f"flip{k}@{int(idx[0])}", bytes(buf)
    if op == 2:  # insert random chunk
        pos = int(rng.randint(0, n + 1))
        chunk = rng.randint(0, 256, size=int(rng.randint(1, 17))).astype(np.uint8)
        return f"insert{len(chunk)}@{pos}", data[:pos] + chunk.tobytes() + data[pos:]
    if op == 3:  # delete a slice
        a = int(rng.randint(0, n))
        b = min(n, a + int(rng.randint(1, 64)))
        return f"delete[{a}:{b}]", data[:a] + data[b:]
    if op == 4:  # zero a slice
        a = int(rng.randint(0, n))
        b = min(n, a + int(rng.randint(1, 64)))
        return f"zero[{a}:{b}]", data[:a] + b"\x00" * (b - a) + data[b:]
    # splice: overwrite with a copy of another region (valid-looking bytes)
    a = int(rng.randint(0, n))
    ln = int(rng.randint(1, 64))
    src = int(rng.randint(0, max(1, n - ln)))
    b = min(n, a + ln)
    return f"splice[{src}->{a}:{b}]", data[:a] + data[src : src + (b - a)] + data[b:]


def models_agree(pm, nm) -> str:
    """'' if the python and native models structurally agree, else a reason."""
    pg, ng = pm.graph, nm.graph
    if [x.op_type for x in pg.nodes] != [x.op_type for x in ng.nodes]:
        return "node op_types differ"
    if sorted(pg.initializers) != sorted(ng.initializers):
        return "initializer names differ"
    for name, pt in pg.initializers.items():
        nt = ng.initializers[name]
        if pt.array.shape != nt.array.shape or pt.array.dtype != nt.array.dtype:
            return f"initializer {name!r} shape/dtype differs"
        if pt.array.tobytes() != nt.array.tobytes():
            return f"initializer {name!r} payload differs"
    for px, nx in zip(pg.nodes, ng.nodes):
        if px.inputs != nx.inputs or px.outputs != nx.outputs:
            return f"node {px.name!r} IO differs"
        if sorted(px.attributes) != sorted(nx.attributes):
            return f"node {px.name!r} attribute keys differ"
    if [v.name for v in pg.inputs] != [v.name for v in ng.inputs]:
        return "graph inputs differ"
    if [v.name for v in pg.outputs] != [v.name for v in ng.outputs]:
        return "graph outputs differ"
    return ""


def main() -> int:
    _limit_address_space()
    model_path, seed, count = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    data = Path(model_path).read_bytes()

    from piper_tpu.onnx.ir import OnnxModel
    from piper_tpu.onnx.loader import OnnxLoadError, _load_model_python
    from piper_tpu.onnx.native import load_model_native, native_available

    have_native = native_available()
    rng = np.random.RandomState(seed)
    stats = {
        "cases": count,
        "py_ok": 0,
        "py_load_error": 0,
        "native_ok": 0,
        "native_none": 0,
        "native_exc": 0,
        "compared": 0,
        "native_built": have_native,
    }

    for case in range(count):
        desc, mutated = mutate(data, rng)

        pm = None
        try:
            pm = _load_model_python(mutated)
            if not isinstance(pm, OnnxModel):
                raise AssertionError(f"python loader returned {type(pm)}")
            stats["py_ok"] += 1
        except OnnxLoadError:
            stats["py_load_error"] += 1
        except Exception as e:  # noqa: BLE001 — this IS the contract violation
            print(json.dumps({
                "violation": "python loader raised non-OnnxLoadError",
                "case": case, "mutation": desc,
                "exc_type": type(e).__name__, "exc": str(e)[:500],
            }))
            return 1

        if have_native:
            sys.stdout.write(f"case {case} native {desc}\n")  # crash breadcrumb
            sys.stdout.flush()
            nm = None
            try:
                nm = load_model_native(mutated)
                stats["native_ok" if nm is not None else "native_none"] += 1
            except Exception:  # noqa: BLE001 — tolerated; load_model wraps it
                stats["native_exc"] += 1
            if pm is not None and nm is not None:
                stats["compared"] += 1
                reason = models_agree(pm, nm)
                if reason:
                    print(json.dumps({
                        "violation": "python/native parser disagreement",
                        "case": case, "mutation": desc, "reason": reason,
                    }))
                    return 1

    print("SUMMARY " + json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
