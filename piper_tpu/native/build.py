"""Build helper for the native library (g++; no external deps).

The shared object is built lazily on first use and cached next to the source
(with a content hash in the name so edits rebuild). Every native entry point
has a pure-Python fallback, so a missing toolchain degrades gracefully —
mirroring the reference's Metal-unavailable -> CPU fallback policy
(GraphExecutor.swift:63-70)."""

from __future__ import annotations

import hashlib
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent


def build_library(sources: list[str], name: str) -> Optional[Path]:
    """Compile sources into a cached .so; returns None if unavailable."""
    srcs = [_SRC_DIR / s for s in sources]
    h = hashlib.sha256()
    for s in srcs:
        h.update(s.read_bytes())
    tag = h.hexdigest()[:12]
    out = _SRC_DIR / f"{name}-{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        *[str(s) for s in srcs], "-o", str(out),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        import sys

        print(f"piper-tpu: native build failed:\n{proc.stderr}", file=sys.stderr)
        return None
    return out
