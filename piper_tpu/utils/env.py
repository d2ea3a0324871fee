"""PIPER_TPU_* environment flags (analog of the reference's 25 PIPER_* flags,
SURVEY.md §5.6) — read in one place so the full list is discoverable.

| Flag                    | Effect                                              |
|-------------------------|-----------------------------------------------------|
| PIPER_TPU_CACHE         | cache root for voices/synthetic checkpoints         |
| PIPER_TPU_NO_NATIVE     | =1 disables the C++ ONNX parser (pure-Python path)  |
| PIPER_TPU_PROFILE       | =1 dumps a per-stage timing table to stderr at exit |
| PIPER_TPU_TRACE         | =1 logs each synthesis stage (bucket, ms) to stderr |
| PIPER_TPU_PLATFORM      | force a jax platform (e.g. cpu) in CLI/bench        |
| PIPER_TPU_PRECISION     | override the default matmul precision tier          |
| PIPER_TPU_VOCODER_PRECISION | vocoder-only tier or comma-list per upsample level |
| PIPER_TPU_FLOW_PRECISION | decode-flow-only matmul tier (encoder stays fp32)    |
| PIPER_TPU_MODE          | override execution mode: split | fused              |
| PIPER_TPU_NO_PALLAS     | =1 disables the fused Pallas kernels (XLA lowering) |
| PIPER_TPU_FUSE_MRF      | =1/=0 force whole-MRF fusion on/off (default: ch<=32 levels only) |
| PIPER_TPU_NO_JIT_CACHE  | =1 disables the persistent on-disk XLA jit cache    |
| PIPER_TPU_PALLAS_INTERPRET | =1 runs Pallas kernels in interpreter mode (CPU CI exercises the exact kernel plumbing) |
"""

from __future__ import annotations

import os


def flag(name: str, default: str = "") -> str:
    return os.environ.get(name, default)


def flag_bool(name: str) -> bool:
    return os.environ.get(name) == "1"


def cache_root() -> str:
    from pathlib import Path

    return os.environ.get("PIPER_TPU_CACHE", str(Path.home() / ".cache" / "piper-tpu"))


def apply_platform_override() -> None:
    """Honor PIPER_TPU_PLATFORM before any JAX backend initializes.

    The session's JAX_PLATFORMS env var is sticky (the axon TPU plugin sets
    it), so forcing a platform must go through jax.config — called by the CLI
    and bench entry points."""
    p = flag("PIPER_TPU_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)


def profile_enabled() -> bool:
    return flag_bool("PIPER_TPU_PROFILE")


def trace_enabled() -> bool:
    return flag_bool("PIPER_TPU_TRACE")
