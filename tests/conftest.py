"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic can be
exercised without TPU hardware (and without paying TPU compile latency for
tiny test shapes). The session's JAX_PLATFORMS=axon env var is sticky, so the
platform override must go through jax.config before any backend initializes.
"""

import os
import sys
from pathlib import Path

import re as _re

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in _flags:
    _flags = _re.sub(r"--xla_force_host_platform_device_count=\d+",
                     "--xla_force_host_platform_device_count=8", _flags)
else:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the suite: ~80% of suite wall time is
# compiles, and on one core they cost 5-40s each. The dir is keyed by a
# CPU-feature fingerprint: the HOME directory survives across dev-session
# hosts while the host CPU changes, and XLA's CPU cache stores AOT machine
# code — loading an entry compiled for another machine's features SIGSEGVs
# mid-suite ("Machine type used for XLA:CPU compilation doesn't match"
# warnings, then exit 139; observed 2026-08-19). A new host therefore gets
# a fresh cache instead of the old host's machine code.


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith(("flags", "Features")):
                return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nofp"


_cache_root = Path.home() / ".cache" / "piper-tpu"
_cache_dir = _cache_root / f"test-jit-cache-{_cpu_fingerprint()}"
try:
    # The pre-fingerprint dir may hold another machine's code: remove it.
    _legacy = _cache_root / "test-jit-cache"
    if _legacy.is_dir():
        import shutil

        shutil.rmtree(_legacy, ignore_errors=True)
    _cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

# Make the repo importable without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_voice(tmp_path_factory):
    """(model, config) paths of the tiny synthetic 'test'-quality voice.

    Session-scoped: orchestration tests (server, batcher, pipeline,
    streaming, CLI, ...) share one voice so each file doesn't pay its own
    checkpoint build; the 'test' tier keeps per-program XLA compiles to
    seconds on one CPU core (this box: 1 vCPU)."""
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    return make_synthetic_voice(
        tmp_path_factory.mktemp("tiny_voice"), quality="test", seed=5
    )


@pytest.fixture(scope="session")
def tiny_runtime(tiny_voice):
    """Shared default-options PiperRuntime on the tiny test voice. Tests
    that assert per-runtime state (compile counts, timings) must build
    their own runtime from `tiny_voice` instead."""
    from piper_tpu.engine.runtime import PiperRuntime

    return PiperRuntime(*tiny_voice)
