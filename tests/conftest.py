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
    # The pre-fingerprint dir may hold another machine's code: remove it —
    # but only when it looks idle (mtime > 1 h old). A concurrent pytest
    # run from an older checkout still writes there; deleting it mid-run
    # silently forces minutes of recompiles on this 1-vCPU box.
    _legacy = _cache_root / "test-jit-cache"
    if _legacy.is_dir():
        import shutil
        import time as _time

        if _time.time() - _legacy.stat().st_mtime > 3600:
            shutil.rmtree(_legacy, ignore_errors=True)
    _cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

# Make the repo importable without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

# -- vm.max_map_count guard ---------------------------------------------------
# Root cause of the round-4 full-suite segfault (deterministic, test ~388,
# inside XLA executable (de)serialization): every live JIT'd XLA:CPU module
# holds ~3 anonymous mappings PER DEVICE (code/rodata/data), the suite
# accumulates compiled programs for its whole lifetime, and at ~443 tests the
# process crosses the kernel's default vm.max_map_count (65530). mmap then
# fails inside XLA's AOT loader/serializer, which does not check the failure
# -> SIGSEGV. Measured: the crash fired at 65156 mappings; prefix halves of
# the suite (~35k maps each) pass; jax.clear_caches() + gc releases the
# mappings (probe: 8-device mesh programs cost ~24 maps each, all released)
# and live jit wrappers transparently recompile/deserialize on next call.
# The guard clears between test modules whenever the count nears the limit.

_MAP_HARD_BOUND = 60_000


@pytest.fixture(autouse=True, scope="module")
def _map_count_guard():
    yield
    from piper_tpu.utils.procmaps import clear_jit_caches_if_crowded, map_count

    if clear_jit_caches_if_crowded():
        # If clearing no longer releases enough, fail LOUDLY here instead
        # of segfaulting inside XLA a few modules later.
        n = map_count()
        assert n < _MAP_HARD_BOUND, (
            f"{n} memory mappings remain after jax.clear_caches() — "
            f"approaching vm.max_map_count; the suite would segfault "
            f"inside XLA executable (de)serialization soon")


@pytest.fixture(autouse=True, scope="module")
def _no_leaked_piper_threads(request):
    """No piper-* worker thread may survive its test module (round-4
    VERDICT: three StreamingServer workers from long-finished modules were
    alive at the suite's segfault — a leaked device-driving thread races
    later compilations in the process). Every server worker is named
    piper-* so leaks are attributable."""
    yield
    import threading
    import time

    def leaked():
        return [t for t in threading.enumerate()
                if t.name.startswith("piper-") and t.is_alive()]

    deadline = time.monotonic() + 5.0
    ts = leaked()
    while ts and time.monotonic() < deadline:
        time.sleep(0.05)
        ts = leaked()
    assert not ts, (
        f"{request.module.__name__} leaked piper worker threads: "
        f"{sorted(t.name for t in ts)}")


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
