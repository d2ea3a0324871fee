"""Process memory-mapping hygiene for long-lived JAX processes.

Every live JIT-compiled XLA:CPU module holds ~3 anonymous mappings per
device (code/rodata/data pages from the ORC JIT), and Linux bounds a
process's mappings by vm.max_map_count (default 65530). A process that
keeps compiling programs for its whole lifetime — the single-process test
suite (~443 tests), or a serving process cycling many voices/program
grids — eventually crosses the limit, at which point mmap fails inside
XLA's AOT loader/serializer, which does not check the failure and
SIGSEGVs (root-caused round 5: the suite died deterministically at 65156
mappings inside jax's compilation-cache (de)serialization; measured ~24
mappings per 8-device mesh program, all released by jax.clear_caches()).

`clear_jit_caches_if_crowded` is the guard: call it at natural boundaries
(between test modules, after unloading a voice, on a maintenance tick).
Cleared jit wrappers transparently recompile — or deserialize from the
persistent compilation cache — on their next call.
"""

from __future__ import annotations

import gc

import jax

# Default trip point: comfortably below the Linux default vm.max_map_count
# of 65530, high enough that steady-state serving never trips it.
DEFAULT_THRESHOLD = 45_000


def map_count() -> int:
    """This process's current memory-mapping count (0 where /proc is
    absent — the vm.max_map_count limit is Linux-only too)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def clear_jit_caches_if_crowded(threshold: int = DEFAULT_THRESHOLD) -> bool:
    """Release compiled-executable mappings when the process nears
    vm.max_map_count: jax.clear_caches() drops every cached executable
    (live jit wrappers recompile/deserialize on next use) and gc reaps
    the unreferenced buffers. Returns True when a clear ran."""
    if map_count() <= threshold:
        return False
    jax.clear_caches()
    gc.collect()
    return True
