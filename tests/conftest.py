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

# Make the repo importable without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
