"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic can be
exercised without TPU hardware (and without paying TPU compile latency for
tiny test shapes). Must run before jax initializes its backends.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo importable without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
