"""Device mesh construction for multi-chip serving.

The reference has no multi-device story (SURVEY.md §2.9); this layer is the
TPU-native obligation it implies: batched multi-utterance serving sharded
across a slice over ICI, with weights replicated (they are ~100 MB — far
below HBM) and the batch axis data-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "dp"
SEQ_AXIS = "sp"
TENSOR_AXIS = "tp"
PIPE_AXIS = "pp"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    seq_parallel: int = 1,
    tensor_parallel: int = 1,
    pipeline_parallel: int = 1,
) -> Mesh:
    """Build a (dp, sp, tp, pp) mesh. dp shards utterance batches; sp
    optionally shards the waveform/frame axis of very long outputs; tp
    optionally shards the vocoder/flow channel axes (Megatron-style) to cut
    single-utterance latency when chips outnumber concurrent requests; pp
    optionally pipelines the decode graph stage-by-stage (parallel/pp.py).

    pp is the innermost axis so pipeline neighbors are ICI neighbors —
    stage-to-stage ppermutes are the latency-critical collective."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    inner = seq_parallel * tensor_parallel * pipeline_parallel
    if n_devices % inner != 0:
        raise ValueError(
            f"n_devices {n_devices} not divisible by seq_parallel "
            f"{seq_parallel} * tensor_parallel {tensor_parallel} * "
            f"pipeline_parallel {pipeline_parallel}"
        )
    grid = np.asarray(devices).reshape(
        n_devices // inner, seq_parallel, tensor_parallel, pipeline_parallel
    )
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, TENSOR_AXIS, PIPE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across dp."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))
