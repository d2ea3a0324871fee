"""Tensor parallelism: channel-sharded vocoder/flow weights over the `tp`
mesh axis.

The reference is single-device (SURVEY.md §2.9), so — like dp and sp — this
layer is a TPU-native obligation, not a port: when chips outnumber concurrent
requests, sharding the HiFi-GAN channel axes cuts single-utterance latency
instead of leaving the extra chips idle.

Design: GSPMD-style. We only annotate the WEIGHTS with Megatron-style
column/row `PartitionSpec`s and let XLA's partitioner propagate shardings
through the (unchanged) model code and insert the ICI collectives — the
idiomatic JAX formulation, vs hand-written per-layer all-reduces:

- `dec.conv_pre` / `dec.cond`: column-parallel (output channels sharded) —
  their outputs add, so both shard the same way.
- `dec.ups.{i}` (conv_transpose, weight layout (C_in, C_out, K)): column on
  C_out, so each level's activation enters the resblocks channel-sharded.
- ResBlock1 pairs: `convs1` column (C_out), `convs2` row (C_in, bias added
  after the psum) — the classic pairing that needs ONE collective per pair.
- `dec.conv_post`: row-parallel on C_in (it reduces C -> 1).
- Flow WaveNet layers: `in_layers` column / `res_skip_layers` row per layer.

Every rule checks divisibility: a channel dim not divisible by the tp size
stays replicated (correct, just not sharded), so odd voices and large tp
degrade gracefully rather than erroring.

The text encoder / duration predictor stay replicated: they are a few ms of
the budget and their token-axis seams (relative attention, spline flows)
don't pay for collectives at these sizes.
"""

from __future__ import annotations

from typing import Dict

from jax.sharding import Mesh, NamedSharding, PartitionSpec

from piper_tpu.parallel.mesh import TENSOR_AXIS

P = PartitionSpec


def _spec_for(name: str, shape, tp: int) -> PartitionSpec:
    """Megatron column/row spec for one named weight, or replicated."""

    def col(axis: int) -> PartitionSpec:
        # Shard `axis` over tp when divisible; else replicate.
        if shape[axis] % tp != 0:
            return P()
        spec = [None] * len(shape)
        spec[axis] = TENSOR_AXIS
        return P(*spec)

    parts = name.split(".")
    leaf = parts[-1]  # "weight" | "bias"
    if name.startswith("dec."):
        kind = parts[1]
        if kind in ("conv_pre", "cond"):
            # Bias is 1-D over output channels -> same column sharding.
            return col(0)
        if kind == "ups":
            # conv_transpose weight is (C_in, C_out, K): column on C_out.
            return col(1) if leaf == "weight" else col(0)
        if kind == "resblocks":
            # Name shape: dec.resblocks.{i}.convs1.{j}.weight
            conv = parts[3]
            if conv == "convs1" or conv == "convs":
                # ResBlock2's single conv ("convs") is column-parallel too;
                # its residual add costs one gather, still a net win on the
                # wide early levels. Weight axis 0 and the 1-D bias are both
                # output channels.
                return col(0)
            if conv == "convs2":
                # Row-parallel: C_in sharded, output is a partial sum; the
                # bias must be added once, after the psum -> replicated.
                return col(1) if leaf == "weight" else P()
        if kind == "conv_post":
            return col(1) if leaf == "weight" else P()
        return P()
    if ".enc.in_layers." in name:
        return col(0)
    if ".enc.res_skip_layers." in name:
        return col(1) if leaf == "weight" else P()
    return P()


def resolve_pallas_under_tp(tp_size: int, requested):
    """The one place the "tp disables Pallas" rule lives: Pallas kernels are
    single-device programs GSPMD cannot partition, so under tp the conv path
    must stay on XLA's lowering. An EXPLICIT use_pallas=True request is a
    contradiction and raises rather than being silently ignored; None/False
    pass through (None resolves to False so callers needn't re-check)."""
    if tp_size <= 1:
        return requested
    if requested:
        raise ValueError(
            "use_pallas=True is impossible on a tensor-parallel mesh: Pallas "
            "kernels are single-device programs that GSPMD cannot partition "
            "across tp shards; drop use_pallas or build the mesh with "
            "tensor_parallel=1"
        )
    return False


def tp_param_shardings(
    params: Dict[str, object], mesh: Mesh
) -> Dict[str, NamedSharding]:
    """Per-leaf NamedShardings for `jax.device_put`: tp-sharded vocoder/flow
    channels, everything else replicated (over ALL mesh axes — dp/sp see
    full copies either way)."""
    tp = int(mesh.shape.get(TENSOR_AXIS, 1))
    out: Dict[str, NamedSharding] = {}
    for name, arr in params.items():
        spec = _spec_for(name, arr.shape, tp) if tp > 1 else P()
        out[name] = NamedSharding(mesh, spec)
    return out
