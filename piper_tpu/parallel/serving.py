"""Sharded batched synthesis across a device mesh.

Weights are replicated once (`jax.device_put` with a replicated sharding —
the multi-chip analog of the reference's persistent GPU weight-buffer cache,
GraphExecutor.swift:27); utterance batches are sharded over the `dp` mesh
axis so throughput scales with chips over ICI. The whole graph stays inside
one jit, so XLA inserts any needed collectives (there are none on the dp-only
path — it is embarrassingly parallel, which is the honest structure of TTS
serving).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from piper_tpu.models.vits import model as vits
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import Params
from piper_tpu.parallel.mesh import DATA_AXIS, batch_sharded, replicated


@dataclass
class ShardedVits:
    """A VITS model placed on a mesh for data-parallel batched serving."""

    mesh: Mesh
    params: Params
    hp: VitsHParams

    @classmethod
    def create(cls, mesh: Mesh, params: Params, hp: VitsHParams) -> "ShardedVits":
        placed = jax.device_put(params, replicated(mesh))
        return cls(mesh=mesh, params=placed, hp=hp)

    def infer_fn(self, max_frames: int, with_sid: bool = False):
        """Build a jitted, batch-sharded fused synthesis step.

        Inputs are expected sharded along batch (axis 0) over `dp`; the
        returned audio is sharded the same way.
        """
        hp = self.hp
        b_sh = batch_sharded(self.mesh)
        r_sh = replicated(self.mesh)

        def step(params, ids, lengths, dp_noise, main_noise, scales, sid=None):
            noise_scale, length_scale, noise_w = scales[0], scales[1], scales[2]
            return vits.infer(
                params, hp, ids, lengths, dp_noise, main_noise,
                max_frames=max_frames,
                noise_scale=noise_scale,
                length_scale=length_scale,
                noise_w=noise_w,
                sid=sid,
            )

        in_shardings = (r_sh, b_sh, b_sh, b_sh, b_sh, r_sh) + ((b_sh,) if with_sid else ())
        fn = jax.jit(
            step if with_sid else (lambda p, i, l, d, m, s: step(p, i, l, d, m, s)),
            in_shardings=in_shardings,
            out_shardings=(b_sh, b_sh),
        )
        return fn

    def synthesize_batch(
        self,
        ids: np.ndarray,
        lengths: np.ndarray,
        *,
        max_frames: int,
        scales: Tuple[float, float, float] = (0.667, 1.0, 0.8),
        sid: Optional[np.ndarray] = None,
        seed: int = 1234,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Convenience wrapper: numpy in, numpy out, batch must be divisible
        by the dp mesh size."""
        b, p = ids.shape
        dp_size = self.mesh.shape[DATA_AXIS]
        if b % dp_size != 0:
            raise ValueError(f"batch {b} not divisible by dp mesh size {dp_size}")
        rng = np.random.default_rng(seed)
        dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
        main_noise = rng.standard_normal((b, self.hp.inter_channels, max_frames)).astype(
            np.float32
        )
        b_sh = batch_sharded(self.mesh)
        fn = self.infer_fn(max_frames, with_sid=sid is not None)
        args = [
            self.params,
            jax.device_put(jnp.asarray(ids, jnp.int32), b_sh),
            jax.device_put(jnp.asarray(lengths, jnp.int32), b_sh),
            jax.device_put(jnp.asarray(dp_noise), b_sh),
            jax.device_put(jnp.asarray(main_noise), b_sh),
            jnp.asarray(scales, jnp.float32),
        ]
        if sid is not None:
            args.append(jax.device_put(jnp.asarray(sid, jnp.int32), b_sh))
        audio, y_len = fn(*args)
        return np.asarray(audio), np.asarray(y_len)
