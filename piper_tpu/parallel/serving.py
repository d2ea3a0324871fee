"""Sharded batched synthesis across a device mesh.

Weights are placed once (`jax.device_put` — the multi-chip analog of the
reference's persistent GPU weight-buffer cache, GraphExecutor.swift:27):
replicated on dp/sp meshes, channel-sharded Megatron-style under a tp axis
(parallel/tp.py). Utterance batches are sharded over the `dp` mesh axis so
throughput scales with chips over ICI. The whole graph stays inside one jit,
so XLA inserts any needed collectives — none on the dp-only path (it is
embarrassingly parallel, which is the honest structure of TTS serving), the
GSPMD-derived psums/all-gathers under tp.
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
from piper_tpu.models.vits.hparams import VitsHParams, receptive_field_frames
from piper_tpu.models.vits.params import Params
from piper_tpu.parallel.mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    TENSOR_AXIS,
    batch_sharded,
    replicated,
)


@dataclass
class ShardedVits:
    """A VITS model placed on a mesh for data-parallel batched serving.

    Precision mirrors PiperRuntime: `precision` pins the global matmul tier
    (WITHOUT this, TPU matmuls on fp32 inputs run at jax's implicit DEFAULT
    = single-pass bf16 — the tier that breaks the 1e-3 fidelity gate);
    `vocoder_precision` / `flow_precision` scope the calibrated cheaper
    tiers to their stages (docs/BENCH.md calibration tables)."""

    mesh: Mesh
    params: Params
    hp: VitsHParams
    precision: str = "highest"
    vocoder_precision: Optional[str] = None
    flow_precision: Optional[str] = None
    use_pallas: Optional[bool] = None

    def __post_init__(self) -> None:
        # Compiled-fn caches: jax.jit objects are cheap to *call* but a fresh
        # one per call retraces/recompiles every time. Keyed the same way
        # PiperRuntime._build_jits keys its programs.
        self._infer_fns: dict = {}
        self._sp_decode_fns: dict = {}
        self._pp_decode_fns: dict = {}
        self._enc_fns: dict = {}
        self._tp_size = int(self.mesh.shape.get(TENSOR_AXIS, 1))
        from piper_tpu.parallel.mesh import PIPE_AXIS

        self._pp_size = int(self.mesh.shape.get(PIPE_AXIS, 1))
        from piper_tpu.parallel.tp import resolve_pallas_under_tp

        self.use_pallas = resolve_pallas_under_tp(self._tp_size, self.use_pallas)
        if self.use_pallas is None:
            self.use_pallas = jax.default_backend() == "tpu"

    @classmethod
    def create(cls, mesh: Mesh, params: Params, hp: VitsHParams,
               **options) -> "ShardedVits":
        if int(mesh.shape.get(TENSOR_AXIS, 1)) > 1:
            from piper_tpu.parallel.tp import tp_param_shardings

            shardings = tp_param_shardings(params, mesh)
            placed = {
                name: jax.device_put(arr, shardings[name])
                for name, arr in params.items()
            }
        else:
            placed = jax.device_put(params, replicated(mesh))
        return cls(mesh=mesh, params=placed, hp=hp, **options)

    def infer_fn(self, max_frames: int, with_sid: bool = False):
        """Return the jitted, batch-sharded fused synthesis step for this
        (max_frames, with_sid) — cached, so repeated serving calls reuse the
        compiled program instead of retracing.

        Inputs are expected sharded along batch (axis 0) over `dp`; the
        returned audio is sharded the same way.
        """
        if self._pp_size > 1:
            # Mirrors PiperRuntime's pp rejection (engine/runtime.py): a
            # whole-graph jit on a pp mesh would run the full graph
            # REPLICATED across the pp axis — correct output, idle devices.
            raise NotImplementedError(
                "fused whole-graph inference on a pipeline_parallel mesh "
                "would idle the pp devices; use synthesize_pipelined, or "
                "build the mesh with pipeline_parallel=1"
            )
        key = (int(max_frames), bool(with_sid))
        cached = self._infer_fns.get(key)
        if cached is not None:
            return cached
        hp = self.hp
        b_sh = batch_sharded(self.mesh)
        r_sh = replicated(self.mesh)

        def step(params, ids, lengths, dp_noise, main_noise, scales, sid=None):
            noise_scale, length_scale, noise_w = scales[0], scales[1], scales[2]
            with jax.default_matmul_precision(self.precision):
                return vits.infer(
                    params, hp, ids, lengths, dp_noise, main_noise,
                    max_frames=max_frames,
                    noise_scale=noise_scale,
                    length_scale=length_scale,
                    noise_w=noise_w,
                    sid=sid,
                    vocoder_precision=self.vocoder_precision,
                    flow_precision=self.flow_precision,
                    use_pallas=self.use_pallas,
                )

        # Params get NO in_sharding constraint (None = keep the arrays'
        # placement): replicated normally, channel-sharded under tp — a
        # replicated constraint here would silently all-gather the tp shards.
        in_shardings = (None, b_sh, b_sh, b_sh, b_sh, r_sh) + ((b_sh,) if with_sid else ())
        fn = jax.jit(
            step if with_sid else (lambda p, i, l, d, m, s: step(p, i, l, d, m, s)),
            in_shardings=in_shardings,
            out_shardings=(b_sh, b_sh),
        )
        self._infer_fns[key] = fn
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

    # -- cached encoder programs --------------------------------------------

    def encode_fn(self, length_scale: float, noise_w: float, *,
                  keyed: bool = False):
        """Return the jitted replicated/dp-sharded encoder for these scales —
        cached, so repeated pipelined/long serving calls reuse the compiled
        program instead of retracing per call (advisor r3 finding).

        keyed=False: fn(params, ids, lengths, dp_noise, sid) with host-drawn
        dp noise (synthesize_pipelined's derivation). keyed=True:
        fn(params, ids, lengths, sid, seed) drawing row-invariant dp noise
        in-graph from `seed` (synthesize_long's derivation)."""
        key = (float(length_scale), float(noise_w), bool(keyed))
        cached = self._enc_fns.get(key)
        if cached is not None:
            return cached
        hp = self.hp
        ls, nw = float(length_scale), float(noise_w)

        if keyed:
            def enc_fn(params, ids_j, lengths_j, sid_j, seed):
                base = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
                # Per-row draw broadcast over the batch — matches the
                # runtime's row-invariant derivation (encode_keyed);
                # bit-identical at b=1.
                dp_noise = jnp.broadcast_to(
                    jax.random.normal(base, (2, ids_j.shape[1])),
                    (ids_j.shape[0], 2, ids_j.shape[1]))
                # Encoder stays at the global tier (duration-ceil safety —
                # the same reason PiperRuntime never lowers the encode path).
                with jax.default_matmul_precision(self.precision):
                    return vits.encode(params, hp, ids_j, lengths_j, dp_noise,
                                       length_scale=ls, noise_w=nw, sid=sid_j)
        else:
            def enc_fn(params, ids_j, lengths_j, dp_noise_j, sid_j):
                with jax.default_matmul_precision(self.precision):
                    return vits.encode(params, hp, ids_j, lengths_j,
                                       dp_noise_j, length_scale=ls,
                                       noise_w=nw, sid=sid_j)

        fn = jax.jit(enc_fn)
        self._enc_fns[key] = fn
        return fn

    # -- sequence-parallel decode (long outputs) ----------------------------

    def sp_decode_fn(self, span: int, halo: Optional[int] = None,
                     use_pallas: Optional[bool] = None):
        """Return the jitted sequence-parallel decode over the `sp` mesh axis
        for this (span, halo) — cached like infer_fn. `use_pallas` routes the
        vocoder's narrow convs through the fused Pallas kernels (None = auto:
        on for the TPU backend only).

        Each sp shard decodes a contiguous block of `span` frames using the
        same haloed-window formulation as streaming (model.decode_window), so
        shard boundaries are exact; audio shards concatenate along time via
        the output sharding. The waveform axis is the natural shard axis for
        very long outputs (SURVEY.md §5.7).

        Returns fn(enc, seed, total_frames, noise_scale) -> audio
        (B, n_sp * span * hop), sharded over sp on the time axis.
        """
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map

        if self._tp_size > 1:
            raise NotImplementedError(
                "sequence-parallel decode needs replicated params; build the "
                "mesh with tensor_parallel=1 (tp composes with dp, not sp)"
            )
        if self._pp_size > 1:
            raise NotImplementedError(
                "sequence-parallel decode on a pipeline_parallel mesh would "
                "idle the pp devices; use synthesize_pipelined, or build the "
                "mesh with pipeline_parallel=1"
            )
        hp = self.hp
        h = receptive_field_frames(hp) if halo is None else int(halo)
        if use_pallas is None:
            use_pallas = self.use_pallas
        key = (int(span), h, bool(use_pallas))
        cached = self._sp_decode_fns.get(key)
        if cached is not None:
            return cached
        window = span + 2 * h
        hop = hp.hop_length
        mesh = self.mesh

        def shard_fn(params, enc, seed, total_frames, noise_scale):
            idx = jax.lax.axis_index(SEQ_AXIS)
            t_offset = idx * span - h
            base = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
            t_idx = t_offset + jnp.arange(window)
            noise = vits.per_frame_noise(base, t_idx, enc.m_p.shape[0], enc.m_p.shape[1])
            with jax.default_matmul_precision(self.precision):
                audio = vits.decode_window(
                    params, hp, enc, noise, t_offset,
                    window=window, total_frames=total_frames,
                    noise_scale=noise_scale, use_pallas=use_pallas,
                    vocoder_precision=self.vocoder_precision,
                    flow_precision=self.flow_precision,
                )
            return audio[:, h * hop : (h + span) * hop]

        mapped = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=P(None, SEQ_AXIS),
            check_vma=False,
        )
        fn = jax.jit(lambda enc, seed, total, ns: mapped(self.params, enc, seed, total, ns))
        self._sp_decode_fns[key] = fn
        return fn

    # -- pipeline-parallel decode (stage-sharded graph) ----------------------

    def pp_decode_fn(self, max_frames: int, rows_per_dp: int,
                     with_g: bool = False,
                     microbatches: Optional[int] = None,
                     noise_scale: float = 0.667):
        """Return the jitted GPipe-style pipelined decode over the `pp` mesh
        axis (parallel/pp.py) for this shape — cached like infer_fn.

        fn(params, m_p, logs_p, x_mask, w_ceil, main_noise[, g]) ->
        (audio, y_lengths), batch axes sharded over dp."""
        from piper_tpu.parallel.mesh import PIPE_AXIS
        from piper_tpu.parallel.pp import build_pp_decode

        if self._tp_size > 1:
            raise NotImplementedError(
                "pipeline-parallel decode needs replicated params; build the "
                "mesh with tensor_parallel=1 (pp composes with dp, not tp)")
        if int(self.mesh.shape.get(PIPE_AXIS, 1)) < 2:
            raise ValueError("mesh has no pp axis; build it with "
                             "pipeline_parallel >= 2")
        # Resolve the default BEFORE keying, so microbatches=None and an
        # explicit value equal to the default share one compiled program.
        if microbatches is None:
            from piper_tpu.parallel.pp import default_microbatches

            microbatches = default_microbatches(
                int(rows_per_dp), int(self.mesh.shape[PIPE_AXIS]))
        key = (int(max_frames), int(rows_per_dp), bool(with_g),
               int(microbatches), float(noise_scale))
        cached = self._pp_decode_fns.get(key)
        if cached is not None:
            return cached
        call = build_pp_decode(
            self.mesh, self.hp, max_frames=max_frames,
            rows_per_dp=rows_per_dp, microbatches=microbatches,
            with_g=with_g, noise_scale=noise_scale,
            vocoder_precision=self.vocoder_precision,
            flow_precision=self.flow_precision, precision=self.precision)
        fn = jax.jit(call)
        self._pp_decode_fns[key] = fn
        return fn

    def synthesize_pipelined(
        self,
        ids: np.ndarray,
        lengths: np.ndarray,
        *,
        max_frames: int,
        scales: Tuple[float, float, float] = (0.667, 1.0, 0.8),
        sid: Optional[np.ndarray] = None,
        seed: int = 1234,
        microbatches: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode (replicated), then decode through the stage pipeline.

        Noise derivation matches synthesize_batch exactly, so at equal
        (ids, seed, max_frames) the pipelined audio must equal the dp-sharded
        fused audio to float associativity."""
        b, p = ids.shape
        dp_size = self.mesh.shape[DATA_AXIS]
        if b % dp_size != 0:
            raise ValueError(f"batch {b} not divisible by dp mesh size {dp_size}")
        ns, ls, nw = scales
        rng = np.random.default_rng(seed)
        dp_noise = rng.standard_normal((b, 2, p)).astype(np.float32)
        main_noise = rng.standard_normal(
            (b, self.hp.inter_channels, max_frames)).astype(np.float32)
        b_sh = batch_sharded(self.mesh)

        sid_j = (jax.device_put(jnp.asarray(sid, jnp.int32), b_sh)
                 if sid is not None else None)
        enc = self.encode_fn(ls, nw)(
            self.params,
            jax.device_put(jnp.asarray(ids, jnp.int32), b_sh),
            jax.device_put(jnp.asarray(lengths, jnp.int32), b_sh),
            jax.device_put(jnp.asarray(dp_noise), b_sh),
            sid_j,
        )
        fn = self.pp_decode_fn(max_frames, b // dp_size,
                               with_g=enc.g is not None,
                               microbatches=microbatches, noise_scale=ns)
        args = [self.params, enc.m_p, enc.logs_p, enc.x_mask, enc.w_ceil,
                jax.device_put(jnp.asarray(main_noise), b_sh)]
        if enc.g is not None:
            args.append(enc.g)
        audio, y_len = fn(*args)
        return np.asarray(audio), np.asarray(y_len)

    def synthesize_long(
        self,
        ids: np.ndarray,
        lengths: np.ndarray,
        *,
        span: int,
        scales: Tuple[float, float, float] = (0.667, 1.0, 0.8),
        seed: int = 1234,
        sid: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode once (replicated), then decode with the frame axis sharded
        over `sp`. Covers total_frames = n_sp * span."""
        if self._tp_size > 1:
            # Fail BEFORE the encoder jit below — compiling it just to raise
            # inside sp_decode_fn would waste tens of device seconds.
            raise NotImplementedError(
                "sequence-parallel decode needs replicated params; build the "
                "mesh with tensor_parallel=1 (tp composes with dp, not sp)"
            )
        ns, ls, nw = scales
        r_sh = replicated(self.mesh)

        ids_j = jax.device_put(jnp.asarray(ids, jnp.int32), r_sh)
        lengths_j = jax.device_put(jnp.asarray(lengths, jnp.int32), r_sh)
        sid_j = jax.device_put(jnp.asarray(sid, jnp.int32), r_sh) if sid is not None else None
        enc = self.encode_fn(ls, nw, keyed=True)(
            self.params, ids_j, lengths_j, sid_j, jnp.uint32(seed))

        n_sp = self.mesh.shape[SEQ_AXIS]
        total = n_sp * span
        fn = self.sp_decode_fn(span)
        audio = fn(enc, jnp.uint32(seed), jnp.int32(total), jnp.float32(ns))
        y_len = np.clip(np.asarray(enc.y_total).astype(np.int64), 1, total)
        return np.asarray(audio), y_len
