"""PiperRuntime: the public synthesis facade.

Mirrors the reference's PiperMetalRuntime surface (PiperMetalRuntime.swift:
44-124): load a voice (by id or paths), `synthesize(phoneme_ids, scales) ->
float32 PCM`, streaming synthesis, and per-run timings. Under the hood the
whole VITS graph runs as two jit-compiled programs per shape bucket —
encode (phoneme axis) and decode (frame axis) — with the frame bucket chosen
on the host from the predicted durations. Steady-state runs therefore have
zero recompiles and a single scalar host transfer (the frame count); the
reference's flush-count metric maps to `RunTimings.compile_count` +
`host_transfers` here (SURVEY.md §5.8).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from piper_tpu.core.audio import AudioChunk, AudioFormat
from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS
from piper_tpu.core.config import VoiceConfig
from piper_tpu.core.voices import VoiceManager
from piper_tpu.engine.bucketing import (
    DEFAULT_FRAME_BUCKETS,
    DEFAULT_PHONEME_BUCKETS,
    BucketOverflowError,
    bucket_for,
    pad_to,
)
from piper_tpu.models.vits import model as vits
from piper_tpu.models.vits.hparams import VitsHParams, derive_hparams
from piper_tpu.models.vits.params import Params
from piper_tpu.onnx import load_model


def parse_precision_spec(spec):
    """Parse a precision-tier spec string — THE one grammar for the CLI,
    env flags, and bench: 'none'/'' -> None (inherit), a single tier name,
    or a comma list of per-level tiers with 'none'/'' items meaning
    'inherit' for that level. Whitespace around items is ignored."""
    if spec is None:
        return None
    spec = spec.strip()
    if spec in ("", "none"):
        return None
    parts = [t.strip() for t in spec.split(",")]
    if len(parts) == 1:
        return parts[0]
    return tuple(None if t in ("", "none") else t for t in parts)


@dataclass(frozen=True)
class RuntimeOptions:
    """Knobs mirroring PiperMetalRuntime.Options (PiperMetalRuntime.swift:11-28)
    plus TPU-specific precision/bucketing controls."""

    seed: int = 1234  # the reference's fixed RandomNormalLike seed
    # Matmul/conv precision tier:
    #   "highest" — fp32-equivalent (6-pass bf16); meets the <=1e-3 waveform
    #               gate (measured 4.4e-4 vs the oracle on TPU)
    #   "high"    — 3-pass bf16 (~tf32 accuracy); measured 2.7e-3
    #   "default" — single-pass bf16 inputs; NOT fidelity-safe for this model
    #   "bfloat16"— bf16 weights + activations end to end; throughput-only:
    #               durations may round differently and the waveform diverges
    #               audibly from fp32 (use for capacity, never for fidelity)
    precision: str = "highest"
    # Separate precision for the HiFi-GAN vocoder stage: a single tier name or
    # a per-upsample-level tuple (None = same as `precision`). The vocoder
    # carries ~90% of the FLOPs but its error feeds a bounded tanh output, so
    # (especially the late small-channel levels) it tolerates lower tiers
    # than the flows.
    vocoder_precision: Union[str, Tuple[Optional[str], ...], None] = None
    # Separate precision for the reverse residual-coupling flows (decode
    # side only — the encoder/duration path stays at `precision`: a duration
    # error can flip a ceil() and shift the whole waveform, while flow error
    # feeds the bounded vocoder). None = same as `precision`.
    flow_precision: Optional[str] = None
    # Execution mode:
    #   "split" — encode / decode as two programs with an exact host-chosen
    #             frame bucket (2 host round trips per call)
    #   "fused" — one program with a heuristic frame budget and a single
    #             host round trip; falls back to split when the budget is
    #             exceeded. Lowest latency on high-RTT device links.
    mode: str = "split"
    fused_frames_per_phoneme: int = 6  # fused-mode frame budget heuristic
    # Fused Pallas kernels for the narrow vocoder convs (measured 1.4-2.9x
    # over XLA's conv lowering on TPU). None = auto: on for the TPU backend,
    # off elsewhere; PIPER_TPU_NO_PALLAS=1 also disables.
    use_pallas: Optional[bool] = None
    phoneme_buckets: Tuple[int, ...] = tuple(DEFAULT_PHONEME_BUCKETS)
    frame_buckets: Tuple[int, ...] = tuple(DEFAULT_FRAME_BUCKETS)
    # Batch-axis bucket ladder: batched calls pad the ROW axis up to the
    # next bucket (dummy rows copy row 0; their outputs are dropped), so a
    # continuous batcher whose group sizes vary request-to-request reuses a
    # bounded set of compiled programs instead of compiling one per distinct
    # group size (20-40 s each on TPU — a compile storm under real traffic).
    # Powers of two up to 32, then measured mid rungs: the padding-tax
    # measurement (tools/padding_tax.py, docs/BENCH.md) found <=8% dummy-row
    # waste below 32 rows (fixed per-group overhead dominates) but 16-26%
    # for 33-48-row groups padded to 64, so 48 and 96 break the widest gaps.
    # Each extra rung multiplies the (batch x phoneme-bucket x frame-bucket)
    # program grid a serving deployment must warm; BatchingServer therefore
    # pins its own <=3-rung serving grid (engine/batcher.py::_rungs) rather
    # than prewarming this full ladder.
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 48, 64, 96, 128)
    # PCM sample format the synthesis programs EMIT. "int16" converts on
    # device (clip*32767, the exact float_to_int16 semantics) so the
    # device->host fetch moves half the bytes — the wire/WAV format is 16-bit
    # PCM anyway (reference: WavFileWriter writes Int16). "float32" keeps the
    # raw float waveform (the fidelity-gate/test format).
    output_dtype: str = "float32"

    @staticmethod
    def from_env() -> "RuntimeOptions":
        """Default options with PIPER_TPU_PRECISION / PIPER_TPU_MODE applied."""
        from piper_tpu.utils.env import flag

        kwargs = {}
        if flag("PIPER_TPU_PRECISION"):
            kwargs["precision"] = flag("PIPER_TPU_PRECISION")
        if flag("PIPER_TPU_MODE"):
            kwargs["mode"] = flag("PIPER_TPU_MODE")
        vp = flag("PIPER_TPU_VOCODER_PRECISION")
        if vp:
            kwargs["vocoder_precision"] = parse_precision_spec(vp)
        fp = flag("PIPER_TPU_FLOW_PRECISION")
        if fp:
            kwargs["flow_precision"] = parse_precision_spec(fp)
        return RuntimeOptions(**kwargs)


@dataclass
class RunTimings:
    """Per-run accounting (reference: RunTimings, GraphExecutor.swift:29-38)."""

    wall_ms: float = 0.0
    encode_ms: float = 0.0
    decode_ms: float = 0.0
    phoneme_bucket: int = 0
    frame_bucket: int = 0
    frames: int = 0
    samples: int = 0
    compiled: bool = False  # did this run trigger a compile
    compile_count: int = 0  # cumulative program count so far
    rtf: float = 0.0  # real-time factor (audio seconds per wall second)


# In-PROCESS program-set sharing across runtimes: the jitted programs
# built by _build_jits close over nothing but (hparams, precision knobs,
# pallas flag, output dtype) — weights are ARGUMENTS — so two runtimes of
# the same architecture and options can share one set of compiled
# programs. Without this, every PiperRuntime instance retraces and
# recompiles the identical grid (measured ~8 s/program on the 1-vCPU dev
# host): a MultiVoiceBatchingServer with N same-arch voices paid N fold
# prewarm, and add_voice of a same-arch voice re-warmed programs the
# process already held. Entries live for the process (voices unload
# rarely; executables are tens of MB per grid).
_PROGRAM_SETS: dict = {}


def program_set_count() -> int:
    """Resident shared program sets (one per (arch, precision/options)
    combination seen this process). Exposed for capacity monitoring."""
    return len(_PROGRAM_SETS)


def evict_program_sets() -> int:
    """Drop every shared program set; returns the number evicted. The
    underlying executables free once no live runtime still references
    its jitted programs (each runtime keeps its own handles). Long-lived
    multi-architecture deployments call this after retiring an
    architecture — _PROGRAM_SETS otherwise grows for the process
    lifetime (documented; one entry is a tuple of jit wrappers, tens of
    MB of executables per grid once compiled)."""
    import gc

    n = len(_PROGRAM_SETS)
    _PROGRAM_SETS.clear()
    gc.collect()
    return n




def _freeze(v):
    """Hashable view of hparams/option values (lists -> tuples, recursively)."""
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


_jit_cache_enabled = False


def _enable_persistent_jit_cache() -> None:
    """Persist compiled programs across processes (compiles cost 20-40s on
    TPU; the reference's analog is its runtime-compiled-pipeline cache,
    MetalContext.swift:20-50 — ours survives restarts)."""
    global _jit_cache_enabled
    if _jit_cache_enabled:
        return
    _jit_cache_enabled = True
    import os

    if os.environ.get("PIPER_TPU_NO_JIT_CACHE") == "1":
        return
    from piper_tpu.utils.env import cache_root

    cache_dir = Path(cache_root()) / "jit-cache"
    try:
        # TPU-only: cached CPU AOT executables can carry machine features the
        # loading host lacks (observed "+prefer-no-scatter ... could lead to
        # SIGILL" warnings when the remote compile helper differs from the
        # host), so CPU runs always compile fresh.
        if jax.default_backend() != "tpu":
            return
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass



def _seed_u32(seed) -> int:
    """Any Python int -> uint32 range. Negative seeds (legal caller input)
    wrap mod 2**32 like C casts; numpy 2 raises OverflowError otherwise."""
    return int(seed) & 0xFFFFFFFF


def resolve_speaker(spec, n_speakers: int,
                    speaker_id_map=None) -> int:
    """Speaker reference -> validated integer id. Integers (and digit
    strings) pass through; other strings look up the voice's
    speaker_id_map by NAME — the `speaker_id_map` field real multi-speaker
    exports carry (reference PiperConfig.swift:36) but the reference never
    consumes."""
    if isinstance(spec, bool):
        raise ValueError(f"speaker {spec!r} is not an id or name")
    if isinstance(spec, (int, np.integer)):
        sid = int(spec)
    elif isinstance(spec, str):
        s = spec.strip()
        m = speaker_id_map or {}
        if s in m:
            # The MAP wins over integer parsing: real voices (libritts
            # exports) use numeric reader ids like "3922" as NAMES, mapping
            # to small indices — parsing them as indices would silently
            # select a different speaker.
            sid = int(m[s])
        else:
            try:
                sid = int(s)
            except ValueError:
                known = ", ".join(sorted(m)[:10]) if m else "none defined"
                raise ValueError(
                    f"unknown speaker {spec!r} (known names: {known})")
    else:
        raise ValueError(f"speaker {spec!r} is not an id or name")
    if not 0 <= sid < max(1, n_speakers):
        raise ValueError(
            f"speaker_id {sid} out of range [0, {max(1, n_speakers)})")
    return sid


def parse_mix_spec(spec: str) -> dict:
    """'k:w,k:w' -> {key: weight}: the ONE grammar for textual mix specs
    (CLI --speaker-mix, SSML <voice name=...> mixes). Keys become ints
    when they parse, otherwise stay NAMES for resolve_speaker_mix.
    Raises ValueError with the offending part."""
    raw: dict = {}
    for part in spec.split(","):
        bits = part.split(":")
        if len(bits) != 2 or not bits[0].strip():
            raise ValueError(
                f"bad mix entry {part!r} (use ID:WEIGHT or NAME:WEIGHT "
                f"pairs, e.g. '0:0.6,3:0.4')")
        key = bits[0].strip()
        try:
            key = int(key)
        except ValueError:
            pass  # a speaker NAME
        try:
            w = float(bits[1])
        except ValueError:
            raise ValueError(
                f"bad mix weight {bits[1]!r} in {part!r}") from None
        if key in raw:
            raise ValueError(f"mix names speaker {key} twice")
        raw[key] = w
    if not raw:
        raise ValueError("mix must name at least one speaker")
    return raw


def validate_scales(noise_scale: float, length_scale: float,
                    noise_w: float) -> None:
    """Synthesis-scale sanity shared by every door (runtime._scales, the
    serving submits): length_scale must be finite and > 0 (it multiplies
    phoneme durations — <= 0 produces zero/negative frame counts that
    clamp into silent or garbage audio rather than erroring); the noise
    scales must be finite and >= 0."""
    import math

    if not (math.isfinite(length_scale) and length_scale > 0):
        raise ValueError(f"length_scale must be > 0, got {length_scale}")
    for name, v in (("noise_scale", noise_scale), ("noise_w", noise_w)):
        if not (math.isfinite(v) and v >= 0):
            raise ValueError(f"{name} must be finite and >= 0, got {v}")


def validate_speaker_mix(mix: dict, n_speakers: int,
                         speaker_id=None) -> None:
    """Door-step validation of a speaker blending spec {id: weight} —
    shared by the runtime and both serving layers so a bad mix fails the
    ONE request, with the same message everywhere, before it can fail a
    whole batched group at dispatch. Pass the request's `speaker_id` too:
    the exclusivity rule lives here, not at each door."""
    import math

    if speaker_id is not None:
        raise ValueError("pass speaker_id OR speaker_mix, not both")
    if n_speakers <= 1:
        raise ValueError("speaker_mix requires a multi-speaker voice")
    if not mix:
        raise ValueError("speaker_mix must not be empty")
    any_nonzero = False
    seen = set()
    for s, w in mix.items():
        # Strict integer ids: a bare int() would silently truncate 1.5 ->
        # speaker 1 (and bool(True) -> 1). Keys must be integral numbers
        # (str keys arrive only via the HTTP layer, which coerces first).
        if isinstance(s, bool) or not (
                isinstance(s, (int, np.integer))
                or (isinstance(s, float) and s.is_integer())):
            raise ValueError(
                f"speaker_mix id {s!r} is not an integer speaker id")
        s, w = int(s), float(w)
        if s in seen:
            # Python dicts can't literally repeat a key, but {2: a, "2": b}
            # or {2: a, 2.0: b} normalize to the same speaker — last-write-
            # wins would silently drop a weight.
            raise ValueError(f"speaker_mix names speaker {s} twice")
        seen.add(s)
        if not 0 <= s < n_speakers:
            raise ValueError(
                f"speaker_mix id {s} out of range [0, {n_speakers})")
        if not math.isfinite(w):
            raise ValueError("speaker_mix weights must be finite")
        any_nonzero |= w != 0.0
    if not any_nonzero:
        raise ValueError("speaker_mix needs at least one non-zero weight")

class PiperRuntime:
    """Loads a Piper voice checkpoint and synthesizes speech on TPU/CPU."""

    def __init__(
        self,
        model_path: Union[str, Path],
        config_path: Union[str, Path, None] = None,
        options: Optional[RuntimeOptions] = None,
        mesh=None,
    ):
        """`mesh` (jax.sharding.Mesh, optional) turns this runtime into a
        multi-chip one: weights replicate across the mesh (channel-sharded
        instead when the mesh has a `tp` axis — parallel/tp.py), every
        batched program shards its rows over the `dp` axis, and the
        batch-bucket ladder is restricted to dp-divisible rungs — so the
        SAME serving stack (BatchingServer, ServingPipeline, bucketing,
        prewarm) drives a slice exactly the way it drives one chip
        (SURVEY.md §2.9's obligation is batched *serving* across chips)."""
        _enable_persistent_jit_cache()
        self.options = options or RuntimeOptions.from_env()
        self.mesh = mesh
        self.model_path = Path(model_path)
        if not self.model_path.exists():
            raise FileNotFoundError(f"model checkpoint not found: {self.model_path}")
        self.config_path = Path(config_path) if config_path else Path(str(model_path) + ".json")
        self.config = VoiceConfig.load(self.config_path)

        onnx_model = load_model(self.model_path)
        self.hparams: VitsHParams = derive_hparams(
            onnx_model.graph,
            sample_rate=self.config.audio.sample_rate,
            n_speakers=self.config.num_speakers,
        )
        dtype = jnp.bfloat16 if self.options.precision == "bfloat16" else jnp.float32
        # Weights go to device once (packed single transfer) and stay
        # resident (the analog of the reference's persistentF32Buffers cache,
        # GraphExecutor.swift:27). With a mesh they are placed across every
        # device instead: replicated on dp/sp meshes, channel-sharded under
        # tp (the ShardedVits.create placement).
        from piper_tpu.models.vits.params import device_put_packed, host_arrays_from_graph

        if mesh is not None:
            from piper_tpu.parallel.mesh import DATA_AXIS, TENSOR_AXIS, replicated

            if DATA_AXIS not in mesh.axis_names:
                raise ValueError(
                    f"mesh must have a '{DATA_AXIS}' axis (got {mesh.axis_names})"
                )
            from piper_tpu.parallel.mesh import PIPE_AXIS

            if int(mesh.shape.get(PIPE_AXIS, 1)) > 1:
                # The runtime's programs are whole-graph jits — they would
                # run replicated (correct, but idle) across a pp axis rather
                # than pipelined. The pipelined decode is an explicit
                # schedule; route callers to its API instead of silently
                # wasting the pp devices.
                raise NotImplementedError(
                    "PiperRuntime serves dp/tp meshes; for pipeline "
                    "parallelism use parallel.serving.ShardedVits."
                    "synthesize_pipelined on a pipeline_parallel mesh"
                )
            host = host_arrays_from_graph(onnx_model.graph)
            np_dtype = np.float32 if dtype == jnp.float32 else dtype
            self._tp_size = int(mesh.shape.get(TENSOR_AXIS, 1))
            if self._tp_size > 1:
                # Megatron-style channel sharding of the vocoder/flow weights
                # (parallel/tp.py); the jit programs carry no param
                # in_shardings, so GSPMD partitions them from this placement.
                from piper_tpu.parallel.tp import tp_param_shardings

                host = {k: np.asarray(v, np_dtype) for k, v in host.items()}
                shardings = tp_param_shardings(host, mesh)
                self.params: Params = {
                    k: jax.device_put(v, shardings[k]) for k, v in host.items()
                }
            else:
                self.params = {
                    k: jax.device_put(np.asarray(v, np_dtype), replicated(mesh))
                    for k, v in host.items()
                }
            self._dp_size = int(mesh.shape[DATA_AXIS])
        else:
            self.params = device_put_packed(
                host_arrays_from_graph(onnx_model.graph), dtype=dtype
            )
            self._dp_size = 1
            self._tp_size = 1
        del onnx_model

        import threading

        self._hbm_bytes: Optional[int] = None  # lazy; 0 once closed
        self._compiled_keys: set = set()
        # Serializes synthesis bookkeeping (_compiled_keys, profiler,
        # last_run_timings) for multi-threaded callers (pipeline fetchers,
        # batching server).
        self._lock = threading.RLock()
        self.last_run_timings: Optional[RunTimings] = None
        from piper_tpu.utils.env import profile_enabled, trace_enabled
        from piper_tpu.utils.profiling import Profiler

        self.profiler = Profiler()
        self._trace = trace_enabled()
        if profile_enabled():
            import atexit

            atexit.register(self._dump_profile)
        self._build_jits()

    def _dump_profile(self) -> None:
        import sys

        if self.profiler.stats:
            print(f"\n[piper-tpu profile] {self.model_path.name}:", file=sys.stderr)
            self.profiler.dump()

    # -- construction helpers -------------------------------------------------

    @classmethod
    def load_voice(
        cls,
        voice_id: str,
        options: Optional[RuntimeOptions] = None,
        manager: Optional[VoiceManager] = None,
    ) -> "PiperRuntime":
        """Download (or reuse cached) voice assets and load them."""
        manager = manager or VoiceManager()
        model_path, config_path = manager.ensure_voice(voice_id)
        return cls(model_path, config_path, options)

    def _matmul_precision(self) -> str:
        return "default" if self.options.precision == "bfloat16" else self.options.precision

    @property
    def batch_ladder(self) -> Tuple[int, ...]:
        """The effective batch-bucket ladder: on a mesh, only dp-divisible
        rungs (each device gets whole rows)."""
        ladder = self.options.batch_buckets
        if self._dp_size <= 1:
            return ladder
        out = tuple(x for x in ladder if x % self._dp_size == 0)
        return out or (self._dp_size,)

    def _put_batch(self, arr):
        """Place a batch-major array: sharded over dp on a mesh runtime,
        plain device array otherwise."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from piper_tpu.parallel.mesh import batch_sharded

        return jax.device_put(np.asarray(arr), batch_sharded(self.mesh))

    def _put_repl(self, arr):
        """Replicated placement (injected-noise test paths on a mesh run
        fully replicated — correctness over parallelism there)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from piper_tpu.parallel.mesh import replicated

        return jax.device_put(np.asarray(arr), replicated(self.mesh))

    def _resolve_pallas(self) -> bool:
        import os

        if os.environ.get("PIPER_TPU_NO_PALLAS") == "1":
            return False
        if getattr(self, "_tp_size", 1) > 1:
            from piper_tpu.parallel.tp import resolve_pallas_under_tp

            # False for the tp path; raises on an explicit use_pallas=True.
            return bool(resolve_pallas_under_tp(
                self._tp_size, self.options.use_pallas))
        if self.options.use_pallas is not None:
            return bool(self.options.use_pallas)
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # noqa: BLE001
            return False

    def _build_jits(self) -> None:
        hp = self.hparams
        prec = self._matmul_precision()
        voc_prec = self.options.vocoder_precision
        flow_prec = self.options.flow_precision
        use_pallas = self._resolve_pallas()
        if self.options.output_dtype not in ("float32", "int16"):
            raise ValueError(
                f"output_dtype must be 'float32' or 'int16', "
                f"got {self.options.output_dtype!r}"
            )
        # A per-level tuple that doesn't match this voice's upsample depth
        # would otherwise surface as an opaque IndexError inside tracing.
        if isinstance(voc_prec, tuple) and len(voc_prec) != hp.num_upsamples:
            raise ValueError(
                f"vocoder_precision has {len(voc_prec)} per-level entries but "
                f"this voice has {hp.num_upsamples} upsample levels — give one "
                f"tier per level (or a single tier name for all levels)"
            )
        # Program-set sharing (see _PROGRAM_SETS): the closures below read
        # ONLY the locals hashed into this key — params arrive as call
        # arguments — so same-(arch, knobs) runtimes reuse one compiled set.
        import dataclasses as _dc

        key = (
            tuple((f.name, _freeze(getattr(hp, f.name)))
                  for f in _dc.fields(hp)),
            prec, _freeze(voc_prec), _freeze(flow_prec), _freeze(use_pallas),
            self.options.output_dtype,
        )
        cached = _PROGRAM_SETS.get(key)
        if cached is not None:
            (self._encode_keyed, self._encode_injected, self._decode_keyed,
             self._decode_injected, self._fused_keyed, self._fused_forced,
             self._decode_window_keyed, self._decode_window_injected,
             self._stream_head_keyed, self._stream_head_batch_keyed,
             self._decode_window_batch_keyed) = cached
            return

        if self.options.output_dtype == "int16":
            def to_pcm(a):
                return (jnp.clip(a, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        else:
            def to_pcm(a):
                return a

        def encode_keyed(params, ids, lengths, seed, length_scale, noise_w, sid):
            with jax.default_matmul_precision(prec):
                # Key derivation happens in-program: eager PRNG ops would each
                # pay a full device round trip on a tunneled TPU.
                #
                # The draw is PER ROW (one (2, P) tensor broadcast over the
                # batch) so a request's seeded realization depends only on
                # (seed, p_bucket) — NOT on its co-batched rows or the batch
                # rung the scheduler happened to pick. b == 1 is bit-identical
                # to the historical whole-tensor draw because jax.random bits
                # depend only on the element count: normal(k, (1, 2, P))[0]
                # == normal(k, (2, P)). This row invariance is what makes
                # phoneme_durations() exact against served audio.
                key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
                dp_noise = jnp.broadcast_to(
                    jax.random.normal(key, (2, ids.shape[1]), dtype=jnp.float32),
                    (ids.shape[0], 2, ids.shape[1]))
                return vits.encode(params, hp, ids, lengths, dp_noise,
                                   length_scale=length_scale, noise_w=noise_w, sid=sid)

        def encode_injected(params, ids, lengths, dp_noise, length_scale, noise_w, sid):
            with jax.default_matmul_precision(prec):
                return vits.encode(params, hp, ids, lengths, dp_noise,
                                   length_scale=length_scale, noise_w=noise_w, sid=sid)

        def decode_keyed(params, enc, seed, noise_scale, *, max_frames):
            with jax.default_matmul_precision(prec):
                # Per-row draw broadcast over the batch (see encode_keyed):
                # a row's prior noise depends only on (seed, f_bucket).
                key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
                main_noise = jnp.broadcast_to(
                    jax.random.normal(
                        key, (enc.m_p.shape[1], max_frames), dtype=jnp.float32),
                    (enc.m_p.shape[0], enc.m_p.shape[1], max_frames))
                audio, y_len = vits.decode(
                    params, hp, enc, main_noise, max_frames=max_frames,
                    noise_scale=noise_scale, vocoder_precision=voc_prec,
                    flow_precision=flow_prec, use_pallas=use_pallas)
                return to_pcm(audio), y_len

        def decode_injected(params, enc, main_noise, noise_scale):
            with jax.default_matmul_precision(prec):
                audio, y_len = vits.decode(
                    params, hp, enc, main_noise,
                    max_frames=main_noise.shape[-1], noise_scale=noise_scale,
                    vocoder_precision=voc_prec, flow_precision=flow_prec,
                    use_pallas=use_pallas)
                return to_pcm(audio), y_len

        def fused_keyed(params, ids, lengths, seed, scales, sid, *, max_frames):
            with jax.default_matmul_precision(prec):
                noise_scale, length_scale, noise_w = scales[0], scales[1], scales[2]
                # Per-row draws broadcast over the batch (see encode_keyed):
                # realizations are invariant to co-batched rows and the
                # serving layer's row rung; b == 1 is bit-identical to the
                # whole-tensor draw.
                base = jax.random.PRNGKey(seed)
                dp_noise = jnp.broadcast_to(
                    jax.random.normal(
                        jax.random.fold_in(base, 0), (2, ids.shape[1]),
                        dtype=jnp.float32),
                    (ids.shape[0], 2, ids.shape[1]))
                main_noise = jnp.broadcast_to(
                    jax.random.normal(
                        jax.random.fold_in(base, 1),
                        (hp.inter_channels, max_frames), dtype=jnp.float32),
                    (ids.shape[0], hp.inter_channels, max_frames))
                enc = vits.encode(params, hp, ids, lengths, dp_noise,
                                  length_scale=length_scale, noise_w=noise_w, sid=sid)
                audio, y_len = vits.decode(params, hp, enc, main_noise,
                                           max_frames=max_frames,
                                           noise_scale=noise_scale,
                                           vocoder_precision=voc_prec,
                                           flow_precision=flow_prec,
                                           use_pallas=use_pallas)
                # y_total (un-clipped) lets the host detect budget overflow
                # from the same fetch as the audio.
                return to_pcm(audio), y_len, enc.y_total

        def fused_forced(params, ids, lengths, durations, seed, noise_scale,
                         sid, *, max_frames):
            # Duration forcing: the caller supplies the per-phoneme frame
            # plan, so the duration predictor is skipped and the host knows
            # the frame bucket up front — ONE round trip, no y_total fetch.
            # The prior-noise derivation is bit-identical to decode_keyed /
            # fused_keyed (fold_in(base, 1), per-row draw broadcast), so
            # forcing the plan phoneme_durations() returned at the same
            # (seed, f_bucket) reproduces the predicted-duration audio
            # exactly.
            with jax.default_matmul_precision(prec):
                base = jax.random.PRNGKey(seed)
                main_noise = jnp.broadcast_to(
                    jax.random.normal(
                        jax.random.fold_in(base, 1),
                        (hp.inter_channels, max_frames), dtype=jnp.float32),
                    (ids.shape[0], hp.inter_channels, max_frames))
                enc = vits.encode_forced(params, hp, ids, lengths, durations,
                                         sid=sid)
                audio, y_len = vits.decode(params, hp, enc, main_noise,
                                           max_frames=max_frames,
                                           noise_scale=noise_scale,
                                           vocoder_precision=voc_prec,
                                           flow_precision=flow_prec,
                                           use_pallas=use_pallas)
                return to_pcm(audio), y_len

        def decode_window_keyed(params, enc, seed, t_offset, total_frames,
                                noise_scale, *, window):
            with jax.default_matmul_precision(prec):
                # Prior noise must be a function of the ABSOLUTE frame index
                # so overlapping window halos see identical values.
                base = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
                t_idx = t_offset + jnp.arange(window)
                main_noise = vits.per_frame_noise(
                    base, t_idx, enc.m_p.shape[0], enc.m_p.shape[1]
                )
                return to_pcm(vits.decode_window(
                    params, hp, enc, main_noise, t_offset,
                    window=window, total_frames=total_frames,
                    noise_scale=noise_scale, vocoder_precision=voc_prec,
                    flow_precision=flow_prec, use_pallas=use_pallas,
                ))

        def decode_window_injected(params, enc, main_noise_win, t_offset,
                                   total_frames, noise_scale):
            with jax.default_matmul_precision(prec):
                return to_pcm(vits.decode_window(
                    params, hp, enc, main_noise_win, t_offset,
                    window=main_noise_win.shape[-1], total_frames=total_frames,
                    noise_scale=noise_scale, vocoder_precision=voc_prec,
                    flow_precision=flow_prec, use_pallas=use_pallas,
                ))

        def decode_window_batch_keyed(params, enc, seeds, t_offsets, totals,
                                      noise_scales, *, window, halo):
            # One window per ROW at independent positions: the batched
            # multi-stream decode (StreamingServer). Row r's noise is the
            # exact realization stream r would see decoding alone — derived
            # from ITS seed at ITS absolute frame indices. Only the central
            # (emitted) region crosses the tunnel — halo audio is margin.
            with jax.default_matmul_precision(prec):
                base_keys = jax.vmap(
                    lambda s: jax.random.fold_in(jax.random.PRNGKey(s), 1)
                )(seeds)
                t_idx = t_offsets[:, None] + jnp.arange(window)[None, :]
                main_noise = vits.per_row_frame_noise(
                    base_keys, t_idx, enc.m_p.shape[1])
                audio = to_pcm(vits.decode_window(
                    params, hp, enc, main_noise, t_offsets, window=window,
                    total_frames=totals,
                    noise_scale=noise_scales[:, None, None],
                    vocoder_precision=voc_prec, flow_precision=flow_prec,
                    use_pallas=use_pallas,
                ))
                return audio[:, halo * hp.hop_length
                             : (window - halo) * hp.hop_length]

        def stream_head_keyed(params, ids, lengths, seed, length_scale,
                              noise_w, sid, noise_scale, *, window, halo):
            # Streaming TTFB path: encode + the FIRST decode window in one
            # program, so the first audio costs a single device->host round
            # trip (the split path fetches y_total after encode, then the
            # window-0 audio — two tunnel RTTs before any sound). The noise
            # derivations match encode_keyed/decode_window_keyed exactly, so
            # later windows from the split programs continue the same
            # realization.
            with jax.default_matmul_precision(prec):
                base = jax.random.PRNGKey(seed)
                dp_noise = jax.random.normal(
                    jax.random.fold_in(base, 0),
                    (ids.shape[0], 2, ids.shape[1]), dtype=jnp.float32)
                enc = vits.encode(params, hp, ids, lengths, dp_noise,
                                  length_scale=length_scale, noise_w=noise_w,
                                  sid=sid)
                t_offset = jnp.int32(-halo)
                t_idx = t_offset + jnp.arange(window)
                main_noise = vits.per_frame_noise(
                    jax.random.fold_in(base, 1), t_idx,
                    enc.m_p.shape[0], enc.m_p.shape[1])
                # Same clamp the host applies (y_len = max(1, y_total[0])),
                # done on device so window 1 can dispatch before the fetch.
                total = jnp.maximum(enc.y_total[0], 1).astype(jnp.int32)
                audio0 = to_pcm(vits.decode_window(
                    params, hp, enc, main_noise, t_offset, window=window,
                    total_frames=total, noise_scale=noise_scale,
                    vocoder_precision=voc_prec, flow_precision=flow_prec,
                    use_pallas=use_pallas))
                return enc, audio0, total

        def stream_head_batch_keyed(params, ids, lengths, seeds,
                                    length_scales, noise_ws, sid,
                                    noise_scales, *, window, halo):
            # B streams' fused heads in ONE program: a burst of simultaneous
            # stream arrivals would otherwise serialize B b=1 encode+window
            # executions on the device (TTFB grows linearly with the burst).
            # Row r's noise derivations are bit-identical to
            # stream_head_keyed at seeds[r]: PRNGKey/fold_in are per-row,
            # and jax.random.normal bits depend only on the element count —
            # normal(k, (1, 2, P))[0] == normal(k, (2, P)). Unlike the b=1
            # program, the returned audio is trimmed to the emitted region
            # on device (only c0 frames cross the tunnel per row).
            with jax.default_matmul_precision(prec):
                bases = jax.vmap(jax.random.PRNGKey)(seeds)
                dp_noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, 0), (2, ids.shape[1])))(bases)
                enc = vits.encode(params, hp, ids, lengths, dp_noise,
                                  length_scale=length_scales[:, None, None],
                                  noise_w=noise_ws[:, None, None], sid=sid)
                t_off = jnp.full((ids.shape[0],), -halo, jnp.int32)
                base_keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, 1))(bases)
                t_idx = t_off[:, None] + jnp.arange(window)[None, :]
                main_noise = vits.per_row_frame_noise(
                    base_keys, t_idx, hp.inter_channels)
                totals = jnp.maximum(enc.y_total, 1).astype(jnp.int32)
                audio0 = to_pcm(vits.decode_window(
                    params, hp, enc, main_noise, t_off, window=window,
                    total_frames=totals,
                    noise_scale=noise_scales[:, None, None],
                    vocoder_precision=voc_prec, flow_precision=flow_prec,
                    use_pallas=use_pallas))
                return (enc,
                        audio0[:, halo * hp.hop_length
                               : (window - halo) * hp.hop_length],
                        totals)

        self._encode_keyed = jax.jit(encode_keyed)
        self._encode_injected = jax.jit(encode_injected)
        self._decode_keyed = jax.jit(decode_keyed, static_argnames=("max_frames",))
        self._decode_injected = jax.jit(decode_injected)
        self._fused_keyed = jax.jit(fused_keyed, static_argnames=("max_frames",))
        self._fused_forced = jax.jit(fused_forced, static_argnames=("max_frames",))
        self._decode_window_keyed = jax.jit(decode_window_keyed,
                                            static_argnames=("window",))
        self._decode_window_injected = jax.jit(decode_window_injected)
        self._stream_head_keyed = jax.jit(stream_head_keyed,
                                          static_argnames=("window", "halo"))
        self._stream_head_batch_keyed = jax.jit(
            stream_head_batch_keyed, static_argnames=("window", "halo"))
        self._decode_window_batch_keyed = jax.jit(
            decode_window_batch_keyed, static_argnames=("window", "halo"))
        _PROGRAM_SETS[key] = (
            self._encode_keyed, self._encode_injected, self._decode_keyed,
            self._decode_injected, self._fused_keyed, self._fused_forced,
            self._decode_window_keyed, self._decode_window_injected,
            self._stream_head_keyed, self._stream_head_batch_keyed,
            self._decode_window_batch_keyed)

    # -- lifecycle -------------------------------------------------------------

    @property
    def params(self) -> Params:
        """The on-device weight dict. Every synthesis path reads this, so
        a closed runtime fails fast and uniformly here instead of with a
        pytree/KeyError deep inside a jit call."""
        p = self._params
        if p is None:
            raise RuntimeError(
                "PiperRuntime is closed — its weights were released "
                "(PiperRuntime.close())")
        return p

    @params.setter
    def params(self, value: Params) -> None:
        self._params = value

    def hbm_bytes(self) -> int:
        """Device bytes held by this voice's weights (logical size; on a
        mesh the per-device share is this divided by the replication
        factor — tp-sharded tensors already count once). 0 once closed.
        Surfaced per voice in serving metrics so operators can budget
        resident voices against HBM."""
        if self._hbm_bytes is None:
            self._hbm_bytes = sum(int(v.nbytes) for v in self.params.values())
        return self._hbm_bytes

    @property
    def closed(self) -> bool:
        return self._params is None

    def close(self) -> None:
        """Release this voice's device memory (the weights — the dominant
        HBM holder). Further synthesis raises RuntimeError. Compiled
        programs are NOT dropped: they are shared across same-arch
        runtimes via _PROGRAM_SETS (weights are call arguments) — evict
        those explicitly with evict_program_sets() when the architecture
        itself is being retired. Idempotent."""
        with self._lock:
            if self.closed:
                return
            params, self._params = self._params, None
            self._hbm_bytes = 0
        for v in params.values():
            try:
                v.delete()
            except Exception:  # noqa: BLE001 — already deleted/donated
                pass

    # -- synthesis -------------------------------------------------------------

    @property
    def sample_rate(self) -> int:
        return self.config.audio.sample_rate

    @property
    def np_output_dtype(self):
        return np.int16 if self.options.output_dtype == "int16" else np.float32

    def _as_output(self, a) -> np.ndarray:
        """Fetched audio -> the runtime's output dtype: int16 passes
        through (device-converted PCM), anything else (fp32, or bf16 in the
        end-to-end bfloat16 mode) becomes float32 PCM."""
        a = np.asarray(a)
        if a.dtype == np.int16:
            return a
        return a.astype(np.float32, copy=False) if a.dtype != np.float32 else a

    @property
    def audio_format(self) -> AudioFormat:
        return AudioFormat(sample_rate=self.sample_rate)

    def synthesize(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        dp_noise: Optional[np.ndarray] = None,
        main_noise: Optional[np.ndarray] = None,
        speaker_mix: Optional[dict] = None,
    ) -> np.ndarray:
        """Synthesize one utterance. Returns PCM in the runtime's
        output_dtype: float32 in [-1, 1] (the default), or int16 when
        RuntimeOptions.output_dtype == "int16" (device-converted).

        `dp_noise`/`main_noise` inject recorded RNG tensors for bit-exact
        comparison (the analog of GraphExecutor's `overrides`,
        GraphExecutor.swift:101-104). `main_noise`'s frame axis must fit a
        frame bucket; it is padded up with zeros if shorter.
        """
        audios, timings = self._synthesize_batch_impl(
            [list(phoneme_ids)],
            noise_scale=noise_scale,
            length_scale=length_scale,
            noise_w=noise_w,
            speaker_ids=[speaker_id] if speaker_id is not None else None,
            seed=seed,
            dp_noise=dp_noise,
            main_noise=main_noise,
            speaker_mixes=[speaker_mix] if speaker_mix is not None else None,
        )
        self.last_run_timings = timings
        return audios[0]

    def synthesize_batch(
        self,
        phoneme_ids_batch: Sequence[Sequence[int]],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ) -> List[np.ndarray]:
        """Batched multi-utterance synthesis (pads to a common bucket)."""
        audios, timings = self._synthesize_batch_impl(
            [list(x) for x in phoneme_ids_batch],
            noise_scale=noise_scale,
            length_scale=length_scale,
            noise_w=noise_w,
            speaker_ids=list(speaker_ids) if speaker_ids is not None else None,
            seed=seed,
            speaker_mixes=list(speaker_mixes) if speaker_mixes is not None else None,
        )
        self.last_run_timings = timings
        return audios

    def phoneme_durations(
        self,
        phoneme_ids_batch: Sequence[Sequence[int]],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        pad_rows_to: Optional[int] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ) -> List[np.ndarray]:
        """Per-phoneme frame durations for each utterance — the alignment
        plan the decoder expands. Runs ONLY the encoder (text encoder +
        stochastic duration predictor): one device dispatch and one small
        fetch (B x P ints), no vocoder FLOPs.

        `pad_rows_to` pins the padded row count (row-0 copies) instead of
        the batch ladder — the serving layer uses it to keep ONE compiled
        encode program per phoneme bucket (row-invariant noise means the
        padding cannot change any row's result).

        Exactness: the keyed duration noise is derived per row from
        (seed, phoneme bucket) alone — see encode_keyed — so for the same
        (ids, length_scale, noise_w, speaker, seed) these durations are the
        plan synthesize / synthesize_batch / the serving layer realized,
        regardless of how the request was batched: the noise realization is
        identical; the only possible divergence is a duration that lands
        within XLA's batch-shape reassociation error (~1e-6) of an exact
        integer flipping its ceil() — never observed in testing. Row i's
        audio sample count is clip(sum(d_i), 1, frame_bucket) * hop_length.

        `noise_scale` is accepted for signature symmetry; durations do not
        depend on it (it scales the decoder's prior noise only).
        """
        del noise_scale  # durations depend on length_scale / noise_w only
        with self._lock:
            ids_batch = [list(x) for x in phoneme_ids_batch]
            b = len(ids_batch)
            if pad_rows_to is not None:
                if pad_rows_to < b:
                    raise ValueError(
                        f"pad_rows_to {pad_rows_to} < batch size {b}")
                # Mesh runtimes shard rows over dp — snap the pinned count
                # up to a dp multiple here (not in every caller) so a
                # non-divisible pin fails into padding, not into an opaque
                # XLA sharding error.
                pad_rows_to = -(-int(pad_rows_to) // self._dp_size) * self._dp_size
                lengths, p_bucket, ids = self._validate_and_pad(
                    ids_batch + [ids_batch[0]] * (pad_rows_to - b),
                    pad_batch=False)
            else:
                lengths, p_bucket, ids = self._validate_and_pad(ids_batch)
            bp = ids.shape[0]
            _, ls, nw = self._scales(None, length_scale, noise_w)
            if speaker_ids is not None and bp > b:
                speaker_ids = list(speaker_ids) + [speaker_ids[0]] * (bp - b)
            sid = self._sid_array(speaker_ids, bp,
                                  mixes=self._pad_mixes(speaker_mixes, b, bp))
            seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
            t0 = time.perf_counter()
            compiled = self._mark("enc_key", (bp, p_bucket, self._sid_kind(sid)))
            enc = self._encode_keyed(self.params, self._put_batch(ids),
                                     self._put_batch(lengths), seed_j, ls, nw, sid)
            w = np.asarray(jax.device_get(enc.w_ceil)).astype(np.int64)
            self.profiler.record("durations", p_bucket,
                                 (time.perf_counter() - t0) * 1e3, compiled)
            return [w[i, : len(ids_batch[i])] for i in range(b)]

    def synthesize_with_alignment(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        speaker_mix: Optional[dict] = None,
    ):
        """Synthesize one utterance AND its phoneme-level timing.

        Returns (audio, PhonemeAlignment): audio as synthesize() would
        produce it (bit-identical — same programs, same noise), and the
        per-phoneme sample/second spans of that exact waveform. Costs one
        extra encoder pass + one small fetch over plain synthesize().
        """
        from piper_tpu.core.alignment import make_alignment

        ids = list(phoneme_ids)
        audio = self.synthesize(
            ids, noise_scale=noise_scale, length_scale=length_scale,
            noise_w=noise_w, speaker_id=speaker_id, seed=seed,
            speaker_mix=speaker_mix,
        )
        durations = self.phoneme_durations(
            [ids], length_scale=length_scale, noise_w=noise_w,
            speaker_ids=[speaker_id] if speaker_id is not None else None,
            seed=seed,
            speaker_mixes=[speaker_mix] if speaker_mix is not None else None,
        )[0]
        return audio, make_alignment(
            ids, durations, hop_length=self.hparams.hop_length,
            sample_rate=self.sample_rate, total_samples=len(audio),
        )

    def synthesize_forced(
        self,
        phoneme_ids: Sequence[int],
        durations: Sequence[int],
        noise_scale: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        speaker_mix: Optional[dict] = None,
    ) -> np.ndarray:
        """Synthesize with a CALLER-SUPPLIED per-phoneme frame plan
        (duration forcing): `durations[i]` frames are allotted to
        `phoneme_ids[i]` and the stochastic duration predictor is skipped —
        the knob the reference never surfaces (its RandomNormalLike duration
        noise is baked into the graph). Use cases: dubbing/karaoke timing,
        prosody editing (stretch one word), and replaying an edited
        `phoneme_durations()` plan. Forcing the UNEDITED plan at the same
        seed reproduces `synthesize()`'s split-mode audio exactly — the
        prior-noise derivation matches decode_keyed bit-for-bit.

        `length_scale`/`noise_w` have no effect here (they only shape the
        predictor this path skips); scale the durations instead. One device
        round trip: the frame bucket is known from sum(durations) up front.
        """
        audios, timings = self._synthesize_forced_impl(
            [list(phoneme_ids)], [list(durations)],
            noise_scale=noise_scale,
            speaker_ids=[speaker_id] if speaker_id is not None else None,
            seed=seed,
            speaker_mixes=[speaker_mix] if speaker_mix is not None else None,
        )
        self.last_run_timings = timings
        return audios[0]

    def synthesize_batch_forced(
        self,
        phoneme_ids_batch: Sequence[Sequence[int]],
        durations_batch: Sequence[Sequence[int]],
        noise_scale: Optional[float] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        pad_rows_to: Optional[int] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ) -> List[np.ndarray]:
        """Batched duration forcing (see synthesize_forced). `pad_rows_to`
        pins the padded row count (the serving layer uses it to bound the
        compiled-program grid — same contract as phoneme_durations)."""
        audios, timings = self._synthesize_forced_impl(
            [list(x) for x in phoneme_ids_batch],
            [list(d) for d in durations_batch],
            noise_scale=noise_scale,
            speaker_ids=list(speaker_ids) if speaker_ids is not None else None,
            seed=seed,
            pad_rows_to=pad_rows_to,
            speaker_mixes=list(speaker_mixes) if speaker_mixes is not None else None,
        )
        self.last_run_timings = timings
        return audios

    def _synthesize_forced_impl(
        self,
        ids_batch: List[List[int]],
        durations_batch: List[List[int]],
        *,
        noise_scale,
        speaker_ids,
        seed=None,
        pad_rows_to=None,
        speaker_mixes=None,
    ) -> Tuple[List[np.ndarray], "RunTimings"]:
        if len(durations_batch) != len(ids_batch):
            raise ValueError(
                f"{len(ids_batch)} utterances but {len(durations_batch)} "
                f"duration rows")
        totals = []
        for ids, durs in zip(ids_batch, durations_batch):
            if len(durs) != len(ids):
                raise ValueError(
                    f"durations length {len(durs)} != phoneme count "
                    f"{len(ids)} — one frame count per phoneme")
            if any(d < 0 for d in durs):
                raise ValueError("durations must be non-negative frame counts")
            # Per ROW: an all-zero plan would otherwise clip to one frame
            # of prior-noise garbage instead of erroring.
            if sum(durs) < 1:
                raise ValueError(
                    "at least one phoneme needs a non-zero duration")
            totals.append(int(sum(durs)))
        with self._lock:
            t_start = time.perf_counter()
            b = len(ids_batch)
            if pad_rows_to is not None:
                if pad_rows_to < b:
                    raise ValueError(
                        f"pad_rows_to {pad_rows_to} < batch size {b}")
                # Snap to a dp multiple on mesh runtimes (see
                # phoneme_durations for why this lives here).
                pad_rows_to = -(-int(pad_rows_to) // self._dp_size) * self._dp_size
                lengths, p_bucket, ids = self._validate_and_pad(
                    ids_batch + [ids_batch[0]] * (pad_rows_to - b),
                    pad_batch=False)
            else:
                lengths, p_bucket, ids = self._validate_and_pad(ids_batch)
            bp = ids.shape[0]
            # Pad duration rows to (bp, p_bucket); dummy rows copy row 0 so
            # they cannot raise the frame bucket (same rule as the ids pad).
            durs = np.zeros((bp, p_bucket), np.int32)
            for i in range(bp):
                row = durations_batch[i] if i < b else durations_batch[0]
                durs[i, : len(row)] = row
            if speaker_ids is not None and bp > b:
                speaker_ids = list(speaker_ids) + [speaker_ids[0]] * (bp - b)
            sid = self._sid_array(speaker_ids, bp, putter=self._put_batch,
                                  mixes=self._pad_mixes(speaker_mixes, b, bp))
            ns, _, _ = self._scales(noise_scale, None, None)
            f_bucket = self._frame_bucket_or_clamp(max(totals))
            seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
            compiled = self._mark("forced", (bp, p_bucket, f_bucket, self._sid_kind(sid)))
            audio_d, _ = self._fused_forced(
                self.params, self._put_batch(ids), self._put_batch(lengths),
                self._put_batch(durs), seed_j, jnp.float32(ns), sid,
                max_frames=f_bucket,
            )
            audio = self._as_output(jax.device_get(audio_d))
            t_end = time.perf_counter()
            hop = self.hparams.hop_length
            y_len = np.clip(np.asarray(totals, np.int64), 1, f_bucket)
            out = [audio[i, : int(y_len[i]) * hop] for i in range(b)]
            wall = t_end - t_start
            self.profiler.record("forced", f_bucket, wall * 1e3, compiled)
            total_samples = int(sum(len(a) for a in out))
            timings = RunTimings(
                wall_ms=wall * 1e3,
                encode_ms=0.0,
                decode_ms=wall * 1e3,
                phoneme_bucket=p_bucket,
                frame_bucket=f_bucket,
                frames=int(y_len.sum()),
                samples=total_samples,
                compiled=compiled,
                compile_count=len(self._compiled_keys),
                rtf=(total_samples / self.sample_rate) / wall if wall > 0 else 0.0,
            )
            return out, timings

    def prewarm(
        self,
        phoneme_lengths: Sequence[int] = (14, 28, 56, 112),
        batch_sizes: Sequence[int] = (1,),
    ) -> dict:
        """Compile the program ladder a serving sweep needs, ahead of traffic.

        Runs one dummy synthesis per (batch, phoneme-bucket) through the
        runtime's configured mode, so every jit program (and the persistent
        on-disk XLA cache entry) the equivalent real calls would hit is built
        up front — the analog of the reference's runtime-compiled pipeline
        cache (MetalContext.swift:20-50), but survives process restarts on
        TPU. In split mode the decode bucket tracks predicted durations, so
        unusual real inputs can still compile a neighboring frame bucket;
        fused mode's budget-derived buckets are covered exactly.
        Returns {"programs": newly_compiled, "seconds": wall}.
        """
        t0 = time.perf_counter()
        before = len(self._compiled_keys)
        base = list(FIXTURE_PHONEME_IDS)
        base = [i % self.hparams.n_vocab for i in base]
        for b in batch_sizes:
            for length in phoneme_lengths:
                ids = (base * (-(-length // len(base))))[:length]
                if b == 1:
                    self.synthesize(ids)
                else:
                    self.synthesize_batch([ids] * int(b))
        return {
            "programs": len(self._compiled_keys) - before,
            "seconds": time.perf_counter() - t0,
        }

    def synthesize_stream(
        self,
        phoneme_ids: Sequence[int],
        chunk_size: int = 2048,
        incremental: bool = False,
        **kwargs,
    ) -> Iterator[AudioChunk]:
        """Chunked streaming over the synthesized waveform.

        With incremental=False this matches the reference's behavior
        (synthesize fully, then chunk — PiperMetalRuntime.swift:93-94).
        With incremental=True the decode itself runs in receptive-field-haloed
        frame windows, so the first audio arrives after one window instead of
        the whole utterance (a capability the reference lacks). Constant
        memory in the utterance length. With injected noise tensors the
        streamed audio equals the full decode exactly; in seeded mode it is
        deterministic but a DIFFERENT noise realization than synthesize()
        (streaming derives the prior noise per absolute frame index so
        overlapping windows agree; the bulk path draws one array per bucket).
        """
        if incremental:
            yield from self.synthesize_stream_incremental(
                phoneme_ids, chunk_size=chunk_size, **kwargs
            )
            return
        audio = self.synthesize(phoneme_ids, **kwargs)
        fmt = self.audio_format
        n = len(audio)
        if n == 0:
            yield AudioChunk(format=fmt, start_sample_index=0,
                             samples=np.zeros(0, self.np_output_dtype),
                             is_final=True)
            return
        for start in range(0, n, chunk_size):
            end = min(start + chunk_size, n)
            yield AudioChunk(
                format=fmt,
                start_sample_index=start,
                samples=audio[start:end],
                is_final=end >= n,
            )

    def synthesize_stream_incremental(
        self,
        phoneme_ids: Sequence[int],
        chunk_size: int = 2048,
        chunk_frames: Optional[int] = None,
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        dp_noise: Optional[np.ndarray] = None,
        main_noise: Optional[np.ndarray] = None,
        total_frames: Optional[int] = None,
        halo_frames: Optional[int] = None,
        chunk_schedule: Optional[Sequence[int]] = None,
        fused_head: Optional[bool] = None,
        speaker_mix: Optional[dict] = None,
    ) -> Iterator[AudioChunk]:
        """Windowed incremental decode (see synthesize_stream).

        Windows are `chunk_frames` of emitted audio plus a halo of the decode
        stack's receptive field on each side; the emitted region is then
        exact (up to fp reduction order) vs a full decode. `main_noise`
        injects the full-length prior noise for bit-reproducible tests.

        The halo is paid per window (47 frames/side on the medium stack), so
        small windows overcompute ~4x while large ones delay first audio. By
        default the window GROWS: `chunk_schedule` windows of emitted frames
        (last entry repeats) — small first window for TTFB, wide steady-state
        windows for sustained throughput. Passing `chunk_frames` pins a fixed
        size (exactness tests); each distinct window size is its own compiled
        program, so schedules should stay short and stable.

        `fused_head` (default: auto — on for seeded mode) runs encode + the
        first window in ONE program so TTFB pays a single device round trip
        instead of two (y_total fetch, then window-0 audio), and dispatches
        window 1 speculatively on the device-held frame count so the depth-2
        pipeline never bubbles. Injected-noise and explicit `total_frames`
        calls use the split path (the noise window / virtual length are
        host-side inputs there).
        """
        from piper_tpu.models.vits.hparams import receptive_field_frames

        hp = self.hparams
        ids = list(phoneme_ids)
        if not ids:
            raise ValueError("empty phoneme sequence")
        bad = [i for i in ids if not (0 <= i < hp.n_vocab)]
        if bad:
            raise ValueError(
                f"phoneme id(s) {bad[:5]} out of range [0, {hp.n_vocab}) — "
                f"check the voice's phoneme_id_map"
            )
        p_bucket = bucket_for(len(ids), self.options.phoneme_buckets, "phoneme")
        # Streaming is single-utterance: on a mesh it runs replicated (the
        # sp-sharded analog lives in parallel/serving.synthesize_long).
        ids_j = self._put_repl(pad_to(np.asarray(ids, np.int32), p_bucket)[None])
        lengths_j = self._put_repl(np.asarray([len(ids)], np.int32))
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        sid = self._sid_array(
            [speaker_id] if speaker_id is not None else None, 1,
            putter=self._put_repl,
            mixes=[speaker_mix] if speaker_mix is not None else None)
        base_seed = _seed_u32(self.options.seed if seed is None else seed)
        seed_j = jnp.uint32(base_seed)

        halo = receptive_field_frames(hp) if halo_frames is None else int(halo_frames)
        c0 = chunk_frames or max(32, chunk_size // hp.hop_length)
        if chunk_schedule is not None:
            sched = [max(1, int(v)) for v in chunk_schedule]
        elif chunk_frames is not None:
            sched = [c0]  # explicit fixed size: exactness-test contract
        else:
            # Growing default: first window keeps TTFB at ~one small decode;
            # doubling to 8x amortizes the 2*halo overhang (the measured
            # knee — beyond ~8x the single-row decode stops scaling).
            sched = [c0, 2 * c0, 4 * c0, 8 * c0]
        hop = hp.hop_length
        fmt = self.audio_format
        emitted = 0

        seeded = dp_noise is None and main_noise is None and total_frames is None
        use_head = seeded if fused_head is None else bool(fused_head)
        if use_head and not seeded:
            raise ValueError(
                "fused_head streaming is seeded-only: injected noise and "
                "explicit total_frames need the split encode/window path"
            )

        audio0 = spec1 = None
        if use_head:
            enc, audio0_dev, total_dev = self._stream_head_keyed(
                self.params, ids_j, lengths_j, seed_j, ls, nw, sid, ns,
                window=sched[0] + 2 * halo, halo=halo)
            # Speculatively dispatch window 1 on the DEVICE-held frame count
            # before fetching the head, so window 1 computes while window 0's
            # audio is on the wire (same depth-2 interleave as the loop
            # below). If the utterance ends inside window 0 this wastes one
            # masked-to-zero window decode — a few ms, vs a tunnel RTT bubble
            # on every longer stream.
            c1 = sched[min(1, len(sched) - 1)]
            spec1 = self._decode_window_keyed(
                self.params, enc, seed_j, jnp.int32(sched[0] - halo),
                total_dev, ns, window=c1 + 2 * halo)
            audio0, total_np = jax.device_get((audio0_dev, total_dev))
            y_len = int(total_np)  # already clamped >= 1 in-program
        else:
            if dp_noise is not None:
                dpn = np.zeros((1, 2, p_bucket), np.float32)
                src = np.asarray(dp_noise, np.float32).reshape(1, 2, -1)
                dpn[:, :, : src.shape[-1]] = src
                enc = self._encode_injected(self.params, ids_j, lengths_j,
                                            self._put_repl(dpn), ls, nw, sid)
            else:
                enc = self._encode_keyed(self.params, ids_j, lengths_j,
                                         seed_j, ls, nw, sid)
            y_len = max(1, int(np.asarray(enc.y_total)[0]))
        total = int(total_frames) if total_frames is not None else y_len
        # (start_frame, emitted_frames) per window; the last schedule entry
        # repeats for the steady state.
        plan = []
        pos = 0
        while pos < y_len:
            c_k = sched[min(len(plan), len(sched) - 1)]
            plan.append((pos, c_k))
            pos += c_k
        n_chunks = len(plan)

        def dispatch(k):
            """Enqueue window k's decode (JAX dispatch is non-blocking);
            the device array is fetched later."""
            start_k, c_k = plan[k]
            window = c_k + 2 * halo
            t_offset = start_k - halo
            if main_noise is not None:
                full = np.asarray(main_noise, np.float32).reshape(
                    1, hp.inter_channels, -1)
                win = np.zeros((1, hp.inter_channels, window), np.float32)
                lo = max(0, t_offset)
                hi = min(full.shape[-1], t_offset + window)
                if hi > lo:
                    win[:, :, lo - t_offset : hi - t_offset] = full[:, :, lo:hi]
                return self._decode_window_injected(
                    self.params, enc, self._put_repl(win),
                    jnp.int32(t_offset), jnp.int32(total), ns,
                )
            return self._decode_window_keyed(
                self.params, enc, seed_j, jnp.int32(t_offset),
                jnp.int32(total), ns, window=window,
            )

        def emit(k, audio_win):
            nonlocal emitted
            c_k = plan[k][1]
            start = halo * hop
            samples = audio_win[start : start + c_k * hop]
            remaining = y_len * hop - emitted
            if len(samples) > remaining:
                samples = samples[:remaining]
            chunk = AudioChunk(
                format=fmt,
                start_sample_index=emitted,
                samples=samples,
                is_final=k == n_chunks - 1,
            )
            emitted += len(samples)
            return chunk

        # Depth-2 pipeline (the same interleave as ServingPipeline's batch
        # worker): window k+1's decode is dispatched BEFORE window k's audio
        # is fetched, so the per-window device->host round trip (the tunnel
        # RTT that previously serialized every window) overlaps the next
        # window's compute. On the fused-head path chunk 0 is already fetched
        # and window 1 is already in flight, so the loop starts at k=1 with
        # the same interleave.
        if use_head:
            yield emit(0, self._as_output(audio0)[0])
            if n_chunks == 1:
                return
            pending = spec1
            start_k = 1
        else:
            pending = dispatch(0)
            start_k = 0
        for k in range(start_k, n_chunks):
            nxt = dispatch(k + 1) if k + 1 < n_chunks else None
            audio_win = self._as_output(jax.device_get(pending))[0]
            pending = nxt
            yield emit(k, audio_win)

    def dispatch_stream_head(
        self,
        phoneme_ids: Sequence[int],
        *,
        c0: int,
        halo: int,
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        speaker_mix: Optional[dict] = None,
    ):
        """Dispatch one stream's fused head (encode + the first `c0` emitted
        frames) WITHOUT blocking. Returns (enc, audio0_dev, total_dev,
        seed_j, ns) device handles — the StreamingServer fetches audio0 and
        total later (batched with other device reads on its one I/O thread)
        and keeps `enc` resident for the batched steady-state windows.
        Speaker conditioning (id or mix) bakes into `enc`, so the window
        programs are conditioning-agnostic."""
        hp = self.hparams
        ids = list(phoneme_ids)
        if not ids:
            raise ValueError("empty phoneme sequence")
        bad = [i for i in ids if not (0 <= i < hp.n_vocab)]
        if bad:
            raise ValueError(
                f"phoneme id(s) {bad[:5]} out of range [0, {hp.n_vocab})"
            )
        p_bucket = bucket_for(len(ids), self.options.phoneme_buckets, "phoneme")
        ids_j = self._put_repl(pad_to(np.asarray(ids, np.int32), p_bucket)[None])
        lengths_j = self._put_repl(np.asarray([len(ids)], np.int32))
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        sid = self._sid_array(
            [speaker_id] if speaker_id is not None else None, 1,
            putter=self._put_repl,
            mixes=[speaker_mix] if speaker_mix is not None else None)
        seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
        self._mark("stream_head", (p_bucket, c0, halo, self._sid_kind(sid)))
        enc, audio0, total = self._stream_head_keyed(
            self.params, ids_j, lengths_j, seed_j, ls, nw, sid, ns,
            window=c0 + 2 * halo, halo=halo)
        return enc, audio0, total, seed_j, ns

    def dispatch_stream_head_batch(
        self,
        ids_batch: Sequence[Sequence[int]],
        *,
        c0: int,
        halo: int,
        seeds: Optional[Sequence[Optional[int]]] = None,
        noise_scales: Optional[Sequence[Optional[float]]] = None,
        length_scales: Optional[Sequence[Optional[float]]] = None,
        noise_ws: Optional[Sequence[Optional[float]]] = None,
        speaker_ids: Optional[Sequence[Optional[int]]] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ):
        """Dispatch B streams' fused heads in ONE program (non-blocking).

        The burst-arrival path of StreamingServer: B simultaneous new
        streams encode + decode their first windows together instead of
        serializing B b=1 head executions. Rows bucket at the largest
        row's phoneme bucket; callers pad the ROW count to a prewarmed
        rung by repeating a row. For bit-exactness vs a solo
        dispatch_stream_head, every row must already be in that bucket
        (the seeded duration-noise draw spans the BUCKET, not the row
        length, so batching a row at a larger bucket than its solo one
        samples a different realization — StreamingServer groups bursts
        by bucket for exactly this reason). Returns (enc, audio0_dev (B, c0*hop),
        totals_dev (B,), seed_vals, ns_vals): audio0 is trimmed to the
        emitted region ON DEVICE (the b=1 program returns the full halo'd
        window); seed_vals/ns_vals are the resolved host-side per-row
        values the steady-state window dispatches reuse."""
        hp = self.hparams
        b = len(ids_batch)
        if b == 0:
            raise ValueError("empty batch")
        rows = [list(r) for r in ids_batch]
        for r in rows:
            if not r:
                raise ValueError("empty phoneme sequence")
            bad = [i for i in r if not (0 <= i < hp.n_vocab)]
            if bad:
                raise ValueError(
                    f"phoneme id(s) {bad[:5]} out of range [0, {hp.n_vocab})")
        p_bucket = bucket_for(max(len(r) for r in rows),
                              self.options.phoneme_buckets, "phoneme")
        ids_np = np.stack(
            [pad_to(np.asarray(r, np.int32), p_bucket) for r in rows])
        lengths = np.asarray([len(r) for r in rows], np.int32)
        scl = [self._scales(
            None if noise_scales is None else noise_scales[i],
            None if length_scales is None else length_scales[i],
            None if noise_ws is None else noise_ws[i]) for i in range(b)]
        ns_vals = [s[0] for s in scl]
        if speaker_ids is not None:
            speaker_ids = [0 if v is None else int(v) for v in speaker_ids]
        sid = self._sid_array(speaker_ids, b, putter=self._put_repl,
                              mixes=self._pad_mixes(speaker_mixes, b, b))
        seed_vals = [
            _seed_u32(self.options.seed if seeds is None or seeds[i] is None
                      else seeds[i]) for i in range(b)]
        self._mark("stream_head_batch",
                   (b, p_bucket, c0, halo, self._sid_kind(sid)))
        enc, audio0, totals = self._stream_head_batch_keyed(
            self.params, self._put_repl(ids_np), self._put_repl(lengths),
            self._put_repl(np.asarray(seed_vals, np.uint32)),
            self._put_repl(np.asarray([s[1] for s in scl], np.float32)),
            self._put_repl(np.asarray([s[2] for s in scl], np.float32)),
            sid, self._put_repl(np.asarray(ns_vals, np.float32)),
            window=c0 + 2 * halo, halo=halo)
        return enc, audio0, totals, seed_vals, ns_vals

    def dispatch_window_batch(
        self,
        enc,
        seeds: jnp.ndarray,      # (B,) uint32
        t_offsets: np.ndarray,   # (B,) int32 window starts minus halo
        totals: np.ndarray,      # (B,) int32 per-row y_len (virtual length)
        noise_scales: np.ndarray,  # (B,) float32
        *,
        emit_frames: int,
        halo: int,
    ):
        """Dispatch one batched multi-stream window decode (non-blocking).

        `enc` is a stacked EncodeResult (rows from different utterances at a
        shared phoneme bucket). Each row decodes frames
        [t_offsets[r] + halo, t_offsets[r] + halo + emit_frames) of ITS OWN
        sequence; the returned device array is (B, emit_frames * hop) — the
        halo never crosses the tunnel."""
        window = emit_frames + 2 * halo
        self._mark("stream_window",
                   (int(seeds.shape[0]), enc.m_p.shape[-1], window, halo))
        return self._decode_window_batch_keyed(
            self.params, enc, seeds,
            jnp.asarray(t_offsets, jnp.int32), jnp.asarray(totals, jnp.int32),
            jnp.asarray(noise_scales, jnp.float32),
            window=window, halo=halo)

    def dispatch_fused(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
        speaker_mix: Optional[dict] = None,
    ):
        """Dispatch one fused synthesis without blocking; returns
        (device_outputs, meta) for a later fetch. The building block of the
        async serving pipeline (device round trips overlap across requests).

        On a mesh runtime the single utterance rides the batched fused path
        (rows pad to a dp-divisible rung) so the program is dp-sharded like
        every other; fetch_fused handles the batched meta transparently."""
        if self.mesh is not None:
            return self._dispatch_batch_fused(
                [list(phoneme_ids)], noise_scale=noise_scale,
                length_scale=length_scale, noise_w=noise_w,
                speaker_ids=[speaker_id] if speaker_id is not None else None,
                seed=seed,
                speaker_mixes=[speaker_mix] if speaker_mix is not None else None,
            )
        ids = list(phoneme_ids)
        if not ids:
            raise ValueError("empty phoneme sequence")
        bad = [i for i in ids if not (0 <= i < self.hparams.n_vocab)]
        if bad:
            raise ValueError(
                f"phoneme id(s) {bad[:5]} out of range [0, {self.hparams.n_vocab})"
            )
        p_bucket = bucket_for(len(ids), self.options.phoneme_buckets, "phoneme")
        ids_j = jnp.asarray(pad_to(np.asarray(ids, np.int32), p_bucket)[None])
        lengths_j = jnp.asarray(np.asarray([len(ids)], np.int32))
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        sid = self._sid_array(
            [speaker_id] if speaker_id is not None else None, 1,
            mixes=[speaker_mix] if speaker_mix is not None else None)
        seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
        budget = max(32, len(ids) * self.options.fused_frames_per_phoneme)
        try:
            f_bucket = bucket_for(budget, self.options.frame_buckets, "frame")
        except BucketOverflowError:
            f_bucket = self.options.frame_buckets[-1]
        scales_j = jnp.asarray([ns, ls, nw], jnp.float32)
        self._mark("fused", (1, p_bucket, f_bucket, self._sid_kind(sid)))
        outs = self._fused_keyed(
            self.params, ids_j, lengths_j, seed_j, scales_j, sid, max_frames=f_bucket
        )
        meta = {
            "ids": ids,
            "f_bucket": f_bucket,
            "scales": (ns, ls, nw),
            "speaker_id": speaker_id,
            # Copied: the meta outlives this call (fetch_fused's overflow
            # redo) and the caller may reuse/mutate the dict meanwhile.
            "speaker_mix": dict(speaker_mix) if speaker_mix is not None else None,
            "seed": seed,
        }
        return outs, meta

    def _validate_and_pad(self, ids_batch: List[List[int]], pad_batch: bool = True):
        """Request validation + phoneme AND batch-axis bucketing shared by
        the blocking and dispatch/fetch batch paths (one copy, so the two
        cannot drift). Returns (lengths, p_bucket, ids) where ids may carry
        extra dummy rows (copies of row 0) padding the batch up to the
        batch_buckets ladder — callers slice outputs to the REAL row count
        (len(ids_batch)). Dummy rows copy row 0 so they cannot raise the
        frame bucket above what the real rows need."""
        hp = self.hparams
        for seq in ids_batch:
            if not seq:
                raise ValueError("empty phoneme sequence")
            bad = [i for i in seq if not (0 <= i < hp.n_vocab)]
            if bad:
                raise ValueError(
                    f"phoneme id(s) {bad[:5]} out of range [0, {hp.n_vocab}) — "
                    f"check the voice's phoneme_id_map"
                )
        b = len(ids_batch)
        ladder = self.batch_ladder
        # On a mesh every batch (even b==1) pads to a dp-divisible rung so
        # rows shard evenly over devices.
        if pad_batch and (b > 1 or self._dp_size > 1) and b <= ladder[-1]:
            b_bucket = next(x for x in ladder if x >= b)
            ids_batch = ids_batch + [ids_batch[0]] * (b_bucket - b)
        lengths = np.asarray([len(x) for x in ids_batch], np.int32)
        p_bucket = bucket_for(int(lengths.max()), self.options.phoneme_buckets, "phoneme")
        ids = np.stack([pad_to(np.asarray(x, np.int32), p_bucket) for x in ids_batch])
        return lengths, p_bucket, ids

    def _frame_bucket_or_clamp(self, max_needed: int) -> int:
        """Frame-bucket selection with the overflow clamp+warn (shared)."""
        try:
            return bucket_for(max(1, max_needed), self.options.frame_buckets, "frame")
        except BucketOverflowError:
            import sys

            f_bucket = self.options.frame_buckets[-1]
            print(
                f"[piper-tpu] warning: predicted {max_needed} frames "
                f"exceeds the largest bucket {f_bucket}; audio will be truncated",
                file=sys.stderr,
            )
            return f_bucket

    def dispatch_batch(
        self,
        phoneme_ids_batch: Sequence[Sequence[int]],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        fused: Optional[bool] = None,
        pad_rows_to: Optional[int] = None,
        budget_frames: Optional[int] = None,
        overflow_budget_frames: Optional[int] = None,
        overflow_pad_rows: Optional[int] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ):
        """Dispatch a batched synthesis without waiting for the audio.

        Default (split) path: runs encode, fetches only the frame counts
        (one small round trip — they pick the decode bucket), dispatches the
        decode, and returns (device_audio, meta) for a later `fetch_batch`.
        The audio fetch is the expensive transfer (~110 ms for a B=32 batch
        on the tunneled dev chip, ~37% of the blocking wall time), so
        overlapping it with the next batch's compute is the core of batched
        pipelined serving.

        `fused=True` runs the WHOLE group through the one-program fused path
        instead: the frame bucket comes from the heuristic budget
        (max row length x fused_frames_per_phoneme) and the per-row frame
        counts ride the SAME fetch as the audio — one device round trip per
        group instead of two. Rows whose true duration overflows the budget
        bucket are redone exactly via the split path at fetch time (their
        noise realization then differs — same caveat as the b==1 fused
        fallback). This is the continuous batcher's path: for short-prompt
        groups the fixed ~2-RTT cost per group dominates, and halving it is
        worth the budget bucket's padding waste.

        `fused=None` keeps the historical default: a 1-row batch on a
        fused-mode runtime delegates to dispatch_fused so the audio is
        bit-identical to synthesize_batch (which takes the fused path for
        b==1; the keyed noise depends on the frame bucket, so the paths
        produce different realizations) and keeps the fused path's single
        round trip; multi-row batches take the split path (exact buckets —
        the saturated-throughput choice)."""
        ids_batch = [list(x) for x in phoneme_ids_batch]
        hp = self.hparams
        b = len(ids_batch)
        if b == 1 and self.options.mode == "fused" and fused is None:
            sid1 = speaker_ids[0] if speaker_ids is not None else None
            outs, meta = self.dispatch_fused(
                ids_batch[0], noise_scale=noise_scale,
                length_scale=length_scale, noise_w=noise_w,
                speaker_id=sid1, seed=seed,
                speaker_mix=speaker_mixes[0] if speaker_mixes else None,
            )
            meta["fused1"] = True
            return outs, meta
        if fused:
            return self._dispatch_batch_fused(
                ids_batch, noise_scale=noise_scale, length_scale=length_scale,
                noise_w=noise_w, speaker_ids=speaker_ids, seed=seed,
                pad_rows_to=pad_rows_to, budget_frames=budget_frames,
                overflow_budget_frames=overflow_budget_frames,
                overflow_pad_rows=overflow_pad_rows,
                speaker_mixes=speaker_mixes,
            )
        lengths, p_bucket, ids = self._validate_and_pad(ids_batch)
        bp = ids.shape[0]  # padded row count (batch bucket)
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        sids = None
        if speaker_ids is not None:
            sids = list(speaker_ids) + [speaker_ids[0]] * (bp - b)
        sid = self._sid_array(sids, bp,
                              mixes=self._pad_mixes(speaker_mixes, b, bp))
        seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
        ids_j = self._put_batch(ids)
        lengths_j = self._put_batch(lengths)
        t_start = time.perf_counter()
        compiled_enc = self._mark("enc_key", (bp, p_bucket, self._sid_kind(sid)))
        enc = self._encode_keyed(self.params, ids_j, lengths_j, seed_j, ls, nw, sid)
        # Host sync: frame counts decide the decode bucket (same one
        # unavoidable flush as the blocking path).
        y_lengths = np.asarray(enc.y_total).astype(np.int64)
        self.profiler.record("encode", p_bucket,
                             (time.perf_counter() - t_start) * 1e3, compiled_enc)
        f_bucket = self._frame_bucket_or_clamp(int(y_lengths[:b].max()))
        compiled_dec = self._mark("dec_key", (bp, f_bucket, self._sid_kind(sid)))
        audio, _ = self._decode_keyed(self.params, enc, seed_j, ns,
                                      max_frames=f_bucket)
        return audio, {"y_len": np.clip(y_lengths[:b], 1, f_bucket),
                       "hop": hp.hop_length, "f_bucket": f_bucket,
                       "compiled": compiled_dec, "b": b,
                       "t_dispatch": time.perf_counter()}

    def _dispatch_batch_fused(
        self, ids_batch: List[List[int]], *, noise_scale, length_scale,
        noise_w, speaker_ids, seed, pad_rows_to: Optional[int] = None,
        budget_frames: Optional[int] = None,
        overflow_budget_frames: Optional[int] = None,
        overflow_pad_rows: Optional[int] = None,
        speaker_mixes: Optional[Sequence[dict]] = None,
    ):
        """Whole-group fused dispatch: one program, one later round trip.
        See dispatch_batch(fused=True).

        `pad_rows_to` overrides the batch-bucket ladder with an exact padded
        row count, and `budget_frames` pins the frame budget directly
        (instead of deriving it from the group's longest real row) — both
        exist so a serving layer can pin its compiled-program grid to a
        handful of shapes (compiles cost 40-100 s on the tunneled dev chip
        and the cross-process persistent cache misses whenever the device
        assignment changes, so every extra shape is a risk of a
        mid-traffic stall). The serving layer calibrates budget_frames per
        voice (frames-per-phoneme varies: ~6 on real voices, ~1.4 on the
        synthetic ones — a fixed heuristic wastes multiples of decode
        compute on the wrong voice)."""
        b = len(ids_batch)
        if pad_rows_to is not None:
            if pad_rows_to < b:
                raise ValueError(f"pad_rows_to {pad_rows_to} < group size {b}")
            lengths, p_bucket, ids = self._validate_and_pad(
                ids_batch + [ids_batch[0]] * (pad_rows_to - b),
                pad_batch=False)
        else:
            lengths, p_bucket, ids = self._validate_and_pad(ids_batch)
        bp = ids.shape[0]
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        sids = None
        if speaker_ids is not None:
            sids = list(speaker_ids) + [speaker_ids[0]] * (bp - b)
        sid = self._sid_array(sids, bp,
                              mixes=self._pad_mixes(speaker_mixes, b, bp))
        seed_j = jnp.uint32(_seed_u32(self.options.seed if seed is None else seed))
        # Budget from the longest REAL row (dummy rows copy row 0, so they
        # cannot need more frames than it) — or pinned by the caller for a
        # stable program grid.
        if budget_frames is not None:
            budget = max(32, int(budget_frames))
        else:
            budget = max(32, int(lengths[:b].max())
                         * self.options.fused_frames_per_phoneme)
        try:
            f_bucket = bucket_for(budget, self.options.frame_buckets, "frame")
        except BucketOverflowError:
            f_bucket = self.options.frame_buckets[-1]
        scales_j = jnp.asarray([ns, ls, nw], jnp.float32)
        compiled = self._mark("fused", (bp, p_bucket, f_bucket, self._sid_kind(sid)))
        outs = self._fused_keyed(
            self.params, self._put_batch(ids), self._put_batch(lengths),
            seed_j, scales_j, sid, max_frames=f_bucket,
        )
        meta = {
            "fused_batch": True, "b": b, "f_bucket": f_bucket,
            "hop": self.hparams.hop_length, "compiled": compiled,
            "t_dispatch": time.perf_counter(),
            # Kept for the overflow redo (split path, exact buckets).
            "ids_batch": ids_batch, "scales": (ns, ls, nw),
            "speaker_ids": list(speaker_ids) if speaker_ids is not None else None,
            "speaker_mixes": ([dict(m) for m in speaker_mixes]
                              if speaker_mixes is not None else None),
            "seed": seed,
            # Grid-serving redo escape hatch: rows that overflow the budget
            # are redone through ANOTHER (prewarmed) fused program at this
            # larger budget instead of the blocking split path — a split
            # redo compiles new (rows, frames) programs mid-traffic
            # (measured: one tail row = a 60 s serve-loop stall).
            "overflow_budget_frames": overflow_budget_frames,
            "overflow_pad_rows": overflow_pad_rows,
        }
        return outs, meta

    def _fetch_batch_fused(self, outs, meta) -> List[np.ndarray]:
        """Complete a fused group dispatch: ONE bulk round trip carries the
        audio and both frame-count vectors; overflow rows are redone exactly
        via the (blocking, 2-round-trip) split path."""
        audio, y_len_d, y_total_d = jax.device_get(outs)
        audio = self._as_output(audio)
        y_len = np.asarray(y_len_d).astype(np.int64)
        y_total = np.asarray(y_total_d).astype(np.int64)
        self.profiler.record(
            "fused", meta["f_bucket"],
            (time.perf_counter() - meta["t_dispatch"]) * 1e3, meta["compiled"],
        )
        b, hop = meta["b"], meta["hop"]
        out = [audio[i, : int(y_len[i]) * hop] for i in range(b)]
        overflow = [i for i in range(b) if y_total[i] > meta["f_bucket"]]
        if overflow:
            ns, ls, nw = meta["scales"]
            sids = meta["speaker_ids"]
            mixes = meta.get("speaker_mixes")
            o_sids = [sids[i] for i in overflow] if sids is not None else None
            o_mixes = [mixes[i] for i in overflow] if mixes is not None else None
            o_ids = [meta["ids_batch"][i] for i in overflow]
            ob = meta.get("overflow_budget_frames")
            o_rows = meta.get("overflow_pad_rows")
            if ob and o_rows and len(overflow) <= o_rows:
                # Prewarmed taller grid program; if a row overflows even
                # this budget, the inner fetch (no redo keys) falls back to
                # the exact split path.
                outs2, meta2 = self._dispatch_batch_fused(
                    o_ids, noise_scale=ns, length_scale=ls, noise_w=nw,
                    speaker_ids=o_sids, seed=meta["seed"],
                    pad_rows_to=o_rows, budget_frames=ob,
                    speaker_mixes=o_mixes,
                )
                redone = self._fetch_batch_fused(outs2, meta2)
            else:
                redone = self.synthesize_batch(
                    o_ids, noise_scale=ns, length_scale=ls, noise_w=nw,
                    speaker_ids=o_sids, seed=meta["seed"],
                    speaker_mixes=o_mixes,
                )
            for k, i in enumerate(overflow):
                out[i] = redone[k]
        return out

    def fetch_batch(self, outs, meta) -> List[np.ndarray]:
        """Complete a dispatch_batch: one bulk device round trip, then slice
        each row to its exact length. The profiler's "decode" row for this
        call spans decode dispatch -> audio-fetch complete (compute and
        transfer overlap the NEXT batch's dispatch in pipelined serving)."""
        if meta.get("fused1"):
            return [self.fetch_fused(outs, meta)]
        if meta.get("fused_batch"):
            return self._fetch_batch_fused(outs, meta)
        audio = self._as_output(jax.device_get(outs))
        self.profiler.record(
            "decode", meta["f_bucket"],
            (time.perf_counter() - meta["t_dispatch"]) * 1e3, meta["compiled"],
        )
        y_len = meta["y_len"]
        hop = meta["hop"]
        return [audio[i, : int(y_len[i]) * hop]
                for i in range(meta.get("b", audio.shape[0]))]

    def fetch_fused(self, outs, meta) -> np.ndarray:
        """Complete a dispatch_fused: one device round trip; falls back to a
        blocking split-mode synthesis if the frame budget overflowed."""
        if meta.get("fused_batch"):  # mesh runtime: batched fused path
            return self._fetch_batch_fused(outs, meta)[0]
        audio, y_len, y_total = jax.device_get(outs)
        if int(np.asarray(y_total).max()) > meta["f_bucket"]:
            ns, ls, nw = meta["scales"]
            return self.synthesize(
                meta["ids"], noise_scale=ns, length_scale=ls, noise_w=nw,
                speaker_id=meta["speaker_id"], seed=meta["seed"],
                speaker_mix=meta.get("speaker_mix"),
            )
        hop = self.hparams.hop_length
        return self._as_output(audio)[0, : int(np.asarray(y_len)[0]) * hop]

    def synthesize_debug(
        self,
        phoneme_ids: Sequence[int],
        *,
        max_frames: int = 256,
        seed: Optional[int] = None,
        per_layer: bool = False,
        **scales,
    ) -> dict:
        """Run the full graph returning every module boundary tensor as numpy
        (the analog of the reference's GraphExecutor.execute debug mode).
        per_layer=True additionally returns one tensor per conv/flow-step/attn
        layer keyed by its checkpoint parameter path, for bisecting a
        divergence to a single layer."""
        from piper_tpu.models.vits.model import debug_infer

        ids = np.asarray(list(phoneme_ids), np.int32)[None]
        p_bucket = bucket_for(ids.shape[1], self.options.phoneme_buckets, "phoneme")
        ids = np.pad(ids, ((0, 0), (0, p_bucket - ids.shape[1])))
        rng = np.random.default_rng(self.options.seed if seed is None else seed)
        dp_noise = rng.standard_normal((1, 2, p_bucket)).astype(np.float32)
        main_noise = rng.standard_normal(
            (1, self.hparams.inter_channels, max_frames)
        ).astype(np.float32)
        ns, ls, nw = self._scales(
            scales.get("noise_scale"), scales.get("length_scale"), scales.get("noise_w")
        )
        sid = self._sid_array(
            [scales["speaker_id"]] if scales.get("speaker_id") is not None else None, 1
        )
        # Jitted: trace_put captures tracers during tracing, so every
        # per-layer entry becomes a program output — one compiled run instead
        # of a (much slower) eager sweep. The jit object is cached per
        # (bucket, frames, mode, baked-in scalars): a bisection session calls
        # this repeatedly with identical settings, and a fresh jit per call
        # would recompile the full debug graph every time (20-40 s on TPU).
        # speaker_id's VALUE is part of the key: `sid` is closed over, so it
        # bakes into the traced program as a constant.
        # Bounded LRU: a bisection sweep over many scale values would
        # otherwise accumulate compiled debug programs (and their device
        # memory) for the runtime's lifetime; only the repeated-identical-
        # settings case needs the cache.
        key = (p_bucket, max_frames, per_layer, ns, ls, nw,
               scales.get("speaker_id"))
        if not hasattr(self, "_debug_jits"):
            from collections import OrderedDict

            self._debug_jits = OrderedDict()
        fn = self._debug_jits.get(key)
        if fn is not None:
            self._debug_jits.move_to_end(key)
        if fn is None:
            def run(params, ids_j, lengths_j, dpn, mn):
                with jax.default_matmul_precision(self._matmul_precision()):
                    return debug_infer(
                        params, self.hparams, ids_j, lengths_j, dpn, mn,
                        max_frames=max_frames, noise_scale=ns, length_scale=ls,
                        noise_w=nw, sid=sid, per_layer=per_layer,
                    )

            fn = self._debug_jits[key] = jax.jit(run)
            while len(self._debug_jits) > 8:
                self._debug_jits.popitem(last=False)
        out = fn(
            self.params, jnp.asarray(ids),
            jnp.asarray([len(phoneme_ids)], jnp.int32),
            jnp.asarray(dp_noise), jnp.asarray(main_noise),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    # -- internals ---------------------------------------------------------

    def _scales(self, noise_scale, length_scale, noise_w):
        """Plain Python floats — call sites convert once. (Device scalars here
        would turn every later float() into a ~30 ms tunnel round trip.)
        Validates: a hostile/buggy caller's length_scale <= 0 or NaN would
        otherwise clamp into silent/garbage audio instead of erroring."""
        inf = self.config.inference
        ns = inf.noise_scale if noise_scale is None else float(noise_scale)
        ls = inf.length_scale if length_scale is None else float(length_scale)
        nw = inf.noise_w if noise_w is None else float(noise_w)
        validate_scales(ns, ls, nw)
        return ns, ls, nw

    def speaker_index(self, spec) -> int:
        """Speaker name or id -> validated integer id, via the voice
        config's speaker_id_map (e.g. 'alba' -> 3). The synthesis APIs take
        integer ids; surfaces that accept names resolve through this."""
        return resolve_speaker(spec, self.hparams.n_speakers,
                               self.config.speaker_id_map
                               if self.config else None)

    def resolve_speaker_mix(self, mix: dict) -> dict:
        """{name_or_id: weight} -> {int_id: weight}: string keys resolve
        through speaker_index (map-wins for numeric names); collisions
        after resolution ('alba' and her id both present) raise instead of
        silently dropping a weight. Non-integral keys keep the strict
        rejection validate_speaker_mix enforces (bool(True) is NOT
        speaker 1)."""
        if not mix:
            raise ValueError("speaker_mix must not be empty")
        out = {}
        for k, w in mix.items():
            if isinstance(k, str):
                key = self.speaker_index(k)
            elif isinstance(k, bool) or not isinstance(k, (int, np.integer)):
                raise ValueError(
                    f"speaker_mix key {k!r} is not a speaker id or name")
            else:
                key = int(k)
            if key in out:
                raise ValueError(f"speaker_mix names speaker {key} twice")
            out[key] = w
        return out

    def _sid_array(self, speaker_ids: Optional[Sequence[int]], batch: int,
                   putter=None, mixes=None):
        """Speaker conditioning argument: (B,) int32 ids, or — when `mixes`
        (a list of {speaker_id: weight} dicts) is given — (B, n_speakers)
        float32 blending weights (see vits.speaker_embedding). Rows beyond
        len(mixes) copy row 0 (batch-ladder dummy rows)."""
        n_spk = self.hparams.n_speakers
        if mixes is not None:
            if len(mixes) != batch:
                # Callers pad dummy rows explicitly (_pad_mixes) — a silent
                # fallback here could hand a short caller list row 0's mix
                # for REAL rows (wrong voice, no error).
                raise ValueError(
                    f"speaker_mixes length {len(mixes)} != batch size {batch}")
            if speaker_ids is not None:
                raise ValueError("pass speaker_id OR speaker_mix, not both")
            w = np.zeros((batch, max(1, n_spk)), np.float32)
            for i, mix in enumerate(mixes):
                validate_speaker_mix(mix, n_spk)
                for s, wt in mix.items():
                    w[i, int(s)] = float(wt)
            putter = putter or self._put_batch
            return putter(w)
        if n_spk <= 1:
            return None
        if speaker_ids is None:
            speaker_ids = [0] * batch
        else:
            # JAX clamps out-of-bounds gather indices, so an unvalidated id
            # would silently return the LAST speaker's voice (negative ids
            # the first's). Serving layers validate at their doors; this is
            # the backstop for direct-runtime callers (render_ssml et al.).
            bad = [s for s in speaker_ids if not 0 <= int(s) < n_spk]
            if bad:
                raise ValueError(
                    f"speaker_id {int(bad[0])} out of range [0, {n_spk})")
        putter = putter or self._put_batch
        return putter(np.asarray(speaker_ids, dtype=np.int32))

    @staticmethod
    def _pad_mixes(mixes, b: int, bp: int):
        """One COPIED mix per real row, padded with copies of row 0's mix
        for the batch-ladder dummy rows (the speaker_ids idiom). Copies
        guard against callers mutating a submitted dict before a deferred
        dispatch uses it; the length check catches too-few-mixes loudly
        instead of conditioning real rows on row 0's mix."""
        if mixes is None:
            return None
        mixes = [dict(m) if m is not None else None for m in mixes]
        if len(mixes) != b:
            raise ValueError(
                f"speaker_mixes length {len(mixes)} != batch size {b}")
        return mixes + [mixes[0]] * (bp - b)

    @staticmethod
    def _sid_kind(sid):
        """Program-cache tag for the speaker argument: None / "id" (int
        lookup) / "mix" (blending weights) — the three compile distinctly."""
        if sid is None:
            return None
        return "mix" if getattr(sid, "ndim", 1) == 2 else "id"

    def _mark(self, kind: str, key) -> bool:
        with self._lock:
            k = (kind, key)
            if k in self._compiled_keys:
                return False
            self._compiled_keys.add(k)
            return True

    def _synthesize_batch_impl(
        self,
        ids_batch: List[List[int]],
        *,
        noise_scale,
        length_scale,
        noise_w,
        speaker_ids,
        seed=None,
        dp_noise: Optional[np.ndarray] = None,
        main_noise: Optional[np.ndarray] = None,
        speaker_mixes=None,
    ) -> Tuple[List[np.ndarray], RunTimings]:
        with self._lock:
            return self._synthesize_batch_locked(
                ids_batch, noise_scale=noise_scale, length_scale=length_scale,
                noise_w=noise_w, speaker_ids=speaker_ids, seed=seed,
                dp_noise=dp_noise, main_noise=main_noise,
                speaker_mixes=speaker_mixes,
            )

    def _synthesize_batch_locked(
        self,
        ids_batch: List[List[int]],
        *,
        noise_scale,
        length_scale,
        noise_w,
        speaker_ids,
        seed=None,
        dp_noise: Optional[np.ndarray] = None,
        main_noise: Optional[np.ndarray] = None,
        speaker_mixes=None,
    ) -> Tuple[List[np.ndarray], RunTimings]:
        t_start = time.perf_counter()
        hp = self.hparams
        b = len(ids_batch)
        # Injected-noise calls provide exactly b rows of noise — no batch
        # padding there (they are test/bisection paths, not serving); on a
        # mesh they run fully replicated for the same reason.
        injected = dp_noise is not None or main_noise is not None
        lengths, p_bucket, ids = self._validate_and_pad(
            ids_batch, pad_batch=not injected)
        bp = ids.shape[0]
        ns, ls, nw = self._scales(noise_scale, length_scale, noise_w)
        if speaker_ids is not None and bp > b:
            speaker_ids = list(speaker_ids) + [speaker_ids[0]] * (bp - b)
        putter = self._put_repl if injected else self._put_batch
        sid = self._sid_array(speaker_ids, bp, putter=putter,
                              mixes=self._pad_mixes(speaker_mixes, b, bp))
        base_seed = _seed_u32(self.options.seed if seed is None else seed)
        seed_j = jnp.uint32(base_seed)

        ids_j = putter(ids)
        lengths_j = putter(lengths)
        compiled = False

        # --- fused single-round-trip path ---
        # Fused mode optimizes single-utterance latency; batches want the
        # exact split-chosen frame bucket (the heuristic budget would waste
        # decode FLOPs on every utterance in the batch).
        use_fused = (
            self.options.mode == "fused"
            and b == 1
            and dp_noise is None
            and main_noise is None
        )
        if use_fused:
            budget = max(32, int(lengths.max()) * self.options.fused_frames_per_phoneme)
            try:
                f_bucket = bucket_for(budget, self.options.frame_buckets, "frame")
            except BucketOverflowError:
                f_bucket = self.options.frame_buckets[-1]
            scales_j = jnp.asarray([ns, ls, nw], jnp.float32)
            compiled |= self._mark("fused", (bp, p_bucket, f_bucket, self._sid_kind(sid)))
            audio, y_len_d, y_total_d = self._fused_keyed(
                self.params, ids_j, lengths_j, seed_j, scales_j, sid,
                max_frames=f_bucket,
            )
            audio, y_len, y_total = jax.device_get((audio, y_len_d, y_total_d))
            t_encode = time.perf_counter()
            if int(y_total.max()) > f_bucket:
                # Budget exceeded (long durations): redo exactly via split.
                use_fused = False
            else:
                audio = self._as_output(audio)
                y_len = np.asarray(y_len).astype(np.int64)
                t_end = time.perf_counter()

        if not use_fused:
            # --- encode ---
            if dp_noise is not None:
                dpn = np.zeros((b, 2, p_bucket), np.float32)
                src = np.asarray(dp_noise, np.float32).reshape(b, 2, -1)
                dpn[:, :, : src.shape[-1]] = src
                compiled |= self._mark("enc_inj", (bp, p_bucket, self._sid_kind(sid)))
                enc = self._encode_injected(self.params, ids_j, lengths_j,
                                            putter(dpn), ls, nw, sid)
            else:
                compiled |= self._mark("enc_key", (bp, p_bucket, self._sid_kind(sid)))
                enc = self._encode_keyed(self.params, ids_j, lengths_j, seed_j,
                                         ls, nw, sid)

            # Host sync point: frame counts decide the decode bucket (the one
            # unavoidable "flush"; everything else stays on device). y_total
            # is computed inside the encode program, so this is a plain
            # ready-array fetch — one round trip.
            y_lengths = np.asarray(enc.y_total).astype(np.int64)
            t_encode = time.perf_counter()
            # Degenerate durations (extreme length_scale / pathological
            # inputs) clamp to the largest bucket and truncate the tail
            # rather than failing the request.
            f_bucket = self._frame_bucket_or_clamp(int(y_lengths[:b].max()))

            # --- decode ---
            if main_noise is not None:
                src = np.asarray(main_noise, np.float32).reshape(b, hp.inter_channels, -1)
                try:
                    f_bucket = bucket_for(
                        max(1, int(y_lengths.max()), src.shape[-1]),
                        self.options.frame_buckets, "frame")
                except BucketOverflowError:
                    f_bucket = self.options.frame_buckets[-1]
                    src = src[:, :, :f_bucket]
                mn = np.zeros((b, hp.inter_channels, f_bucket), np.float32)
                mn[:, :, : src.shape[-1]] = src
                compiled |= self._mark("dec_inj", (bp, f_bucket, self._sid_kind(sid)))
                audio, _ = self._decode_injected(self.params, enc, putter(mn), ns)
            else:
                compiled |= self._mark("dec_key", (bp, f_bucket, self._sid_kind(sid)))
                audio, _ = self._decode_keyed(self.params, enc, seed_j, ns,
                                              max_frames=f_bucket)
            # y_len is derivable on the host — fetch only the audio (second
            # and final round trip).
            audio = self._as_output(audio)
            y_len = np.clip(y_lengths, 1, f_bucket)[:b]
            t_end = time.perf_counter()

        hop = hp.hop_length
        out = [audio[i, : int(y_len[i]) * hop] for i in range(b)]
        total_samples = int(sum(len(a) for a in out))
        wall = t_end - t_start
        if use_fused:
            self.profiler.record("fused", f_bucket, wall * 1e3, compiled)
        else:
            self.profiler.record("encode", p_bucket, (t_encode - t_start) * 1e3, compiled)
            self.profiler.record("decode", f_bucket, (t_end - t_encode) * 1e3, compiled)
        if self._trace:
            import sys

            print(
                f"[piper-tpu] B={b} P={p_bucket} T={f_bucket} "
                f"{'fused' if use_fused else 'split'} wall={wall * 1e3:.1f}ms "
                f"compiled={compiled}",
                file=sys.stderr,
            )
        timings = RunTimings(
            wall_ms=wall * 1e3,
            encode_ms=(t_encode - t_start) * 1e3,
            decode_ms=(t_end - t_encode) * 1e3,
            phoneme_bucket=p_bucket,
            frame_bucket=f_bucket,
            frames=int(y_len.sum()),
            samples=total_samples,
            compiled=compiled,
            compile_count=len(self._compiled_keys),
            rtf=(total_samples / self.sample_rate) / wall if wall > 0 else 0.0,
        )
        return out, timings
