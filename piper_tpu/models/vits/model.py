"""Full VITS inference graph, composed functionally.

Equivalent surface to the reference's whole-graph execution
(GraphExecutor.executeOutput, GraphExecutor.swift:156-326), but as a single
traced JAX program per static shape bucket: phoneme ids -> waveform.

Split entry points (`encode` / `decode`) exist so the serving engine can pick
the frame bucket on the host between the two compiled programs; `infer` is
the fused single-program variant used when the frame budget is known.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from piper_tpu.models.vits.duration_predictor import stochastic_duration_predictor_reverse
from piper_tpu.models.vits.flows import flow_reverse
from piper_tpu.models.vits.hifigan import hifigan_generator
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import Params
from piper_tpu.models.vits.text_encoder import text_encoder
from piper_tpu.ops.masking import generate_path, sequence_mask


def _matmul_precision(tier: Optional[str]):
    """Context scoping a matmul-precision tier to one model stage (no-op
    context when tier is None, inheriting the caller's precision)."""
    import contextlib

    if tier is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(tier)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EncodeResult:
    """Everything the decode phase needs, all phoneme-axis shaped.

    Registered as a pytree so it can cross jit boundaries (the serving
    engine runs encode and decode as separate compiled programs and picks
    the frame bucket on the host in between).
    """

    m_p: jnp.ndarray        # (B, C, P) prior mean
    logs_p: jnp.ndarray     # (B, C, P) prior log-std
    x_mask: jnp.ndarray     # (B, 1, P)
    w_ceil: jnp.ndarray     # (B, P) integer-valued frame durations
    y_total: jnp.ndarray    # (B,) total frame counts (sum of w_ceil) — computed
                            # in-program so the host reads a ready array instead
                            # of paying an eager-op round trip
    g: Optional[jnp.ndarray]  # (B, gin, 1) speaker embedding or None


def speaker_embedding(
    params: Params, hp: VitsHParams, sid: Optional[jnp.ndarray]
) -> Optional[jnp.ndarray]:
    """Speaker conditioning vector. `sid` is either (B,) int speaker ids
    (embedding lookup) or (B, n_speakers) float mixture weights — voice
    blending: g = weights @ emb_g, at HIGHEST precision so a one-hot row is
    bit-identical to the id lookup (adding exact zeros). Weights need not
    sum to 1; extrapolation (1.2*A - 0.2*B) is deliberate creative range."""
    if hp.n_speakers <= 1 or "emb_g.weight" not in params:
        return None
    if sid is None:
        raise ValueError("multi-speaker model requires a speaker id")
    if sid.ndim == 2:
        g = jnp.einsum("bs,sg->bg", sid.astype(jnp.float32),
                       params["emb_g.weight"],
                       precision=jax.lax.Precision.HIGHEST)
        return g[..., None]  # (B, gin, 1)
    return params["emb_g.weight"][sid][..., None]  # (B, gin, 1)


def encode(
    params: Params,
    hp: VitsHParams,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    dp_noise: jnp.ndarray,
    *,
    length_scale: jnp.ndarray | float = 1.0,
    noise_w: jnp.ndarray | float = 0.8,
    sid: Optional[jnp.ndarray] = None,
) -> EncodeResult:
    """Text encoder + duration predictor: ids (B, P) -> durations + prior."""
    x, m_p, logs_p, x_mask = text_encoder(phoneme_ids, lengths, params, hp)
    dp_noise = dp_noise.astype(x.dtype)  # bf16-weight mode: noise arrives f32
    g = speaker_embedding(params, hp, sid)
    logw = stochastic_duration_predictor_reverse(
        x, x_mask, dp_noise, params, hp, g=g, noise_scale=noise_w
    )
    w = jnp.exp(logw) * x_mask * length_scale
    w_ceil = jnp.ceil(w)[:, 0]  # (B, P)
    y_total = jnp.sum(w_ceil, axis=-1)
    return EncodeResult(
        m_p=m_p, logs_p=logs_p, x_mask=x_mask, w_ceil=w_ceil, y_total=y_total, g=g
    )


def encode_forced(
    params: Params,
    hp: VitsHParams,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    durations: jnp.ndarray,
    *,
    sid: Optional[jnp.ndarray] = None,
) -> EncodeResult:
    """Text encoder with CALLER-SUPPLIED per-phoneme frame durations
    (B, P): the stochastic duration predictor is skipped entirely — no dp
    noise, no flow FLOPs — and `durations` becomes the alignment plan the
    decoder expands (duration forcing, e.g. for dubbing/karaoke timing or
    replaying an edited `phoneme_durations()` plan). Entries beyond each
    row's length are masked to zero; the decode path treats the result
    exactly like a predicted w_ceil."""
    x, m_p, logs_p, x_mask = text_encoder(phoneme_ids, lengths, params, hp)
    g = speaker_embedding(params, hp, sid)
    w_ceil = durations.astype(m_p.dtype) * x_mask[:, 0]
    y_total = jnp.sum(w_ceil, axis=-1)
    return EncodeResult(
        m_p=m_p, logs_p=logs_p, x_mask=x_mask, w_ceil=w_ceil, y_total=y_total, g=g
    )


def decode(
    params: Params,
    hp: VitsHParams,
    enc: EncodeResult,
    main_noise: jnp.ndarray,
    *,
    max_frames: int,
    noise_scale: jnp.ndarray | float = 0.667,
    vocoder_precision: Optional[str] = None,
    flow_precision: Optional[str] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Durations + prior -> waveform.

    main_noise: (B, C, max_frames) standard normal (injectable).
    `vocoder_precision` optionally lowers the matmul precision of just the
    HiFi-GAN stage (it carries ~90% of the FLOPs; its error feeds a bounded
    tanh output, unlike the flow/duration stages whose errors compound).
    `flow_precision` does the same for the reverse residual-coupling flows —
    safe to lower independently of the encoder because z feeds the bounded
    vocoder, whereas duration-predictor error can flip a ceil() and shift
    the whole waveform (keep the encoder at fp32).
    Returns (audio (B, max_frames * hop), y_lengths (B,) in frames).
    """
    y_lengths = jnp.clip(jnp.sum(enc.w_ceil, axis=-1), 1, max_frames)
    y_mask = sequence_mask(y_lengths.astype(jnp.int32), max_frames).astype(enc.m_p.dtype)
    path = generate_path(enc.w_ceil, enc.x_mask, y_mask)  # (B, T, P)
    m_p = jnp.einsum("btp,bcp->bct", path, enc.m_p)
    logs_p = jnp.einsum("btp,bcp->bct", path, enc.logs_p)
    z_p = m_p + main_noise.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
    with _matmul_precision(flow_precision):
        z = flow_reverse(z_p, y_mask, params, hp, g=enc.g)
    # t_mask=y_mask makes every vocoder conv see zeros beyond y_len, exactly
    # like a dynamic-shape decode whose array ends at y_len — without it,
    # bias activations from the bucket-padding region bleed back into the
    # last receptive-field of valid audio (measured 0.23 max-abs).
    audio = hifigan_generator(
        z * y_mask, params, hp, g=enc.g, level_precisions=vocoder_precision,
        use_pallas=use_pallas, t_mask=y_mask,
        t_bounds=y_lengths.astype(jnp.int32),
    )
    return audio[:, 0, :], y_lengths


def per_frame_noise(base_key, t_idx: jnp.ndarray, b: int, ch: int) -> jnp.ndarray:
    """Prior noise derived per ABSOLUTE frame index -> (B, C, len(t_idx)).

    Shared by streaming windows and sequence-parallel decode so overlapping
    halos and shard boundaries see identical values."""
    keys = jax.vmap(lambda t: jax.random.fold_in(base_key, t))(t_idx)
    noise = jax.vmap(lambda k: jax.random.normal(k, (b, ch)))(keys)
    return noise.transpose(1, 2, 0)


def per_row_frame_noise(base_keys, t_idx: jnp.ndarray, ch: int) -> jnp.ndarray:
    """Per-row per-frame prior noise -> (B, C, W).

    base_keys: (B,) PRNG keys (one per stream), t_idx: (B, W) absolute frame
    indices. Row r's value at absolute frame t equals per_frame_noise(
    base_keys[r], [t], 1, ch) — so a stream batched with others sees exactly
    the noise realization it would see decoding alone."""
    def row(key, ts):
        keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(ts)
        return jax.vmap(lambda k: jax.random.normal(k, (1, ch)))(keys)[:, 0, :]
    return jax.vmap(row)(base_keys, t_idx).transpose(0, 2, 1)


def decode_window(
    params: Params,
    hp: VitsHParams,
    enc: EncodeResult,
    main_noise_win: jnp.ndarray,
    t_offset: jnp.ndarray,
    *,
    window: int,
    total_frames: jnp.ndarray,
    noise_scale: jnp.ndarray | float = 0.667,
    vocoder_precision=None,
    flow_precision: Optional[str] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Decode only frames [t_offset, t_offset + window) — streaming.

    `t_offset` and `total_frames` are scalars for a single stream, or (B,)
    arrays to decode one window PER ROW at independent positions — that is
    the batched multi-stream case (N concurrent streams share one program;
    every mask below is already per-row).

    `total_frames` is the virtual full-sequence length (the array edge):
    lanes outside [0, total_frames) are masked through every conv so a window
    edge reproduces the full run's zero padding exactly. With a halo of
    `receptive_field_frames(hp)` on each side, the central region of the
    returned audio is identical to the corresponding slice of a full decode.

    main_noise_win: (B, C, window) — the prior noise for these absolute
    frames (must be consistent across overlapping windows).
    Returns audio (B, window * hop).
    """
    b = enc.m_p.shape[0]
    t_off = jnp.broadcast_to(
        jnp.asarray(t_offset, jnp.int32).reshape(-1), (b,))
    total = jnp.broadcast_to(jnp.asarray(total_frames).reshape(-1), (b,))
    t_idx = t_off[:, None] + jnp.arange(window)[None, :]  # (B, W) absolute
    y_lengths = jnp.clip(jnp.sum(enc.w_ceil, axis=-1), 1, total)
    # Validity inside the sequence (for the prior/flow masking)...
    y_mask = (t_idx[:, None, :] < y_lengths[:, None, None]).astype(enc.m_p.dtype)
    y_mask = y_mask * (t_idx >= 0).astype(enc.m_p.dtype)[:, None, :]
    # ...and inside the virtual array (for conv zero-padding semantics).
    arr_mask = jnp.logical_and(t_idx >= 0, t_idx < total[:, None])
    arr_mask = arr_mask.astype(enc.m_p.dtype)[:, None, :]

    # Alignment path restricted to the window's absolute frames.
    cum = jnp.cumsum(enc.w_ceil, axis=-1)  # (B, P)
    cum_prev = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=-1)
    tf = t_idx.astype(enc.w_ceil.dtype)
    below = tf[:, :, None] < cum[:, None, :]
    below_prev = tf[:, :, None] < cum_prev[:, None, :]
    path = jnp.logical_and(below, jnp.logical_not(below_prev)).astype(enc.w_ceil.dtype)
    path = path * y_mask.transpose(0, 2, 1) * enc.x_mask

    m_p = jnp.einsum("btp,bcp->bct", path, enc.m_p)
    logs_p = jnp.einsum("btp,bcp->bct", path, enc.logs_p)
    z_p = m_p + main_noise_win.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
    with _matmul_precision(flow_precision):
        z = flow_reverse(z_p * arr_mask, y_mask * arr_mask, params, hp, g=enc.g)
    # Mask the vocoder at BOTH the window/array edges and beyond y_len,
    # matching decode()'s exact-length semantics. In window coordinates the
    # combined valid region is the contiguous interval [lo, hi): lo is the
    # left halo clipped at the sequence start, hi is min(y_len, total)
    # relative to the window — expressed as per-row bounds so the fused
    # Pallas branch kernel can apply it in VMEM.
    lo = jnp.clip(-t_off, 0, window).astype(jnp.int32)
    hi = jnp.clip(y_lengths.astype(jnp.int32) - t_off, 0, window)
    audio = hifigan_generator(
        z * y_mask, params, hp, g=enc.g,
        level_precisions=vocoder_precision, t_mask=y_mask * arr_mask,
        use_pallas=use_pallas, t_bounds=jnp.stack([lo, hi], axis=1),
    )
    return audio[:, 0, :]


def debug_infer(
    params: Params,
    hp: VitsHParams,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    dp_noise: jnp.ndarray,
    main_noise: jnp.ndarray,
    *,
    max_frames: int,
    noise_scale: jnp.ndarray | float = 0.667,
    length_scale: jnp.ndarray | float = 1.0,
    noise_w: jnp.ndarray | float = 0.8,
    sid: Optional[jnp.ndarray] = None,
    per_layer: bool = False,
) -> dict:
    """Full inference returning every stage's intermediates.

    The analog of the reference's prefix-execution debug mode
    (GraphExecutor.execute(maxNodeIndex:), GraphExecutor.swift:73-152):
    instead of running the graph up to node N, every module boundary tensor
    comes back in one dict, for parity debugging against an oracle.

    With per_layer=True the dict additionally carries one entry per conv /
    flow step / attention layer, keyed by the checkpoint parameter path that
    produced it (e.g. "flow.flows.2.enc.in_layers.1") — fine-grained enough
    to bisect a single-layer divergence, the way the reference inspects its
    whole value table."""
    from piper_tpu.models.vits.text_encoder import text_encoder as _te
    from piper_tpu.models.vits.duration_predictor import (
        stochastic_duration_predictor_reverse as _sdp,
    )

    import contextlib

    if per_layer:
        from piper_tpu.utils.debug_trace import collecting

        layer_trace: dict = {}
        ctx = collecting(layer_trace)
    else:
        layer_trace = {}
        ctx = contextlib.nullcontext()

    # The `with` guarantees the global trace collector is detached even when
    # the traced body raises (e.g. a missing parameter key on a real
    # checkpoint — exactly the case per-layer bisection exists for);
    # leaking it would capture tracers from every later production trace.
    with ctx:
        x, m_p, logs_p, x_mask = _te(phoneme_ids, lengths, params, hp)
        g = speaker_embedding(params, hp, sid)
        logw = _sdp(x, x_mask, dp_noise, params, hp, g=g, noise_scale=noise_w)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[:, 0]
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=-1), 1, max_frames)
        y_mask = sequence_mask(y_lengths.astype(jnp.int32), max_frames).astype(m_p.dtype)
        path = generate_path(w_ceil, x_mask, y_mask)
        m_p_exp = jnp.einsum("btp,bcp->bct", path, m_p)
        logs_p_exp = jnp.einsum("btp,bcp->bct", path, logs_p)
        z_p = m_p_exp + main_noise * jnp.exp(logs_p_exp) * noise_scale
        z = flow_reverse(z_p, y_mask, params, hp, g=g)
        audio = hifigan_generator(z * y_mask, params, hp, g=g, t_mask=y_mask)
    return {
        **layer_trace,
        "enc_hidden": x,
        "m_p": m_p,
        "logs_p": logs_p,
        "x_mask": x_mask,
        "logw": logw,
        "w_ceil": w_ceil,
        "y_lengths": y_lengths,
        "y_mask": y_mask,
        "path": path,
        "m_p_expanded": m_p_exp,
        "logs_p_expanded": logs_p_exp,
        "z_p": z_p,
        "z": z,
        "audio": audio[:, 0, :],
    }


def infer(
    params: Params,
    hp: VitsHParams,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    dp_noise: jnp.ndarray,
    main_noise: jnp.ndarray,
    *,
    max_frames: int,
    noise_scale: jnp.ndarray | float = 0.667,
    length_scale: jnp.ndarray | float = 1.0,
    noise_w: jnp.ndarray | float = 0.8,
    sid: Optional[jnp.ndarray] = None,
    vocoder_precision: Optional[str] = None,
    flow_precision: Optional[str] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused single-program synthesis: ids -> (audio, y_lengths)."""
    enc = encode(
        params,
        hp,
        phoneme_ids,
        lengths,
        dp_noise,
        length_scale=length_scale,
        noise_w=noise_w,
        sid=sid,
    )
    return decode(params, hp, enc, main_noise, max_frames=max_frames,
                  noise_scale=noise_scale, vocoder_precision=vocoder_precision,
                  flow_precision=flow_precision, use_pallas=use_pallas)
