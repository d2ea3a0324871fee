"""Sequence-mask helpers.

The reference's graph carries dynamic shapes and realizes masks through
NonZero/Where/ScatterND machinery (GraphExecutor.swift:2379-2602); on TPU we
keep every shape static and use explicit masks everywhere instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, 1, max_length) float mask of 1.0 for valid steps."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    mask = pos[None, :] < lengths[:, None]
    return mask[:, None, :].astype(jnp.float32)


def generate_path(w_ceil: jnp.ndarray, x_mask: jnp.ndarray, y_mask: jnp.ndarray) -> jnp.ndarray:
    """Monotonic duration -> alignment path, fully static-shape.

    Args:
      w_ceil: (B, P) integer-valued durations (float dtype), already masked.
      x_mask: (B, 1, P) phoneme validity mask.
      y_mask: (B, 1, T) frame validity mask.
    Returns:
      path: (B, T, P) with path[b, t, p] = 1 iff frame t is aligned to
      phoneme p, i.e. cum[p-1] <= t < cum[p].

    Matches VITS `generate_path` semantics (cumsum -> shifted-mask subtract)
    without the dynamic flatten/pad the ONNX export lowers to.
    """
    cum = jnp.cumsum(w_ceil, axis=-1)  # (B, P)
    t_idx = jnp.arange(y_mask.shape[-1], dtype=w_ceil.dtype)  # (T,)
    # below[b, t, p] = t < cum[b, p]
    below = t_idx[None, :, None] < cum[:, None, :]
    # below_prev[b, t, p] = t < cum[b, p-1] (cum[-1] := 0)
    cum_prev = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=-1)
    below_prev = t_idx[None, :, None] < cum_prev[:, None, :]
    path = jnp.logical_and(below, jnp.logical_not(below_prev)).astype(w_ceil.dtype)
    # Mask invalid frames/phonemes.
    path = path * y_mask.transpose(0, 2, 1) * x_mask
    return path
