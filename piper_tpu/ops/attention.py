"""Relative-position windowed multi-head attention (VITS text encoder).

The reference executes this as exported ONNX shape gymnastics — the rank-5
concat and rank-4 axes-[2,3] slice fast paths in GraphExecutor.swift:1071-1089
and :1391-1425 exist solely to serve these pad/reshape tricks. Here it is
re-derived from the VITS semantics with static shapes: everything is plain
pad/reshape/matmul, which XLA fuses around the MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def get_relative_embeddings(emb: jnp.ndarray, length: int, window_size: int) -> jnp.ndarray:
    """Slice/pad the learned relative embeddings to 2*length-1 positions.

    emb: (heads_or_1, 2*window_size+1, k_channels)
    returns: (heads_or_1, 2*length-1, k_channels)
    """
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


def relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative-position logits -> (B, H, L, L) absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # (B,H,L,2L)
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative layout."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))  # (B,H,L,2L-1)
    x = x.reshape(b, h, l * (2 * l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    n_heads: int,
    attn_mask: Optional[jnp.ndarray] = None,
    emb_rel_k: Optional[jnp.ndarray] = None,
    emb_rel_v: Optional[jnp.ndarray] = None,
    window_size: Optional[int] = None,
) -> jnp.ndarray:
    """Self-attention core on (B, C, T) tensors with optional relative bias.

    q/k/v are the already-projected tensors; attn_mask is (B, 1, T, T) with
    zeros at disallowed positions (masked to -1e4, matching VITS).
    """
    b, c, t = q.shape
    k_channels = c // n_heads

    def split_heads(x):
        return x.reshape(b, n_heads, k_channels, t).transpose(0, 1, 3, 2)  # (B,H,T,D)

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
    scale = 1.0 / jnp.sqrt(jnp.asarray(k_channels, dtype=q.dtype))
    scores = jnp.einsum("bhtd,bhsd->bhts", qh * scale, kh)

    if window_size is not None and emb_rel_k is not None:
        rel_k = get_relative_embeddings(emb_rel_k, t, window_size)  # (1or H, 2T-1, D)
        rel_logits = jnp.einsum("bhtd,hrd->bhtr", qh * scale, rel_k)
        scores = scores + relative_to_absolute(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, jnp.asarray(-1e4, dtype=scores.dtype), scores)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", weights, vh)

    if window_size is not None and emb_rel_v is not None:
        rel_w = absolute_to_relative(weights)  # (B,H,T,2T-1)
        rel_v = get_relative_embeddings(emb_rel_v, t, window_size)  # (1orH, 2T-1, D)
        out = out + jnp.einsum("bhtr,hrd->bhtd", rel_w, rel_v)

    return out.transpose(0, 1, 3, 2).reshape(b, c, t)
