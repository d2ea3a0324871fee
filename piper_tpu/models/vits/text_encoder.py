"""VITS text encoder: phoneme embedding + relative-position transformer.

Functional module over the flat param store. Produces the hidden sequence
plus the prior stats (m, logs). All shapes static; variable length is
carried by `x_mask`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.params import Params, Prefix
from piper_tpu.ops.attention import multi_head_attention
from piper_tpu.ops.conv import conv1d, conv1d_same
from piper_tpu.ops.masking import sequence_mask
from piper_tpu.ops.nn import layer_norm_channels
from piper_tpu.utils.debug_trace import trace_put


def _ffn(x: jnp.ndarray, x_mask: jnp.ndarray, p: Prefix) -> jnp.ndarray:
    """Encoder feed-forward: conv(k) -> relu -> conv(k), same-padded, masked."""
    h = conv1d_same(x * x_mask, p["conv_1.weight"], p["conv_1.bias"])
    h = jnp.maximum(h, 0.0)
    h = conv1d_same(h * x_mask, p["conv_2.weight"], p["conv_2.bias"])
    return h * x_mask


def _attn_layer(
    x: jnp.ndarray, attn_mask: jnp.ndarray, p: Prefix, hp: VitsHParams
) -> jnp.ndarray:
    q = conv1d(x, p["conv_q.weight"], p["conv_q.bias"])
    k = conv1d(x, p["conv_k.weight"], p["conv_k.bias"])
    v = conv1d(x, p["conv_v.weight"], p["conv_v.bias"])
    out = multi_head_attention(
        q,
        k,
        v,
        n_heads=hp.n_heads,
        attn_mask=attn_mask,
        emb_rel_k=p["emb_rel_k"] if "emb_rel_k" in p else None,
        emb_rel_v=p["emb_rel_v"] if "emb_rel_v" in p else None,
        window_size=hp.window_size,
    )
    return conv1d(out, p["conv_o.weight"], p["conv_o.bias"])


def encoder(
    x: jnp.ndarray, x_mask: jnp.ndarray, params: Params, hp: VitsHParams, prefix: str
) -> jnp.ndarray:
    """Transformer encoder stack on (B, H, T)."""
    p = Prefix(params, prefix)
    attn_mask = x_mask[:, :, None, :] * x_mask[:, :, :, None]  # (B,1,T,T)
    x = x * x_mask
    for i in range(hp.n_layers):
        y = _attn_layer(x, attn_mask, p.sub(f"attn_layers.{i}"), hp)
        trace_put(f"{prefix}.attn_layers.{i}", y)
        n1 = p.sub(f"norm_layers_1.{i}")
        x = layer_norm_channels(x + y, n1["gamma"], n1["beta"])
        trace_put(f"{prefix}.norm_layers_1.{i}", x)
        y = _ffn(x, x_mask, p.sub(f"ffn_layers.{i}"))
        trace_put(f"{prefix}.ffn_layers.{i}", y)
        n2 = p.sub(f"norm_layers_2.{i}")
        x = layer_norm_channels(x + y, n2["gamma"], n2["beta"])
        trace_put(f"{prefix}.norm_layers_2.{i}", x)
    return x * x_mask


def text_encoder(
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    params: Params,
    hp: VitsHParams,
    prefix: str = "enc_p",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, P) int ids -> (x, m_p, logs_p, x_mask) with x of shape (B, H, P)."""
    p = Prefix(params, prefix)
    emb = p["emb.weight"]  # (n_vocab, H)
    x = emb[phoneme_ids] * jnp.sqrt(jnp.asarray(hp.hidden_channels, dtype=emb.dtype))
    x = x.transpose(0, 2, 1)  # (B, H, P)
    x_mask = sequence_mask(lengths, phoneme_ids.shape[1]).astype(x.dtype)
    x = encoder(x, x_mask, params, hp, f"{prefix}.encoder")
    stats = conv1d(x, p["proj.weight"], p["proj.bias"]) * x_mask
    m, logs = jnp.split(stats, 2, axis=1)
    return x, m, logs, x_mask
