"""Small neural-net ops with torch-matching numerics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm_channels(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the channel axis of a (B, C, T) tensor (VITS-style)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * gamma[None, :, None] + beta[None, :, None]


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU (torch's default; jax.nn.gelu defaults to tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def fused_add_tanh_sigmoid_multiply(
    a: jnp.ndarray, b: jnp.ndarray, channels: int
) -> jnp.ndarray:
    """WaveNet gate: tanh(x[:C]) * sigmoid(x[C:]) of (a + b)."""
    s = a + b
    t_act = jnp.tanh(s[:, :channels])
    s_act = jax.nn.sigmoid(s[:, channels:])
    return t_act * s_act
