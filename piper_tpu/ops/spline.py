"""Piecewise rational-quadratic spline transform with linear tails.

The invertible elementwise transform inside the stochastic duration
predictor's ConvFlow (VITS `transforms.piecewise_rational_quadratic_transform`
semantics). Fully vectorized, static-shape, and finite even for masked
garbage lanes — out-of-interval inputs pass through the identity tail.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    *,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the spline (or its inverse) elementwise.

    x: (...,); unnormalized_{widths,heights}: (..., num_bins);
    unnormalized_derivatives: (..., num_bins - 1) — the boundary derivatives
    at the tails are fixed so the transform is C1 with the identity outside
    [-tail_bound, tail_bound].

    Returns (outputs, logabsdet) with identity/zero outside the interval.
    """
    num_bins = unnormalized_widths.shape[-1]
    left = bottom = -tail_bound
    right = top = tail_bound

    inside = (x >= left) & (x <= right)

    # Linear-tail boundary condition: derivative at the edges equals 1.
    constant = jnp.log(jnp.expm1(1.0 - min_derivative))
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # Clamp to the interval so masked/tail lanes stay finite; select at the end.
    x_in = jnp.clip(x, left, right)
    locations = cumheights if inverse else cumwidths
    # bin index: number of bin edges <= x, minus 1, clipped to a valid bin.
    bin_idx = jnp.sum((x_in[..., None] >= locations[..., :-1]).astype(jnp.int32), axis=-1) - 1
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def g(arr):
        return jnp.take_along_axis(arr, bin_idx, axis=-1)[..., 0]

    in_cw = g(cumwidths)
    in_w = g(widths)
    in_ch = g(cumheights)
    in_h = g(heights)
    in_d = g(derivatives[..., :-1])
    in_d1 = jnp.take_along_axis(derivatives, bin_idx + 1, axis=-1)[..., 0]
    delta = in_h / in_w  # bin slope

    if inverse:
        term = (x_in - in_ch) * (in_d + in_d1 - 2.0 * delta)
        a = term + in_h * (delta - in_d)
        b = in_h * in_d - term
        c = -delta * (x_in - in_ch)
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(disc))
        outputs = root * in_w + in_cw
        theta_1m = root * (1.0 - root)
        denom = delta + (in_d + in_d1 - 2.0 * delta) * theta_1m
        deriv_num = (delta**2) * (
            in_d1 * root**2 + 2.0 * delta * theta_1m + in_d * (1.0 - root) ** 2
        )
        logabsdet = -(jnp.log(deriv_num) - 2.0 * jnp.log(denom))
    else:
        theta = (x_in - in_cw) / in_w
        theta_1m = theta * (1.0 - theta)
        num = in_h * (delta * theta**2 + in_d * theta_1m)
        denom = delta + (in_d + in_d1 - 2.0 * delta) * theta_1m
        outputs = in_ch + num / denom
        deriv_num = (delta**2) * (
            in_d1 * theta**2 + 2.0 * delta * theta_1m + in_d * (1.0 - theta) ** 2
        )
        logabsdet = jnp.log(deriv_num) - 2.0 * jnp.log(denom)

    outputs = jnp.where(inside, outputs, x)
    logabsdet = jnp.where(inside, logabsdet, jnp.zeros_like(logabsdet))
    return outputs, logabsdet
