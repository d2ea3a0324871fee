"""Op-level parity tests against torch (conv wrappers, spline forward/inverse)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from piper_tpu.ops.conv import conv1d, conv1d_same, conv_transpose1d
from piper_tpu.ops.spline import rational_quadratic_spline


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,t",
    [
        (4, 3, 16, 8, 4, 10),   # HiFi-GAN ups.0 shape pattern
        (6, 2, 4, 2, 1, 9),     # ups.2/3 pattern
        (3, 5, 5, 3, 2, 7),     # K not a multiple of stride
        (2, 2, 3, 1, 1, 8),     # stride 1 path
        (4, 4, 7, 4, 0, 6),     # no padding
        (1, 1, 16, 8, 4, 1),    # single-frame input
    ],
)
def test_conv_transpose1d_matches_torch(cin, cout, k, stride, padding, t):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cin, t)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    got = conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=padding
    )
    with torch.no_grad():
        want = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=padding,
        )
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,out_pad,t",
    [(3, 4, 6, 4, 1, 2, 7), (2, 2, 8, 4, 2, 3, 5), (2, 3, 5, 3, 2, 2, 9)],
)
def test_conv_transpose1d_output_padding(cin, cout, k, stride, padding, out_pad, t):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, cin, t)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    got = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           stride=stride, padding=padding, output_padding=out_pad)
    with torch.no_grad():
        want = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                  torch.from_numpy(b), stride=stride,
                                  padding=padding, output_padding=out_pad)
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    with pytest.raises(ValueError):
        conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride=stride,
                         padding=padding, output_padding=stride)


@pytest.mark.parametrize("groups,dilation", [(1, 1), (1, 3), (4, 1), (4, 2)])
def test_conv1d_matches_torch(groups, dilation):
    rng = np.random.default_rng(1)
    cin = cout = 8
    x = rng.standard_normal((2, cin, 20)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, 5)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    pad = 2 * dilation
    got = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                 padding=pad, dilation=dilation, groups=groups)
    with torch.no_grad():
        want = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                        padding=pad, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_spline_forward_inverse_roundtrip():
    rng = np.random.default_rng(2)
    shape = (3, 1, 11)
    nb = 10
    x = (rng.standard_normal(shape) * 2).astype(np.float32)
    uw = rng.standard_normal(shape + (nb,)).astype(np.float32)
    uh = rng.standard_normal(shape + (nb,)).astype(np.float32)
    ud = rng.standard_normal(shape + (nb - 1,)).astype(np.float32)
    y, ld_f = rational_quadratic_spline(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud), inverse=False
    )
    x_back, ld_i = rational_quadratic_spline(
        y, jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud), inverse=True
    )
    np.testing.assert_allclose(np.asarray(x_back), x, atol=2e-4)
    # log-determinants of inverse directions cancel
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=2e-3)


def test_spline_tails_identity():
    nb = 10
    x = jnp.asarray(np.array([-7.0, 6.0, 100.0], np.float32))
    uw = jnp.zeros((3, nb))
    uh = jnp.zeros((3, nb))
    ud = jnp.zeros((3, nb - 1))
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ld), np.zeros(3, np.float32))
