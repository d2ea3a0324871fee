"""Pallas kernel correctness in interpreter mode (CI-runnable on CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from piper_tpu.ops.pallas.conv import pallas_conv1d_same
from piper_tpu.ops.pallas.resblock import pallas_resblock1_branch


@pytest.mark.parametrize(
    "ch,k,d,n,slope",
    [(32, 11, 5, 1000, 0.0), (32, 3, 1, 300, 0.1), (64, 7, 3, 2048, 0.1)],
)
def test_fused_conv_matches_torch(ch, k, d, n, slope):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, ch, n)).astype(np.float32)
    w = (rng.standard_normal((ch, ch, k)) * 0.05).astype(np.float32)
    bias = rng.standard_normal((ch,)).astype(np.float32)
    got = pallas_conv1d_same(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        dilation=d, act_slope=slope, tile=512, interpret=True,
    )
    with torch.no_grad():
        xin = torch.from_numpy(x)
        if slope:
            xin = F.leaky_relu(xin, slope)
        want = F.conv1d(xin, torch.from_numpy(w), torch.from_numpy(bias),
                        padding=(k - 1) // 2 * d, dilation=d)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@pytest.mark.parametrize(
    "ch,k,dils,n,bnd",
    [
        (32, 11, (1, 3, 5), 700, None),
        (32, 3, (1, 3, 5), 300, 211),
        (64, 7, (1, 3, 5), 512, 400),
        (32, 11, (1, 2), 256, 100),
    ],
)
def test_fused_resblock_branch_matches_torch(ch, k, dils, n, bnd):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, ch, n)).astype(np.float32) * 0.3
    m = len(dils)
    w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    bounds = None if bnd is None else np.array([bnd, n], np.int32)
    got = pallas_resblock1_branch(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2),
        kernel=k, dilations=dils,
        bounds=None if bounds is None else jnp.asarray(bounds),
        tile=512, interpret=True,
    )
    # torch reference with the kernel's exact-length masking semantics
    with torch.no_grad():
        y = torch.from_numpy(x)
        mask = torch.ones((2, 1, n))
        if bounds is not None:
            for bi, bv in enumerate(bounds):
                mask[bi, 0, bv:] = 0
        for mi, d in enumerate(dils):
            t1 = F.leaky_relu(y, 0.1) * mask
            t1 = F.conv1d(t1, torch.from_numpy(w1[mi]), torch.from_numpy(b1[mi]),
                          padding=(k - 1) // 2 * d, dilation=d)
            t2 = F.leaky_relu(t1, 0.1) * mask
            t2 = F.conv1d(t2, torch.from_numpy(w2[mi]), torch.from_numpy(b2[mi]),
                          padding=(k - 1) // 2)
            y = y + t2
    np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=1e-5)
