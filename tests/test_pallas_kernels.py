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
        y = y * mask  # kernel contract: exactly zero outside [lo, hi)
    np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=1e-5)


def test_fused_resblock_branch_two_sided_bounds():
    """(B, 2) [lo, hi) bounds — the streaming-window left edge."""
    rng = np.random.default_rng(1)
    ch, k, dils, n = 32, 7, (1, 3), 512
    x = rng.standard_normal((2, ch, n)).astype(np.float32) * 0.3
    m = len(dils)
    w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    bounds = np.array([[37, 401], [0, 512]], np.int32)
    got = pallas_resblock1_branch(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2),
        kernel=k, dilations=dils, bounds=jnp.asarray(bounds),
        tile=256, interpret=True,
    )
    with torch.no_grad():
        y = torch.from_numpy(x)
        mask = torch.ones((2, 1, n))
        for bi, (lo, hi) in enumerate(bounds):
            mask[bi, 0, :lo] = 0
            mask[bi, 0, hi:] = 0
        for mi, d in enumerate(dils):
            t1 = F.leaky_relu(y, 0.1) * mask
            t1 = F.conv1d(t1, torch.from_numpy(w1[mi]), torch.from_numpy(b1[mi]),
                          padding=(k - 1) // 2 * d, dilation=d)
            t2 = F.leaky_relu(t1, 0.1) * mask
            t2 = F.conv1d(t2, torch.from_numpy(w2[mi]), torch.from_numpy(b2[mi]),
                          padding=(k - 1) // 2)
            y = y + t2
        y = y * mask  # kernel contract: exactly zero outside [lo, hi)
    np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=1e-5)


def test_fused_resblock_dead_tiles_are_zero():
    """Tiles entirely outside [lo, hi) skip their DMA + dots and write
    exact zeros; the valid region is bit-identical to a run without any
    dead tile (bounds tight to the array)."""
    rng = np.random.default_rng(4)
    ch, k, dils, n = 32, 7, (1, 3), 1024
    x = rng.standard_normal((2, ch, n)).astype(np.float32) * 0.3
    m = len(dils)
    w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(b2))
    # row 0: valid [0, 150) -> tiles 1..3 dead at tile=256; row 1: all valid
    bounds = np.array([[0, 150], [0, 1024]], np.int32)
    got = pallas_resblock1_branch(
        *args, kernel=k, dilations=dils, bounds=jnp.asarray(bounds),
        tile=256, interpret=True,
    )
    assert np.all(np.asarray(got)[0, :, 256:] == 0.0)
    # torch reference with the kernel's masking contract
    with torch.no_grad():
        y = torch.from_numpy(x)
        mask = torch.ones((2, 1, n))
        mask[0, 0, 150:] = 0
        for mi, d in enumerate(dils):
            t1 = F.leaky_relu(y, 0.1) * mask
            t1 = F.conv1d(t1, torch.from_numpy(w1[mi]), torch.from_numpy(b1[mi]),
                          padding=(k - 1) // 2 * d, dilation=d)
            t2 = F.leaky_relu(t1, 0.1) * mask
            t2 = F.conv1d(t2, torch.from_numpy(w2[mi]), torch.from_numpy(b2[mi]),
                          padding=(k - 1) // 2)
            y = y + t2
        y = y * mask
    np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=1e-5)


@pytest.mark.parametrize("precision,atol", [("high", 2e-3), ("default", 0.3)])
def test_mxu_dot_precision_tiers(precision, atol):
    """Lower tiers approximate the fp32 kernel within their class tolerance
    ("high" = 3-pass bf16 split, tf32-class; "default" = single bf16 pass)."""
    rng = np.random.default_rng(2)
    ch, k, d, n = 32, 7, 3, 512
    x = rng.standard_normal((1, ch, n)).astype(np.float32)
    w = (rng.standard_normal((ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
    bias = rng.standard_normal((ch,)).astype(np.float32)
    exact = pallas_conv1d_same(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        dilation=d, act_slope=0.1, tile=256, interpret=True,
    )
    approx = pallas_conv1d_same(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        dilation=d, act_slope=0.1, tile=256, interpret=True, precision=precision,
    )
    err = float(np.abs(np.asarray(exact) - np.asarray(approx)).max())
    assert err < atol
    if precision == "high":
        assert err > 0  # it did take the reduced-precision path


@pytest.mark.slow
def test_decode_window_pallas_matches_unfused(monkeypatch):
    """Streaming decode with the fused Pallas path (interpret mode) must
    match the plain XLA lowering — exercises the two-sided bounds plumbing
    through hifigan_generator end to end."""
    monkeypatch.setenv("PIPER_TPU_PALLAS_INTERPRET", "1")
    from piper_tpu.models.vits.hparams import VitsHParams
    from piper_tpu.models.vits import model as vits
    from piper_tpu.models.vits.params import params_from_arrays
    from piper_tpu.models.vits.synthetic import synthetic_params

    hp = VitsHParams(
        n_vocab=40, inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, dp_filter_channels=16, dp_n_flows=2,
        flow_n_flows=1, flow_hidden_channels=16, flow_n_layers=1,
        resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 3], [1, 3]],
        upsample_rates=[4, 2], upsample_initial_channel=64,
        upsample_kernel_sizes=[8, 4],
    )
    params = params_from_arrays(synthetic_params(hp, seed=5))
    rng = np.random.default_rng(0)
    b, p = 2, 12
    ids = jnp.asarray(rng.integers(0, hp.n_vocab, size=(b, p)), jnp.int32)
    lengths = jnp.asarray([p, p - 3], jnp.int32)
    dp_noise = jnp.asarray(rng.standard_normal((b, 2, p)).astype(np.float32))
    enc = vits.encode(params, hp, ids, lengths, dp_noise)

    window, t_offset, total = 24, 8, 40
    noise = jnp.asarray(
        rng.standard_normal((b, hp.inter_channels, window)).astype(np.float32)
    )
    plain = vits.decode_window(
        params, hp, enc, noise, jnp.int32(t_offset),
        window=window, total_frames=jnp.int32(total), use_pallas=False,
    )
    fused = vits.decode_window(
        params, hp, enc, noise, jnp.int32(t_offset),
        window=window, total_frames=jnp.int32(total), use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-5)
    # Left edge too (t_offset < 0: the first streaming window).
    plain0 = vits.decode_window(
        params, hp, enc, noise, jnp.int32(-4),
        window=window, total_frames=jnp.int32(total), use_pallas=False,
    )
    fused0 = vits.decode_window(
        params, hp, enc, noise, jnp.int32(-4),
        window=window, total_frames=jnp.int32(total), use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(fused0), np.asarray(plain0), atol=1e-5)


def _torch_mrf(x, branches, bounds, n):
    """Torch reference for the whole MRF stage (mean of ResBlock1 branches)
    with the kernel's exact-length masking semantics."""
    with torch.no_grad():
        mask = torch.ones((x.shape[0], 1, n))
        if bounds is not None:
            b = np.asarray(bounds)
            if b.ndim == 1:
                b = np.stack([np.zeros_like(b), b], axis=1)
            for bi, (lo, hi) in enumerate(b):
                mask[bi, 0, :lo] = 0
                mask[bi, 0, hi:] = 0
        acc = None
        for (w1, b1, w2, b2, k, dils) in branches:
            y = torch.from_numpy(x)
            for mi, d in enumerate(dils):
                t1 = F.leaky_relu(y, 0.1) * mask
                t1 = F.conv1d(t1, torch.from_numpy(w1[mi]),
                              torch.from_numpy(b1[mi]),
                              padding=(k - 1) // 2 * d, dilation=d)
                t2 = F.leaky_relu(t1, 0.1) * mask
                t2 = F.conv1d(t2, torch.from_numpy(w2[mi]),
                              torch.from_numpy(b2[mi]),
                              padding=(k - 1) // 2)
                y = y + t2
            acc = y if acc is None else acc + y
        return (acc / len(branches) * mask).numpy()


@pytest.mark.parametrize("bnd", [None, [700, 1000], [[37, 401], [0, 1000]]])
def test_fused_mrf_matches_torch(bnd):
    """Whole-MRF kernel (3 branches, HiFi-GAN kernels 3/7/11, dilations
    1/3/5, + mean) vs torch — the production vocoder stage shape."""
    from piper_tpu.ops.pallas.resblock import pallas_resblock1_mrf

    rng = np.random.default_rng(7)
    ch, n = 32, 1000
    dils = (1, 3, 5)
    m = len(dils)
    x = rng.standard_normal((2, ch, n)).astype(np.float32) * 0.3
    branches = []
    for k in (3, 7, 11):
        w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        branches.append((w1, b1, w2, b2, k, dils))
    bounds = None if bnd is None else np.asarray(bnd, np.int32)
    got = pallas_resblock1_mrf(
        jnp.asarray(x),
        [(jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
          k, d) for (w1, b1, w2, b2, k, d) in branches],
        bounds=None if bounds is None else jnp.asarray(bounds),
        tile=256, interpret=True,
    )
    want = _torch_mrf(x, branches, bounds, n)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_fused_mrf_matches_per_branch_kernels():
    """MRF fusion must agree with the per-branch kernels + array mean it
    replaces (same tile/bounds machinery, one shared window)."""
    from piper_tpu.ops.pallas.resblock import pallas_resblock1_mrf

    rng = np.random.default_rng(8)
    ch, n = 16, 640
    dils = (1, 3, 5)
    m = len(dils)
    x = rng.standard_normal((1, ch, n)).astype(np.float32) * 0.3
    branches = []
    for k in (3, 7, 11):
        w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        branches.append((jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
                         jnp.asarray(b2), k, dils))
    bounds = jnp.asarray(np.array([500], np.int32))
    got = pallas_resblock1_mrf(jnp.asarray(x), branches, bounds=bounds,
                               tile=128, interpret=True)
    ys = [pallas_resblock1_branch(jnp.asarray(x), w1, b1, w2, b2, kernel=k,
                                  dilations=d, bounds=bounds, tile=128,
                                  interpret=True)
          for (w1, b1, w2, b2, k, d) in branches]
    want = sum(np.asarray(y) for y in ys) / len(ys)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("force", ["0", "1"])
def test_fuse_mrf_flag_matches_unfused(monkeypatch, force):
    """PIPER_TPU_FUSE_MRF=0 (per-branch kernels everywhere) and =1 (MRF
    fusion at every level) must both match the plain XLA lowering — the
    flag only changes kernel selection, never semantics."""
    monkeypatch.setenv("PIPER_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PIPER_TPU_FUSE_MRF", force)
    from piper_tpu.models.vits.hparams import VitsHParams
    from piper_tpu.models.vits import model as vits
    from piper_tpu.models.vits.params import params_from_arrays
    from piper_tpu.models.vits.synthetic import synthetic_params

    hp = VitsHParams(
        n_vocab=40, inter_channels=16, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=1, dp_filter_channels=16, dp_n_flows=2,
        flow_n_flows=1, flow_hidden_channels=16, flow_n_layers=1,
        resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 3], [1, 3]],
        upsample_rates=[4, 2], upsample_initial_channel=64,
        upsample_kernel_sizes=[8, 4],
    )
    params = params_from_arrays(synthetic_params(hp, seed=5))
    rng = np.random.default_rng(0)
    b, p = 2, 12
    ids = jnp.asarray(rng.integers(0, hp.n_vocab, size=(b, p)), jnp.int32)
    lengths = jnp.asarray([p, p - 3], jnp.int32)
    dp_noise = jnp.asarray(rng.standard_normal((b, 2, p)).astype(np.float32))
    enc = vits.encode(params, hp, ids, lengths, dp_noise)
    window, t_offset, total = 24, 8, 40
    noise = jnp.asarray(
        rng.standard_normal((b, hp.inter_channels, window)).astype(np.float32)
    )
    plain = vits.decode_window(
        params, hp, enc, noise, jnp.int32(t_offset),
        window=window, total_frames=jnp.int32(total), use_pallas=False,
    )
    fused = vits.decode_window(
        params, hp, enc, noise, jnp.int32(t_offset),
        window=window, total_frames=jnp.int32(total), use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-5)


def _rand_mrf_branches(rng, ch, dils=(1, 3, 5), kernels=(3, 7, 11)):
    m = len(dils)
    branches = []
    for k in kernels:
        w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)).astype(np.float32)
        b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
        branches.append((w1, b1, w2, b2, k, dils))
    return branches


@pytest.mark.parametrize("fold", [2, 4])
@pytest.mark.parametrize("bnd", [None, [700, 900], [[37, 401], [0, 998]]])
def test_folded_mrf_matches_torch(fold, bnd):
    """Folded-layout MRF kernel (length axis folded into channels so the
    GEMMs present M=F*C rows) vs torch — production vocoder stage shapes,
    n NOT divisible by the fold, one-sided and two-sided bounds."""
    from piper_tpu.ops.pallas.folded import pallas_resblock1_mrf_folded

    rng = np.random.default_rng(7)
    ch, n = 32, 998
    x = rng.standard_normal((2, ch, n)).astype(np.float32) * 0.3
    branches = _rand_mrf_branches(rng, ch)
    bounds = None if bnd is None else np.asarray(bnd, np.int32)
    got = pallas_resblock1_mrf_folded(
        jnp.asarray(x),
        [(jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
          k, d) for (w1, b1, w2, b2, k, d) in branches],
        fold=fold,
        bounds=None if bounds is None else jnp.asarray(bounds),
        tile=256, interpret=True,
    )
    want = _torch_mrf(x, branches, bounds, n)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_folded_mrf_matches_unfolded_kernel():
    """Folded and unfolded MRF kernels must agree (same semantics, the
    fold only changes the GEMM presentation)."""
    from piper_tpu.ops.pallas.folded import pallas_resblock1_mrf_folded
    from piper_tpu.ops.pallas.resblock import pallas_resblock1_mrf

    rng = np.random.default_rng(8)
    ch, n = 16, 640
    x = rng.standard_normal((1, ch, n)).astype(np.float32) * 0.3
    branches = [
        (jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
         k, d)
        for (w1, b1, w2, b2, k, d) in _rand_mrf_branches(rng, ch)
    ]
    bounds = jnp.asarray(np.array([500], np.int32))
    got = pallas_resblock1_mrf_folded(jnp.asarray(x), branches, fold=4,
                                      bounds=bounds, tile=128, interpret=True)
    want = pallas_resblock1_mrf(jnp.asarray(x), branches, bounds=bounds,
                                tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fold_unfold_roundtrip():
    from piper_tpu.ops.pallas.folded import fold_time_axis, unfold_time_axis

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8, 37)).astype(np.float32)
    for F in (1, 2, 4):
        xr = unfold_time_axis(fold_time_axis(jnp.asarray(x), F), F, 37)
        np.testing.assert_array_equal(np.asarray(xr), x)
