"""Incremental (windowed) streaming decode tests."""

import numpy as np
import pytest

from piper_tpu.models.vits.hparams import PRESETS, receptive_field_frames

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_receptive_field_reasonable():
    rf = receptive_field_frames(PRESETS["medium"])
    assert 20 <= rf <= 120, rf
    rf_x = receptive_field_frames(PRESETS["x_low"])
    assert 20 <= rf_x <= 120, rf_x


def test_incremental_matches_full_decode(runtime):
    """With shared injected noise, windowed streaming must reproduce the full
    decode on the emitted region (halo = receptive field)."""
    hp = runtime.hparams
    rng = np.random.default_rng(11)
    ids = FIXTURE_IDS * 3  # longer utterance => several chunks
    dp_noise = rng.standard_normal((1, 2, len(ids))).astype(np.float32)
    full = runtime.synthesize(ids, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    full = runtime.synthesize(ids, dp_noise=dp_noise, main_noise=main_noise)

    chunks = list(
        runtime.synthesize_stream_incremental(
            ids,
            chunk_frames=16,
            dp_noise=dp_noise,
            main_noise=main_noise,
            total_frames=fb,
        )
    )
    assert chunks[-1].is_final
    streamed = np.concatenate([c.samples for c in chunks])
    assert len(streamed) == len(full)
    np.testing.assert_allclose(streamed, full, atol=1e-5)
    # offsets are contiguous
    offs = [c.start_sample_index for c in chunks]
    sizes = [len(c.samples) for c in chunks]
    assert offs == [int(np.sum(sizes[:i])) for i in range(len(sizes))]


def test_incremental_seeded_deterministic(runtime):
    a1 = np.concatenate(
        [c.samples for c in runtime.synthesize_stream(FIXTURE_IDS, incremental=True)]
    )
    a2 = np.concatenate(
        [c.samples for c in runtime.synthesize_stream(FIXTURE_IDS, incremental=True)]
    )
    np.testing.assert_array_equal(a1, a2)
    assert len(a1) > 0 and np.isfinite(a1).all()


def test_incremental_chunk_boundaries_consistent(runtime):
    """Different chunk sizes must produce identical audio (same noise)."""
    hp = runtime.hparams
    rng = np.random.default_rng(12)
    dp_noise = rng.standard_normal((1, 2, len(FIXTURE_IDS))).astype(np.float32)
    runtime.synthesize(FIXTURE_IDS, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    kw = dict(dp_noise=dp_noise, main_noise=main_noise, total_frames=fb)
    a_16 = np.concatenate(
        [c.samples for c in runtime.synthesize_stream_incremental(
            FIXTURE_IDS, chunk_frames=16, **kw)]
    )
    a_8 = np.concatenate(
        [c.samples for c in runtime.synthesize_stream_incremental(
            FIXTURE_IDS, chunk_frames=8, **kw)]
    )
    assert len(a_16) == len(a_8)
    np.testing.assert_allclose(a_16, a_8, atol=1e-5)


def test_insufficient_halo_detectable(runtime):
    """Sanity: a halo far below the receptive field must NOT reproduce the
    full decode — proving the exactness test has teeth."""
    hp = runtime.hparams
    rng = np.random.default_rng(13)
    ids = FIXTURE_IDS * 3
    dp_noise = rng.standard_normal((1, 2, len(ids))).astype(np.float32)
    runtime.synthesize(ids, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    full = runtime.synthesize(ids, dp_noise=dp_noise, main_noise=main_noise)
    streamed = np.concatenate(
        [c.samples for c in runtime.synthesize_stream_incremental(
            ids, chunk_frames=16, halo_frames=1,
            dp_noise=dp_noise, main_noise=main_noise, total_frames=fb)]
    )
    assert np.abs(streamed - full).max() > 1e-4


def test_growing_schedule_matches_fixed(runtime):
    """The default growing window schedule (small first window for TTFB,
    doubling steady-state windows) must produce the same audio as a fixed
    window size — same injected noise, different window plans."""
    hp = runtime.hparams
    rng = np.random.default_rng(14)
    ids = FIXTURE_IDS * 4
    dp_noise = rng.standard_normal((1, 2, len(ids))).astype(np.float32)
    runtime.synthesize(ids, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    kw = dict(dp_noise=dp_noise, main_noise=main_noise, total_frames=fb)
    fixed = np.concatenate(
        [c.samples for c in runtime.synthesize_stream_incremental(
            ids, chunk_frames=16, **kw)]
    )
    grown = list(runtime.synthesize_stream_incremental(
        ids, chunk_schedule=(8, 16, 32), **kw))
    # the plan actually grows: 8, 16, then 32-frame windows
    hop = hp.hop_length
    sizes = [len(c.samples) for c in grown[:-1]]  # last window is trimmed
    assert sizes[0] == 8 * hop and (len(sizes) < 2 or sizes[1] == 16 * hop)
    assert all(s == 32 * hop for s in sizes[2:])
    streamed = np.concatenate([c.samples for c in grown])
    assert len(streamed) == len(fixed)
    np.testing.assert_allclose(streamed, fixed, atol=1e-5)
    offs = [c.start_sample_index for c in grown]
    all_sizes = [len(c.samples) for c in grown]
    assert offs == [int(np.sum(all_sizes[:i])) for i in range(len(all_sizes))]
    assert grown[-1].is_final


def test_fused_head_matches_split_seeded(runtime):
    """Seeded streaming defaults to the fused encode+window-0 head (one
    device round trip to first audio). It must produce the same stream as
    the split encode/window path — same windows, offsets, and samples."""
    ids = FIXTURE_IDS * 4
    fused = list(runtime.synthesize_stream_incremental(
        ids, chunk_schedule=(8, 16, 32), seed=7))
    split = list(runtime.synthesize_stream_incremental(
        ids, chunk_schedule=(8, 16, 32), seed=7, fused_head=False))
    assert [c.start_sample_index for c in fused] == [
        c.start_sample_index for c in split]
    assert [len(c.samples) for c in fused] == [len(c.samples) for c in split]
    assert fused[-1].is_final and split[-1].is_final
    a = np.concatenate([c.samples for c in fused])
    b = np.concatenate([c.samples for c in split])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_head_single_window_stream(runtime):
    """An utterance that fits in window 0 ends after the head: the
    speculatively dispatched window 1 is discarded and the single chunk is
    final with the exact utterance length."""
    ref = runtime.synthesize(FIXTURE_IDS, seed=3)
    chunks = list(runtime.synthesize_stream_incremental(
        FIXTURE_IDS, chunk_frames=4096, seed=3))
    assert len(chunks) == 1 and chunks[0].is_final
    assert chunks[0].start_sample_index == 0
    assert len(chunks[0].samples) == len(ref)


def test_fused_head_rejects_injected_noise(runtime):
    hp = runtime.hparams
    dp = np.zeros((1, 2, len(FIXTURE_IDS)), np.float32)
    with pytest.raises(ValueError, match="seeded-only"):
        list(runtime.synthesize_stream_incremental(
            FIXTURE_IDS, dp_noise=dp, fused_head=True))
