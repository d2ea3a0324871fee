"""Phoneme alignment + row-invariant seeded noise.

The duration predictor's plan (w_ceil) is exposed as a first-class result
(core/alignment.py, PiperRuntime.phoneme_durations) — a capability the
reference computes internally but never surfaces. These tests pin the two
contracts that make it useful:

1. durations == the audio actually produced (sum * hop == sample count);
2. a request's seeded realization is invariant to its co-batched rows and
   the batch rung (per-row noise derivation in encode_keyed/fused_keyed),
   so durations fetched separately describe served audio too.
"""

import json

import numpy as np
import pytest

from piper_tpu.core.alignment import PhonemeAlignment, alignments_to_json, make_alignment
from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions


@pytest.fixture(scope="module")
def rt(tiny_runtime):
    return tiny_runtime


def test_durations_match_audio_length(rt):
    hop = rt.hparams.hop_length
    d = rt.phoneme_durations([FIXTURE_IDS], seed=5)[0]
    audio = rt.synthesize(FIXTURE_IDS, seed=5)
    assert d.shape == (len(FIXTURE_IDS),)
    assert (d >= 0).all()
    assert int(d.sum()) * hop == len(audio)


def test_durations_match_batched_rows(rt):
    hop = rt.hparams.hop_length
    batch = [FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS[:6]]
    durs = rt.phoneme_durations(batch, seed=5)
    audios = rt.synthesize_batch(batch, seed=5)
    for ids, d, a in zip(batch, durs, audios):
        assert d.shape == (len(ids),)
        assert int(d.sum()) * hop == len(a)


def test_durations_invariant_to_batch_shape(rt):
    """b=1 and any co-batch / rung produce the same integer plan (the noise
    realization is per-row derived, independent of the batch tensor)."""
    d1 = rt.phoneme_durations([FIXTURE_IDS], seed=5)[0]
    d3 = rt.phoneme_durations([FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS[:6]],
                              seed=5)[0]
    np.testing.assert_array_equal(d1, d3)
    # does not depend on noise_scale (decoder-only knob)
    dns = rt.phoneme_durations([FIXTURE_IDS], seed=5, noise_scale=9.9)[0]
    np.testing.assert_array_equal(d1, dns)
    # but does depend on length_scale
    dlong = rt.phoneme_durations([FIXTURE_IDS], seed=5, length_scale=2.0)[0]
    assert dlong.sum() > d1.sum()


def test_audio_row_invariance_across_rungs(rt):
    """The same request's audio is the same realization whether it rides a
    2-row or a (padded) 4-row batch — only XLA's batch-shape reassociation
    (~1e-6) differs. This is what makes served audio reproducible."""
    b2 = rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:6]], seed=5)
    b3 = rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS[:6]],
                             seed=5)
    assert b2[0].shape == b3[0].shape
    np.testing.assert_allclose(b2[0], b3[0], atol=2e-5, rtol=0)
    assert b2[1].shape == b3[2].shape
    np.testing.assert_allclose(b2[1], b3[2], atol=2e-5, rtol=0)


def test_identical_rows_identical_audio(rt):
    a, b = rt.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS], seed=5)
    np.testing.assert_array_equal(a, b)


def test_synthesize_with_alignment(rt):
    audio, al = rt.synthesize_with_alignment(FIXTURE_IDS, seed=5)
    ref = rt.synthesize(FIXTURE_IDS, seed=5)
    np.testing.assert_array_equal(audio, ref)
    assert isinstance(al, PhonemeAlignment)
    assert al.total_samples == len(audio)
    assert not al.truncated
    assert al.sample_rate == rt.sample_rate
    # spans: contiguous, monotone, covering exactly the waveform
    assert al.start_samples[0] == 0
    assert al.end_samples[-1] == len(audio)
    np.testing.assert_array_equal(al.start_samples[1:], al.end_samples[:-1])
    assert (al.end_samples >= al.start_samples).all()
    assert (al.end_seconds <= len(audio) / rt.sample_rate + 1e-9).all()


def test_alignment_to_dict_and_offsets(rt):
    audio, al = rt.synthesize_with_alignment(FIXTURE_IDS, seed=5)
    d = al.to_dict()
    assert d["total_samples"] == len(audio)
    assert len(d["phonemes"]) == len(FIXTURE_IDS)
    assert d["phonemes"][0]["id"] == FIXTURE_IDS[0]
    json.dumps(d)  # JSON-able
    shifted = al.to_dict(offset_samples=1000)
    assert shifted["phonemes"][0]["start_sample"] == 1000
    assert (shifted["phonemes"][-1]["end_sample"]
            == d["phonemes"][-1]["end_sample"] + 1000)
    doc = alignments_to_json([al, al], [0, len(audio) + 50])
    assert len(doc["utterances"]) == 2
    assert doc["utterances"][1]["phonemes"][0]["start_sample"] == len(audio) + 50


def test_alignment_truncation_clips_spans(tiny_voice):
    """When the plan exceeds the largest frame bucket the audio truncates;
    spans clip to the audio and the alignment says so."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(frame_buckets=(8,)))
    audio, al = rt.synthesize_with_alignment(FIXTURE_IDS, seed=5)
    assert len(audio) == 8 * rt.hparams.hop_length
    assert al.truncated
    assert al.total_frames > 8
    assert al.end_samples[-1] == len(audio)
    assert (al.end_samples <= len(audio)).all()


def test_durations_fused_mode_and_multispeaker(tmp_path_factory):
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    model, config = make_synthetic_voice(
        tmp_path_factory.mktemp("al_ms"), quality="test", seed=2,
        n_speakers=4, gin_channels=16,
    )
    rt = PiperRuntime(model, config, RuntimeOptions(mode="fused"))
    hop = rt.hparams.hop_length
    for sid in (0, 3):
        audio, al = rt.synthesize_with_alignment(FIXTURE_IDS, speaker_id=sid,
                                                 seed=9)
        assert al.total_samples == len(audio)
        if not al.truncated:
            assert al.total_frames * hop == len(audio)
    # durations differ across speakers (speaker embedding conditions the dp)
    d0 = rt.phoneme_durations([FIXTURE_IDS], speaker_ids=[0], seed=9)[0]
    d3 = rt.phoneme_durations([FIXTURE_IDS], speaker_ids=[3], seed=9)[0]
    assert d0.shape == d3.shape


def test_make_alignment_validates():
    with pytest.raises(ValueError):
        make_alignment([1, 2, 3], np.array([1, 2]), hop_length=32,
                       sample_rate=16000, total_samples=96)
    with pytest.raises(ValueError):
        alignments_to_json([], [0])


def test_multispeaker_prewarm_covers_sid_durations(tmp_path_factory):
    """Prewarm compiles BOTH sid variants (grid + durations) for a
    multispeaker voice — the first speakered request must not compile
    mid-traffic (review finding: the pinned-rung guarantee was sid-blind)."""
    from piper_tpu.engine.batcher import BatchingServer
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    model, config = make_synthetic_voice(
        tmp_path_factory.mktemp("al_pw_ms"), quality="test", seed=4,
        n_speakers=3, gin_channels=16,
    )
    rt = PiperRuntime(model, config, RuntimeOptions(mode="fused"))
    with BatchingServer(rt, max_batch=4, max_wait_ms=20) as server:
        server.prewarm(p_buckets=[16], calibrate=False)
        programs = set(rt._compiled_keys)
        a = server.submit(FIXTURE_IDS, speaker_id=2).result(timeout=300)
        d = server.submit_durations(FIXTURE_IDS, speaker_id=2).result(
            timeout=300)
        assert len(a) > 0 and len(d) == len(FIXTURE_IDS)
        new = rt._compiled_keys - programs
        assert new == set(), f"speakered traffic compiled mid-serve: {new}"
