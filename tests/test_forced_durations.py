"""Duration forcing: caller-supplied per-phoneme frame plans.

The defining property is the round trip with the alignment API: forcing the
UNEDITED plan phoneme_durations() returned, at the same seed, reproduces the
predicted-duration audio exactly (same encoder, same w_ceil, bit-identical
prior-noise derivation, same frame bucket from the same totals).
"""

import numpy as np
import pytest

from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIX


@pytest.fixture(scope="module")
def rt(tiny_voice):
    return PiperRuntime(*tiny_voice, options=RuntimeOptions(mode="split"))


def test_forcing_the_predicted_plan_reproduces_synthesize(rt):
    durs = rt.phoneme_durations([FIX], seed=9)[0]
    ref = rt.synthesize(FIX, seed=9)
    forced = rt.synthesize_forced(FIX, [int(d) for d in durs], seed=9)
    assert forced.shape == ref.shape
    np.testing.assert_array_equal(forced, ref)


def test_forced_lengths_are_exact(rt):
    hop = rt.hparams.hop_length
    durs = [2] * len(FIX)
    audio = rt.synthesize_forced(FIX, durs, seed=3)
    assert len(audio) == sum(durs) * hop
    # Stretching one phoneme adds exactly its frames.
    durs2 = list(durs)
    durs2[4] += 5
    audio2 = rt.synthesize_forced(FIX, durs2, seed=3)
    assert len(audio2) == len(audio) + 5 * hop


def test_zero_duration_skips_a_phoneme(rt):
    durs = [2] * len(FIX)
    durs[3] = 0
    audio = rt.synthesize_forced(FIX, durs, seed=3)
    assert len(audio) == sum(durs) * rt.hparams.hop_length
    assert np.isfinite(audio).all()


def test_forced_batch_matches_solo(rt):
    """Row-invariant noise: a forced row's audio is independent of its
    co-batched rows (up to XLA's batch-shape reassociation noise ~1e-6),
    exactly like the predicted-duration paths."""
    durs_a = [2] * len(FIX)
    durs_b = [3] * 6
    solo = rt.synthesize_forced(FIX, durs_a, seed=5)
    batch = rt.synthesize_batch_forced(
        [FIX, FIX[:6]], [durs_a, durs_b], seed=5)
    assert len(batch) == 2
    np.testing.assert_allclose(batch[0], solo, atol=1e-5, rtol=0)
    assert len(batch[1]) == sum(durs_b) * rt.hparams.hop_length


def test_forced_validation_errors(rt):
    with pytest.raises(ValueError, match="durations length"):
        rt.synthesize_forced(FIX, [1, 2, 3])
    with pytest.raises(ValueError, match="non-negative"):
        rt.synthesize_forced(FIX, [-1] + [1] * (len(FIX) - 1))
    with pytest.raises(ValueError, match="non-zero"):
        rt.synthesize_forced(FIX, [0] * len(FIX))
    # Per ROW: one all-zero plan in a batch must error, not return a frame
    # of prior-noise garbage for that row.
    with pytest.raises(ValueError, match="non-zero"):
        rt.synthesize_batch_forced(
            [FIX, FIX], [[2] * len(FIX), [0] * len(FIX)])
    with pytest.raises(ValueError, match="duration rows"):
        rt.synthesize_batch_forced([FIX, FIX], [[1] * len(FIX)])


def test_forced_truncates_at_the_largest_bucket(rt):
    """A plan longer than the largest frame bucket clamps and truncates
    instead of failing (same policy as predicted durations)."""
    cap = rt.options.frame_buckets[-1]
    durs = [0] * len(FIX)
    durs[0] = cap + 50
    audio = rt.synthesize_forced(FIX, durs)
    assert len(audio) == cap * rt.hparams.hop_length


def test_batcher_submit_forced_matches_direct(rt):
    """submit_forced rides the worker thread and resolves to the exact
    audio the direct runtime call produces (same program, same plan)."""
    from piper_tpu.engine.batcher import BatchingServer

    durs = [int(d) for d in rt.phoneme_durations([FIX], seed=9)[0]]
    direct = rt.synthesize_forced(FIX, durs)
    with BatchingServer(rt, max_batch=4, max_wait_ms=10) as server:
        futs = [server.submit_forced(FIX, durs) for _ in range(3)]
        futs.append(server.submit(FIX))  # mixed kinds coexist
        outs = [f.result(timeout=300) for f in futs]
        with pytest.raises(ValueError, match="durations length"):
            server.submit_forced(FIX, [1, 2])
    np.testing.assert_allclose(outs[0], direct, atol=1e-5, rtol=0)
    np.testing.assert_allclose(outs[1], outs[0], atol=0)
    m = server.metrics()
    assert m["completed"] == 4 and m["failed"] == 0


def test_http_durations_roundtrip_through_forcing(rt, tmp_path_factory):
    """The editing loop over HTTP: POST /v1/durations -> edit the plan ->
    POST /v1/synthesize {"durations": ...} -> stretched audio; the unedited
    plan reproduces the plain request's audio."""
    import json

    from piper_tpu.client import PiperClient
    from piper_tpu.engine.http_server import PiperHTTPServer

    srv = PiperHTTPServer({"v": rt}, port=0, max_batch=4, max_wait_ms=10)
    srv.start()
    try:
        c = PiperClient(srv.host, srv.port)
        doc = c.durations(phoneme_ids=list(FIX))
        plan = [p["frames"] for p in doc["utterances"][0]["phonemes"]]
        audio_plain, sr = c.synthesize(phoneme_ids=list(FIX))
        audio_forced, _ = c.synthesize(phoneme_ids=list(FIX), durations=plan)
        # Served forced groups pad rows to the pinned rung while the plain
        # request rode a different group shape: only XLA batch-shape
        # reassociation noise apart.
        np.testing.assert_allclose(audio_forced, audio_plain, atol=1e-4,
                                   rtol=0)
        plan2 = list(plan)
        plan2[0] += 10
        stretched, _ = c.synthesize(phoneme_ids=list(FIX), durations=plan2)
        assert len(stretched) == len(audio_plain) + 10 * rt.hparams.hop_length
        # length_scale contradicts a forced plan -> 400.
        from piper_tpu.client import PiperClientError

        with pytest.raises(PiperClientError) as ei:
            c.synthesize(phoneme_ids=list(FIX), durations=plan,
                         length_scale=1.2)
        assert ei.value.status == 400
        # Malformed durations types are 400s, never 500s.
        import http.client

        for bad in (5, [None, 2], [2.5] * len(FIX), []):
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=60)
            try:
                conn.request("POST", "/v1/synthesize", body=json.dumps(
                    {"phoneme_ids": list(FIX), "durations": bad}).encode(),
                    headers={"Content-Type": "application/json"})
                assert conn.getresponse().status == 400, bad
            finally:
                conn.close()
    finally:
        srv.close()


def test_cli_force_durations(tiny_voice, tmp_path):
    """--force-durations synthesizes the plan exactly and --alignment
    reports the plan itself (no encoder pass)."""
    import json

    from piper_tpu import cli
    from piper_tpu.utils.wav import read_wav

    model, _ = tiny_voice
    ids_arg = ",".join(str(i) for i in FIX)
    durs = [2] * len(FIX)
    out = tmp_path / "o.wav"
    aj = tmp_path / "a.json"
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "-o", str(out), "--alignment", str(aj),
              "--force-durations", ",".join(str(d) for d in durs)])
    audio, sr = read_wav(str(out))
    rt = PiperRuntime(model)
    assert len(audio) == sum(durs) * rt.hparams.hop_length
    doc = json.loads(aj.read_text())
    (utt,) = doc["utterances"]
    assert [p["frames"] for p in utt["phonemes"]] == durs
    with pytest.raises(SystemExit, match="integer"):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "-o", str(out), "--force-durations", "2,x,3"])
    with pytest.raises(SystemExit, match="no effect"):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "-o", str(out), "--force-durations", "2,3",
                  "--length-scale", "1.5"])
    with pytest.raises(SystemExit, match="stream"):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "-o", str(out), "--force-durations", "2,3", "--stream"])
    # Count mismatch / bad values are tidy messages, not tracebacks.
    with pytest.raises(SystemExit, match="frame counts"):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "-o", str(out), "--force-durations", "2,3"])
    with pytest.raises(SystemExit, match=">= 0"):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "-o", str(out),
                  "--force-durations=" + ",".join(["-1"] + ["2"] * (len(FIX) - 1))])


def test_forced_multispeaker(tmp_path_factory):
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    d = tmp_path_factory.mktemp("forced_ms")
    voice = make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                 gin_channels=32)
    rt = PiperRuntime(*voice, options=RuntimeOptions(mode="split"))
    durs = rt.phoneme_durations([FIX], speaker_ids=[1], seed=4)[0]
    ref = rt.synthesize(FIX, speaker_id=1, seed=4)
    forced = rt.synthesize_forced(FIX, [int(d) for d in durs],
                                  speaker_id=1, seed=4)
    np.testing.assert_array_equal(forced, ref)
