"""Speaker mixing (voice blending) for multi-speaker voices.

`speaker_mix={id: weight, ...}` replaces the integer embedding lookup with
a weighted blend of speaker embeddings (g = weights @ emb_g). The reference
exposes only integer sid (speaker conditioning per
/root/reference/Sources/PiperMetal/PiperMetalRuntime.swift); blending is a
piper-tpu extension that falls out of the TPU-native design (the lookup is
already a gather on a device-resident (S, gin) matrix).

Key invariant: a one-hot mix is BIT-IDENTICAL to the integer lookup (the
einsum runs at HIGHEST precision; adding exact zeros is exact).
"""

import numpy as np
import pytest

from piper_tpu import cli
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice
from piper_tpu.utils.wav import read_wav

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def ms_voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("mix_voice")
    return make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                gin_channels=32)


@pytest.fixture(scope="module")
def runtime(ms_voice):
    return PiperRuntime(*ms_voice)


def test_one_hot_mix_bit_identical_to_id(runtime):
    a_id = runtime.synthesize(FIXTURE_IDS, speaker_id=2)
    a_mix = runtime.synthesize(FIXTURE_IDS, speaker_mix={2: 1.0})
    assert np.array_equal(a_id, a_mix)


def test_blend_differs_from_endpoints_and_is_finite(runtime):
    a0 = runtime.synthesize(FIXTURE_IDS, speaker_id=0)
    a2 = runtime.synthesize(FIXTURE_IDS, speaker_id=2)
    blend = runtime.synthesize(FIXTURE_IDS, speaker_mix={0: 0.5, 2: 0.5})
    assert np.isfinite(blend).all()
    for ref in (a0, a2):
        if blend.shape == ref.shape:
            assert not np.allclose(blend, ref)


def test_extrapolation_allowed(runtime):
    # Weights needn't sum to 1 — 1.2*A - 0.2*B is deliberately legal.
    audio = runtime.synthesize(FIXTURE_IDS, speaker_mix={0: 1.2, 1: -0.2})
    assert np.isfinite(audio).all() and len(audio) > 0


def test_batch_mixes_match_single(runtime):
    singles = [
        runtime.synthesize(FIXTURE_IDS, speaker_mix={0: 1.0}),
        runtime.synthesize(FIXTURE_IDS, speaker_mix={2: 0.3, 3: 0.7}),
    ]
    batch = runtime.synthesize_batch(
        [FIXTURE_IDS, FIXTURE_IDS],
        speaker_mixes=[{0: 1.0}, {2: 0.3, 3: 0.7}])
    for s, b in zip(singles, batch):
        # Same rows through the batch path: row-invariant noise makes the
        # realization identical when the frame bucket matches.
        if s.shape == b.shape:
            np.testing.assert_allclose(s, b, atol=1e-4)
        assert np.isfinite(b).all()


def test_durations_and_forced_roundtrip(runtime):
    durs_mix = runtime.phoneme_durations([FIXTURE_IDS],
                                         speaker_mixes=[{1: 1.0}])[0]
    durs_id = runtime.phoneme_durations([FIXTURE_IDS], speaker_ids=[1])[0]
    assert list(durs_mix) == list(durs_id)
    forced_mix = runtime.synthesize_forced(FIXTURE_IDS, durs_mix,
                                           speaker_mix={1: 1.0})
    forced_id = runtime.synthesize_forced(FIXTURE_IDS, durs_id, speaker_id=1)
    assert np.array_equal(forced_mix, forced_id)


def test_alignment_with_mix(runtime):
    audio, align = runtime.synthesize_with_alignment(
        FIXTURE_IDS, speaker_mix={2: 0.5, 3: 0.5})
    assert len(audio) > 0
    assert sum(align.durations_frames) > 0
    assert align.total_samples == len(audio)


def test_validation_errors(runtime):
    with pytest.raises(ValueError):
        runtime.synthesize_batch([FIXTURE_IDS], speaker_ids=[1],
                                 speaker_mixes=[{0: 1.0}])
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={9: 1.0})  # out of range
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={})  # empty
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={0: float("nan")})
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={0: 0.0})  # all-zero


def test_strict_mix_keys_and_lengths(runtime):
    # int() would silently truncate these to a DIFFERENT speaker — reject.
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={1.5: 1.0})
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={True: 1.0})
    # String keys are the wire format's business (the HTTP layer coerces);
    # the Python API rejects them — {2: a, "2": b} would otherwise be two
    # dict keys writing one speaker's weight, last-write-wins.
    with pytest.raises(ValueError):
        runtime.synthesize(FIXTURE_IDS, speaker_mix={"2": 0.5})
    # Too few mixes for the batch must fail loudly, not condition row 1 on
    # row 0's mix.
    with pytest.raises(ValueError):
        runtime.synthesize_batch([FIXTURE_IDS, FIXTURE_IDS],
                                 speaker_mixes=[{0: 1.0}])
    with pytest.raises(ValueError):
        runtime.synthesize_batch([FIXTURE_IDS], speaker_mixes=[])


def test_submitted_mix_dict_is_copied(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=4, max_wait_ms=200) as server:
        mix = {2: 1.0}
        fut = server.submit(FIXTURE_IDS, speaker_mix=mix)
        mix.clear()  # caller reuses the dict before the worker dispatches
        a = fut.result(timeout=300)
    np.testing.assert_array_equal(
        a, runtime.synthesize(FIXTURE_IDS, speaker_mix={2: 1.0}))


def test_streaming_prewarm_mix_heads(runtime):
    from piper_tpu.engine.stream_server import StreamingServer

    server = StreamingServer(runtime, max_sessions=4)
    try:
        base = server.prewarm(phoneme_lengths=(14,), head_rungs=(1, 2))
        mixed = server.prewarm(phoneme_lengths=(14,), head_rungs=(1, 2),
                               speaker_mix=True)
        assert mixed["programs"] > base["programs"]
    finally:
        server.shutdown()


def test_cli_record_vectors_rejects_mix(ms_voice, tmp_path):
    model, _ = ms_voice
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids",
                  ",".join(map(str, FIXTURE_IDS)),
                  "--record-vectors", str(tmp_path / "vecs"),
                  "--speaker-mix", "0:1.0"])


def test_cli_duplicate_mix_ids(ms_voice, tmp_path):
    model, _ = ms_voice
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids",
                  ",".join(map(str, FIXTURE_IDS)),
                  "--speaker-mix", "0:0.5,0:0.5",
                  "-o", str(tmp_path / "dup.wav")])


def test_single_speaker_voice_rejects_mix(tmp_path_factory):
    d = tmp_path_factory.mktemp("single_voice")
    rt = PiperRuntime(*make_synthetic_voice(d, quality="test", seed=3))
    with pytest.raises(ValueError):
        rt.synthesize(FIXTURE_IDS, speaker_mix={0: 1.0})


def test_cli_speaker_mix(ms_voice, tmp_path):
    model, _ = ms_voice
    out_mix = tmp_path / "mix.wav"
    out_id = tmp_path / "id.wav"
    ids_arg = ",".join(map(str, FIXTURE_IDS))
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "--speaker-mix", "2:1.0", "-o", str(out_mix)])
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "--speaker-id", "2", "-o", str(out_id)])
    a_mix, _ = read_wav(out_mix)
    a_id, _ = read_wav(out_id)
    assert np.array_equal(a_mix, a_id)


def test_mesh_runtime_mix(ms_voice):
    """Speaker mixing on a dp mesh: the (B, n_speakers) conditioning array
    shards over rows like the ids, and one-hot exactness survives GSPMD."""
    import jax

    from piper_tpu.engine.runtime import PiperRuntime as _RT
    from piper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8 virtual CPU devices")
    rt = _RT(*ms_voice, mesh=make_mesh(8))
    a_id = rt.synthesize(FIXTURE_IDS, speaker_id=2)
    a_mix = rt.synthesize(FIXTURE_IDS, speaker_mix={2: 1.0})
    np.testing.assert_array_equal(a_id, a_mix)
    batch = rt.synthesize_batch(
        [FIXTURE_IDS, FIXTURE_IDS[:6], FIXTURE_IDS],
        speaker_mixes=[{0: 1.0}, {1: 0.5, 2: 0.5}, {3: 1.2, 0: -0.2}])
    assert len(batch) == 3
    assert all(np.isfinite(a).all() and len(a) > 0 for a in batch)


# -- streaming ----------------------------------------------------------


def test_incremental_stream_mix_matches_id(runtime):
    a_id = np.concatenate([c.samples for c in runtime.synthesize_stream(
        FIXTURE_IDS, incremental=True, speaker_id=2)])
    a_mix = np.concatenate([c.samples for c in runtime.synthesize_stream(
        FIXTURE_IDS, incremental=True, speaker_mix={2: 1.0})])
    np.testing.assert_array_equal(a_id, a_mix)


def test_streaming_server_mix(runtime):
    from piper_tpu.engine.stream_server import StreamingServer

    server = StreamingServer(runtime, max_sessions=8)
    try:
        # Sequential (solo-head) submissions: one-hot mix is bit-identical
        # to the id stream (both run b=1 heads; the window decodes take enc).
        a_id = np.concatenate([c.samples for c in server.submit(
            FIXTURE_IDS, seed=7, speaker_id=3)])
        a_mix = np.concatenate([c.samples for c in server.submit(
            FIXTURE_IDS, seed=7, speaker_mix={3: 1.0})])
        np.testing.assert_array_equal(a_id, a_mix)
        # Simultaneous mix + blend: the two mix streams burst into ONE
        # batched head (same conditioning kind). Batched heads reduce in a
        # different order than b=1 ones (row-count-dependent fp, ~1e-6 —
        # pre-existing, not mix-specific), so compare with a tight allclose.
        h_mix2 = server.submit(FIXTURE_IDS, seed=7, speaker_mix={3: 1.0})
        h_blend = server.submit(FIXTURE_IDS, seed=7,
                                speaker_mix={0: 0.5, 3: 0.5})
        a_mix2 = np.concatenate([c.samples for c in h_mix2])
        a_blend = np.concatenate([c.samples for c in h_blend])
        np.testing.assert_allclose(a_mix2, a_mix, atol=1e-5)
        assert np.isfinite(a_blend).all()
        if a_blend.shape == a_id.shape:
            assert not np.array_equal(a_blend, a_id)
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_mix={9: 1.0})
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_id=1, speaker_mix={0: 1.0})
    finally:
        server.shutdown()


def test_streaming_http_mix(ms_voice):
    from piper_tpu.engine.http_server import PiperStreamingHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    srv = PiperStreamingHTTPServer(_RT(*ms_voice), port=0, max_sessions=4)
    srv.start()
    try:
        from piper_tpu.client import PiperStreamingClient

        c = PiperStreamingClient(srv.host, srv.port)
        a_mix = np.concatenate(list(c.stream(
            phoneme_ids=list(FIXTURE_IDS), speaker_mix={2: 1.0})))
        a_id = np.concatenate(list(c.stream(
            phoneme_ids=list(FIXTURE_IDS), speaker_id=2)))
        np.testing.assert_array_equal(a_mix, a_id)
        # bad mixes are 400s (door-step validation), not 500s
        import http.client
        import json as _json

        for bad in ({"speaker_mix": {"9": 1.0}},
                    {"speaker_mix": "0:1"}):
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
            try:
                conn.request("POST", "/v1/stream",
                             body=_json.dumps(
                                 {"phoneme_ids": list(FIXTURE_IDS),
                                  **bad}).encode(),
                             headers={"Content-Type": "application/json"})
                assert conn.getresponse().status == 400, bad
            finally:
                conn.close()
    finally:
        srv.close()


# -- serving surfaces ---------------------------------------------------


def test_server_mix_matches_id(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=4, max_wait_ms=20) as server:
        f_mix = server.submit(FIXTURE_IDS, speaker_mix={2: 1.0})
        f_id = server.submit(FIXTURE_IDS, speaker_id=2)
        a_mix = f_mix.result(timeout=300)
        a_id = f_id.result(timeout=300)
    # One-hot mix == id lookup, and row-invariant noise makes the served
    # realization independent of how the two grouped.
    np.testing.assert_array_equal(a_mix, a_id)


def test_server_mixed_traffic_and_metrics(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=8, max_wait_ms=50) as server:
        futs = ([server.submit(FIXTURE_IDS, speaker_id=1) for _ in range(3)]
                + [server.submit(FIXTURE_IDS, speaker_mix={0: 0.5, 1: 0.5})
                   for _ in range(3)])
        audios = [f.result(timeout=300) for f in futs]
        m = server.metrics()
    assert all(np.isfinite(a).all() and len(a) > 0 for a in audios)
    # id and mix requests never share a group (distinct program variants).
    assert m["groups"] >= 2 and m["completed"] == 6


def test_server_durations_and_forced_with_mix(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=4, max_wait_ms=20) as server:
        durs = server.submit_durations(
            FIXTURE_IDS, speaker_mix={1: 1.0}).result(timeout=300)
        durs_id = server.submit_durations(
            FIXTURE_IDS, speaker_id=1).result(timeout=300)
        np.testing.assert_array_equal(durs, durs_id)
        a_mix = server.submit_forced(
            FIXTURE_IDS, list(durs), speaker_mix={1: 1.0}).result(timeout=300)
        a_id = server.submit_forced(
            FIXTURE_IDS, list(durs_id), speaker_id=1).result(timeout=300)
    np.testing.assert_array_equal(a_mix, a_id)


def test_server_submit_validation(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=4, max_wait_ms=20) as server:
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_id=1, speaker_mix={0: 1.0})
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_mix={9: 1.0})
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_mix={})
        with pytest.raises(ValueError):
            server.submit(FIXTURE_IDS, speaker_mix={0: float("inf")})


def test_prewarm_mix_programs(runtime):
    from piper_tpu.engine.batcher import BatchingServer

    with BatchingServer(runtime, max_batch=2, max_wait_ms=5) as server:
        base = server.prewarm(p_buckets=[64])
        server._fpp = None
        mixed = server.prewarm(p_buckets=[64], speaker_mix_programs=True)
    assert mixed["programs"] > base["programs"]


@pytest.fixture(scope="module")
def http_server(ms_voice):
    from piper_tpu.engine.http_server import PiperHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    srv = PiperHTTPServer({"multi": _RT(*ms_voice)}, port=0,
                          max_batch=4, max_wait_ms=10)
    srv.start()
    yield srv
    srv.close()


def _post(server, path, body):
    import http.client
    import json as _json

    conn = http.client.HTTPConnection(server.host, server.port, timeout=600)
    try:
        conn.request("POST", path, body=_json.dumps(body).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


def test_http_speaker_mix(http_server):
    st, wav_mix = _post(http_server, "/v1/synthesize",
                        {"phoneme_ids": list(FIXTURE_IDS),
                         "speaker_mix": {"2": 1.0}})
    assert st == 200
    st, wav_id = _post(http_server, "/v1/synthesize",
                       {"phoneme_ids": list(FIXTURE_IDS), "speaker_id": 2})
    assert st == 200
    assert wav_mix == wav_id  # one-hot mix == id lookup, byte-for-byte WAV

    import json as _json

    st, body = _post(http_server, "/v1/durations",
                     {"phoneme_ids": list(FIXTURE_IDS),
                      "speaker_mix": {"0": 0.5, "3": 0.5}})
    assert st == 200
    doc = _json.loads(body)
    assert doc["total_samples"] > 0


def test_http_speaker_mix_errors(http_server):
    for bad in ({"speaker_mix": "0:1"},            # not an object
                {"speaker_mix": {}},               # empty
                {"speaker_mix": {"zero": 1.0}},    # non-int key
                {"speaker_mix": {"0": "heavy"}},   # non-number weight
                {"speaker_mix": {"9": 1.0}},       # out of range
                {"speaker_mix": {"0": 1.0}, "speaker_id": 1}):  # both
        st, _ = _post(http_server, "/v1/synthesize",
                      {"phoneme_ids": list(FIXTURE_IDS), **bad})
        assert st == 400, bad


def test_cli_speaker_mix_arg_errors(ms_voice, tmp_path):
    model, _ = ms_voice
    ids_arg = ",".join(map(str, FIXTURE_IDS))
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "--speaker-mix", "bogus", "-o", str(tmp_path / "x.wav")])
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "--speaker-id", "1", "--speaker-mix", "0:1",
                  "-o", str(tmp_path / "y.wav")])
