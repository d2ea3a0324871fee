"""HTTP serving API tests (stdlib client against an ephemeral-port server)."""

import http.client
import json
import stat
import struct

import numpy as np
import pytest

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS
from piper_tpu.engine.http_server import PiperHTTPServer, _wav_bytes
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("http_voices")
    m1, _ = make_synthetic_voice(d / "a", quality="test", seed=1,
                                 voice_name="alpha")
    m2, _ = make_synthetic_voice(d / "b", quality="test", seed=2,
                                 voice_name="beta")
    srv = PiperHTTPServer(
        {"alpha": PiperRuntime(m1), "beta": PiperRuntime(m2)},
        port=0, max_batch=4, max_wait_ms=10)
    srv.start()
    yield srv
    srv.close()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection(server.host, server.port, timeout=600)
    try:
        conn.request(method, path,
                     body=json.dumps(body).encode() if body is not None else None,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        return resp.status, resp.getheader("Content-Type"), data
    finally:
        conn.close()


def test_healthz_and_voices(server):
    st, _, data = _request(server, "GET", "/healthz")
    assert st == 200 and json.loads(data)["ok"]
    st, _, data = _request(server, "GET", "/v1/voices")
    voices = json.loads(data)
    assert set(voices) == {"alpha", "beta"}
    assert voices["alpha"]["sample_rate"] > 0


def test_synthesize_wav(server):
    st, ctype, data = _request(server, "POST", "/v1/synthesize",
                               {"phoneme_ids": list(FIXTURE_IDS)})
    assert st == 200 and ctype == "audio/wav"
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    n = struct.unpack("<I", data[40:44])[0]
    assert n > 0 and len(data) == 44 + n


def test_synthesize_pcm_and_voice_routing(server):
    st, ctype, data = _request(
        server, "POST", "/v1/synthesize",
        {"voice": "beta", "phoneme_ids": list(FIXTURE_IDS), "format": "pcm"})
    assert st == 200 and ctype == "audio/x-raw-int16"
    pcm = np.frombuffer(data, "<i2")
    assert len(pcm) > 0 and np.isfinite(pcm.astype(np.float32)).all()


def test_synthesize_ipa(server):
    st, ctype, data = _request(server, "POST", "/v1/synthesize",
                               {"ipa": "ab"})
    assert st == 200 and ctype == "audio/wav"


def test_synthesize_text_multi_sentence(server, tmp_path, monkeypatch):
    script = tmp_path / "espeak-ng"
    script.write_text("#!/bin/sh\necho 'ab'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr("piper_tpu.phonemize.find_espeak", lambda: str(script))
    st, _, one = _request(server, "POST", "/v1/synthesize",
                          {"text": "Hi there.", "format": "pcm"})
    assert st == 200
    st, _, two = _request(
        server, "POST", "/v1/synthesize",
        {"text": "Hi there. Hi there.", "format": "pcm",
         "sentence_silence": 0.5})
    assert st == 200
    rt = server.runtimes["alpha"]
    # two sentences + a 0.5 s gap: strictly longer than twice one sentence
    assert len(two) >= 2 * len(one) + int(0.5 * rt.sample_rate) * 2 - 4


def test_errors(server):
    st, _, data = _request(server, "POST", "/v1/synthesize",
                           {"voice": "nope", "phoneme_ids": [1, 2]})
    assert st == 404
    st, _, data = _request(server, "POST", "/v1/synthesize", {})
    assert st == 400
    st, _, data = _request(server, "POST", "/v1/synthesize",
                           {"phoneme_ids": "not-a-list"})
    assert st == 400
    st, _, data = _request(server, "GET", "/v1/nope")
    assert st == 404
    st, _, data = _request(server, "POST", "/v1/synthesize",
                           {"phoneme_ids": [999999]})
    assert st in (400, 500)  # out-of-vocab rejected


def test_metrics_counts(server):
    st, _, data = _request(server, "GET", "/v1/metrics")
    assert st == 200
    m = json.loads(data)
    assert set(m) == {"alpha", "beta"}
    assert m["alpha"]["completed"] >= 1


def test_wav_bytes_roundtrip(tmp_path):
    audio = np.sin(np.linspace(0, 20, 500)).astype(np.float32) * 0.5
    blob = _wav_bytes(audio, 22050)
    p = tmp_path / "t.wav"
    p.write_bytes(blob)
    from piper_tpu.utils.wav import read_wav

    back, sr = read_wav(str(p))
    assert sr == 22050
    np.testing.assert_allclose(back, audio, atol=1e-4)


def test_admission_shed_maps_to_429(tmp_path_factory):
    d = tmp_path_factory.mktemp("http_shed")
    m, _ = make_synthetic_voice(d, quality="test", seed=3)
    # max_pending=0: every request sheds at the door -> HTTP 429
    with PiperHTTPServer({"v": PiperRuntime(m)}, port=0,
                         max_pending=0) as srv:
        srv.start()
        st, _, data = _request(srv, "POST", "/v1/synthesize",
                               {"phoneme_ids": list(FIXTURE_IDS)})
        assert st == 429
        assert "pending" in json.loads(data)["error"]


def test_close_without_start_does_not_hang(tmp_path_factory):
    """Review finding: httpd.shutdown() deadlocks when serve_forever never
    ran; close() must return promptly for a constructed-but-never-started
    server (e.g. a `with` body failing before start())."""
    import threading

    d = tmp_path_factory.mktemp("http_nostart")
    m, _ = make_synthetic_voice(d, quality="test", seed=5)
    srv = PiperHTTPServer({"v": PiperRuntime(m)}, port=0)
    done = threading.Event()

    def closer():
        srv.close()
        done.set()

    t = threading.Thread(target=closer, daemon=True)
    t.start()
    assert done.wait(timeout=30), "close() hung without serve_forever"


def test_bad_content_length_and_negative_silence(server, tmp_path,
                                                 monkeypatch):
    # negative Content-Length -> 400 (never read-to-EOF)
    conn = http.client.HTTPConnection(server.host, server.port, timeout=60)
    try:
        conn.putrequest("POST", "/v1/synthesize")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        conn.close()
    # negative sentence_silence -> 400 with a clear message
    script = tmp_path / "espeak-ng"
    script.write_text("#!/bin/sh\necho 'ab'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr("piper_tpu.phonemize.find_espeak", lambda: str(script))
    st, _, data = _request(server, "POST", "/v1/synthesize",
                           {"text": "One two. Three four.",
                            "sentence_silence": -1})
    assert st == 400
    assert "sentence_silence" in json.loads(data)["error"]


@pytest.mark.slow
def test_http_concurrent_clients_soak(server):
    """20 client threads x 5 requests against the shared server: every
    response is a valid WAV, no handler thread wedges, metrics reconcile."""
    import threading

    errors = []
    lock = threading.Lock()

    def client(seed):
        for i in range(5):
            st, ctype, data = _request(
                server, "POST", "/v1/synthesize",
                {"voice": "alpha" if (seed + i) % 2 else "beta",
                 "phoneme_ids": list(FIXTURE_IDS)[: 6 + (seed + i) % 8]})
            if st != 200 or data[:4] != b"RIFF":
                with lock:
                    errors.append((st, ctype, data[:80]))

    threads = [threading.Thread(target=client, args=(s,)) for s in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]


@pytest.mark.slow
def test_cli_serve_multiple_models(tmp_path_factory):
    """`piper --serve --model a.onnx,b.onnx` hosts both voices in one
    process (subprocess test: parse the bound port from stderr, hit
    /v1/voices, shut down)."""
    import os
    import re
    import subprocess
    import sys
    import time as _time

    d = tmp_path_factory.mktemp("serve_cli")
    m1, _ = make_synthetic_voice(d / "a", quality="test", seed=1,
                                 voice_name="serve-a")
    m2, _ = make_synthetic_voice(d / "b", quality="test", seed=2,
                                 voice_name="serve-b")
    env = dict(os.environ, PIPER_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "piper_tpu.cli", "--serve", "--port", "0",
         "--model", f"{m1},{m2}"],
        stderr=subprocess.PIPE, text=True, env=env)
    try:
        port = None
        deadline = _time.time() + 120
        while _time.time() < deadline:
            line = proc.stderr.readline()
            m = re.search(r"http://[\d.]+:(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
            if proc.poll() is not None:
                raise AssertionError("serve process exited early")
        assert port, "no serving banner seen"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/v1/voices")
        resp = conn.getresponse()
        voices = json.loads(resp.read())
        conn.close()
        assert set(voices) == {m1.stem, m2.stem}
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_serve_sigterm_drains(tmp_path_factory):
    """SIGTERM (orchestrator stop) drains like Ctrl-C: the serve process
    announces the drain and exits 0 instead of dying mid-flight."""
    import os
    import re
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    d = tmp_path_factory.mktemp("serve_term")
    m, _ = make_synthetic_voice(d, quality="test", seed=1,
                                voice_name="serve-term")
    env = dict(os.environ, PIPER_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "piper_tpu.cli", "--serve", "--port", "0",
         "--model", str(m)],
        stderr=subprocess.PIPE, text=True, env=env)
    try:
        port = None
        deadline = _time.time() + 120
        lines = []
        while _time.time() < deadline:
            line = proc.stderr.readline()
            lines.append(line)
            mm = re.search(r"http://[\d.]+:(\d+)", line or "")
            if mm:
                port = int(mm.group(1))
                break
            if proc.poll() is not None:
                raise AssertionError(f"serve exited early: {lines}")
        assert port, "no serving banner seen"
        # one request through, so the server demonstrably served traffic
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/v1/synthesize",
                     body=json.dumps({"phoneme_ids": list(FIXTURE_IDS)}),
                     headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 200
        conn.close()
        proc.send_signal(_signal.SIGTERM)
        out = proc.stderr.read()
        assert proc.wait(timeout=60) == 0
        assert "draining" in out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


# -- chunked streaming server --------------------------------------------


def test_streaming_http_server(tmp_path_factory):
    """POST /v1/stream returns chunked int16 PCM; same seed twice is
    deterministic, and the chunk cadence delivers the full waveform."""
    from piper_tpu.engine.http_server import PiperStreamingHTTPServer

    d = tmp_path_factory.mktemp("http_stream")
    m, _ = make_synthetic_voice(d, quality="test", seed=6)
    with PiperStreamingHTTPServer(PiperRuntime(m), port=0) as srv:
        srv.start()

        def stream(body):
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
            try:
                conn.request("POST", "/v1/stream", body=json.dumps(body),
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                data = resp.read()  # http.client decodes chunked transfer
                return resp, data
            finally:
                conn.close()

        resp, a = stream({"phoneme_ids": list(FIXTURE_IDS), "seed": 7})
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/x-raw-int16"
        assert int(resp.getheader("X-Sample-Rate")) > 0
        pcm = np.frombuffer(a, "<i2")
        assert len(pcm) > 0
        _, b = stream({"phoneme_ids": list(FIXTURE_IDS), "seed": 7})
        assert a == b  # deterministic per seed
        # a document with nothing to speak is a clean 400 (the handler's
        # no-utterance branch is additionally hardened so a future input
        # path yielding zero utterances streams its gaps instead of
        # raising bare StopIteration and dropping the connection)
        resp, err = stream({"ssml": "<speak><break time='120ms'/></speak>"})
        assert resp.status == 400
        assert "nothing to speak" in json.loads(err)["error"]
        # validation errors come back as JSON before any audio
        resp, err = stream({"phoneme_ids": []})
        assert resp.status == 400
        resp, err = stream({"phoneme_ids": list(FIXTURE_IDS),
                            "sentence_silence": -1, "text": "x"})
        assert resp.status == 400
        # health + metrics routes
        st, _, data = _request(srv, "GET", "/healthz")
        assert st == 200
        st, _, data = _request(srv, "GET", "/v1/metrics")
        assert st == 200 and json.loads(data)["sessions"] >= 2


def test_openai_alias_and_prometheus(server, tmp_path, monkeypatch):
    script = tmp_path / "espeak-ng"
    script.write_text("#!/bin/sh\necho 'ab'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr("piper_tpu.phonemize.find_espeak", lambda: str(script))
    st, ctype, data = _request(
        server, "POST", "/v1/audio/speech",
        {"model": "tts-1", "voice": "beta", "input": "Hello there.",
         "speed": 1.25})
    assert st == 200 and ctype == "audio/wav" and data[:4] == b"RIFF"
    st, ctype, data = _request(
        server, "POST", "/v1/audio/speech",
        {"input": "Hi.", "response_format": "pcm"})
    assert st == 200 and ctype == "audio/x-raw-int16"
    st, ctype, data = _request(server, "GET", "/metrics")
    assert st == 200 and ctype.startswith("text/plain")
    text = data.decode()
    assert 'piper_tpu_completed{voice="alpha"}' in text
    assert "# TYPE piper_tpu_completed gauge" in text


def test_streaming_http_disconnect_frees_session(tmp_path_factory):
    """A client that drops the connection mid-stream must not leak its
    session slot (review finding: abandoned streams parked forever and
    eventually ServerOverloaded every new stream)."""
    import socket
    import time as _t

    from piper_tpu.engine.http_server import PiperStreamingHTTPServer

    d = tmp_path_factory.mktemp("http_drop")
    m, _ = make_synthetic_voice(d, quality="test", seed=7)
    with PiperStreamingHTTPServer(PiperRuntime(m), port=0,
                                  max_sessions=2, emit_frames=16,
                                  c0=8) as srv:
        srv.start()
        for _ in range(4):  # more drops than max_sessions
            body = json.dumps({"phoneme_ids": list(FIXTURE_IDS) * 4}).encode()
            sock = socket.create_connection((srv.host, srv.port), timeout=60)
            sock.sendall(
                b"POST /v1/stream HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: application/json\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
            sock.recv(256)  # headers + maybe the first chunk
            sock.close()  # walk away mid-stream
        deadline = _t.time() + 60
        while _t.time() < deadline:
            if srv.server.metrics()["open_sessions"] == 0:
                break
            _t.sleep(0.05)
        assert srv.server.metrics()["open_sessions"] == 0
        # server still serves a full stream afterwards
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        conn.request("POST", "/v1/stream",
                     body=json.dumps({"phoneme_ids": list(FIXTURE_IDS)}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        assert resp.status == 200 and len(data) > 0


def test_int16_runtime_audio_not_saturated(tmp_path_factory):
    """Review finding: an output_dtype='int16' runtime (the bench/serving
    default) fed int16-scale values into the float WAV/PCM encoders, which
    clipped EVERY sample to +/-32767 — the response was a square wave. The
    HTTP path must normalize; the PCM response must equal the runtime's own
    int16 output."""
    from piper_tpu.engine.runtime import RuntimeOptions

    d = tmp_path_factory.mktemp("http_i16")
    m, _ = make_synthetic_voice(d, quality="test", seed=8)
    rt = PiperRuntime(m, None, RuntimeOptions(output_dtype="int16"))
    with PiperHTTPServer({"v": rt}, port=0, max_wait_ms=5) as srv:
        srv.start()
        st, ctype, data = _request(
            srv, "POST", "/v1/synthesize",
            {"phoneme_ids": list(FIXTURE_IDS), "format": "pcm"})
        assert st == 200
        pcm = np.frombuffer(data, "<i2").astype(np.int32)
        assert len(pcm) > 0
        # a healthy tiny voice's PCM is NOT all rail-to-rail values
        assert np.abs(pcm).max() < 32767 or np.abs(pcm).mean() < 20000
        assert len(np.unique(pcm)) > 16


def test_durations_endpoint(server):
    st, ctype, data = _request(server, "POST", "/v1/durations",
                               {"phoneme_ids": list(FIXTURE_IDS)})
    assert st == 200 and ctype == "application/json"
    doc = json.loads(data)
    assert doc["voice"] == "alpha" and doc["sample_rate"] > 0
    (utt,) = doc["utterances"]
    phs = utt["phonemes"]
    assert [p["id"] for p in phs] == list(FIXTURE_IDS)
    assert phs[0]["start_sample"] == 0
    assert all(a["end_sample"] == b["start_sample"]
               for a, b in zip(phs, phs[1:]))
    # spans describe the audio /v1/synthesize returns for the same request
    st, _, wav = _request(server, "POST", "/v1/synthesize",
                          {"phoneme_ids": list(FIXTURE_IDS)})
    assert st == 200
    n = struct.unpack("<I", wav[40:44])[0] // 2  # int16 samples
    assert phs[-1]["end_sample"] == n == doc["total_samples"]


def test_durations_endpoint_errors(server):
    st, _, data = _request(server, "POST", "/v1/durations",
                           {"voice": "nope", "phoneme_ids": [1]})
    assert st == 404
    st, _, data = _request(server, "POST", "/v1/durations", {})
    assert st == 400
    st, _, data = _request(server, "POST", "/v1/durations",
                           {"phoneme_ids": [1], "sentence_silence": -1})
    assert st == 400


def test_durations_endpoint_reports_truncation(tmp_path_factory):
    """When the plan exceeds the largest frame bucket, the alignment doc
    must clip spans to the audio the runtime actually produces and say
    truncated=True (review finding: the raw plan silently desynced
    subtitle offsets)."""
    from piper_tpu.engine.runtime import RuntimeOptions

    d = tmp_path_factory.mktemp("http_trunc")
    m, _ = make_synthetic_voice(d, quality="test", seed=5)
    rt = PiperRuntime(m, options=RuntimeOptions(frame_buckets=(8,)))
    with PiperHTTPServer({"t": rt}, port=0, max_batch=2,
                         max_wait_ms=10) as srv:
        srv.start()
        st, _, data = _request(srv, "POST", "/v1/durations",
                               {"phoneme_ids": list(FIXTURE_IDS)})
        assert st == 200
        doc = json.loads(data)
        (utt,) = doc["utterances"]
        cap = 8 * rt.hparams.hop_length
        assert utt["truncated"] is True
        assert utt["total_samples"] == cap
        assert max(p["end_sample"] for p in utt["phonemes"]) == cap
        # ... and that's exactly the audio length the server synthesizes
        st, _, wav = _request(srv, "POST", "/v1/synthesize",
                              {"phoneme_ids": list(FIXTURE_IDS)})
        assert st == 200
        n = struct.unpack("<I", wav[40:44])[0] // 2
        assert n == cap == doc["total_samples"]


def test_unified_http_all_surfaces_one_process(tmp_path_factory):
    """PiperHTTPServer(stream=True): ONE process serves /v1/synthesize,
    /v1/durations AND chunked /v1/stream for MULTIPLE voices on a single
    device worker (VERDICT r3 #1). Streamed audio equals the dedicated
    streaming server's for the same seed (same decode path)."""
    d = tmp_path_factory.mktemp("http_unified")
    m1, _ = make_synthetic_voice(d / "a", quality="test", seed=1,
                                 voice_name="alpha")
    m2, _ = make_synthetic_voice(d / "b", quality="test", seed=2,
                                 voice_name="beta")
    rt1, rt2 = PiperRuntime(m1), PiperRuntime(m2)
    with PiperHTTPServer({"alpha": rt1, "beta": rt2}, port=0,
                         max_batch=4, max_wait_ms=5, stream=True,
                         stream_kwargs=dict(emit_frames=16, c0=8,
                                            row_rungs=(1, 2, 4))) as srv:
        srv.start()

        def stream(body):
            conn = http.client.HTTPConnection(srv.host, srv.port,
                                              timeout=600)
            try:
                conn.request("POST", "/v1/stream", body=json.dumps(body),
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                return resp.status, resp.getheader("Content-Type"), \
                    resp.read()
            finally:
                conn.close()

        # healthz carries readiness (VERDICT r3 #7)
        st, _, data = _request(srv, "GET", "/healthz")
        h = json.loads(data)
        assert st == 200 and h["ok"] and "ready" in h and "warming" in h
        # batch + durations endpoints work as before
        st, ctype, wav = _request(srv, "POST", "/v1/synthesize",
                                  {"phoneme_ids": list(FIXTURE_IDS),
                                   "voice": "beta"})
        assert st == 200 and ctype == "audio/wav"
        st, _, doc = _request(srv, "POST", "/v1/durations",
                              {"phoneme_ids": list(FIXTURE_IDS)})
        assert st == 200 and json.loads(doc)["utterances"]
        # chunked streaming per voice, deterministic per seed, and the
        # audio matches the library-level stream for that voice exactly
        st, ctype, a = stream({"phoneme_ids": list(FIXTURE_IDS),
                               "voice": "alpha", "seed": 7})
        assert st == 200 and ctype == "audio/x-raw-int16"
        st, _, a2 = stream({"phoneme_ids": list(FIXTURE_IDS),
                            "voice": "alpha", "seed": 7})
        assert a == a2 and len(a) > 0
        st, _, b = stream({"phoneme_ids": list(FIXTURE_IDS),
                           "voice": "beta", "seed": 7})
        assert st == 200 and b != a  # routed to the other voice's weights
        st, _, err = stream({"phoneme_ids": list(FIXTURE_IDS),
                             "voice": "nope"})
        assert st == 404
        # concurrent mixed load: a stream mid-flight while batch requests
        # run on the same worker — both complete
        import threading as _t

        out = {}

        def bg():
            out["s"] = stream({"phoneme_ids": list(FIXTURE_IDS) * 3,
                               "voice": "alpha", "seed": 9})

        th = _t.Thread(target=bg)
        th.start()
        st, _, _ = _request(srv, "POST", "/v1/synthesize",
                            {"phoneme_ids": list(FIXTURE_IDS)})
        assert st == 200
        th.join(timeout=600)
        assert out["s"][0] == 200 and len(out["s"][2]) > 0
        # nested metrics shape + Prometheus flattening
        st, _, mdata = _request(srv, "GET", "/v1/metrics")
        m = json.loads(mdata)
        assert set(m) == {"batch", "stream", "warming"}
        assert m["stream"]["alpha"]["sessions"] >= 3
        st, _, prom = _request(srv, "GET", "/metrics")
        text = prom.decode()
        assert 'piper_tpu_completed{voice="alpha"}' in text
        assert 'piper_tpu_stream_sessions{voice="alpha"}' in text


def test_non_stream_server_404s_stream_route(server):
    st, _, data = _request(server, "POST", "/v1/stream",
                           {"phoneme_ids": list(FIXTURE_IDS)})
    assert st == 404 and "not enabled" in json.loads(data)["error"]
