"""Python HTTP client tests (piper_tpu/client.py) against live servers."""

import numpy as np
import pytest

from piper_tpu.client import (PiperClient, PiperClientError,
                              PiperStreamingClient)
from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS
from piper_tpu.engine.http_server import (PiperHTTPServer,
                                          PiperStreamingHTTPServer)
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("client_voice")
    m, _ = make_synthetic_voice(d, quality="test", seed=3, voice_name="v")
    srv = PiperHTTPServer({"v": PiperRuntime(m)}, port=0,
                          max_batch=4, max_wait_ms=10)
    srv.start()
    yield srv
    srv.close()


def test_client_health_voices_metrics(server):
    c = PiperClient(server.host, server.port)
    assert c.health()
    v = c.voices()
    assert "v" in v and v["v"]["sample_rate"] > 0
    assert "v" in c.metrics()
    # health() is False for a dead endpoint rather than raising
    assert not PiperClient(server.host, 1, timeout=2).health()


def test_client_synthesize_and_durations_agree(server):
    c = PiperClient(server.host, server.port)
    audio, sr = c.synthesize(phoneme_ids=FIXTURE_IDS)
    assert sr > 0 and len(audio) > 0
    assert audio.dtype == np.float32 and np.abs(audio).max() <= 1.0
    doc = c.durations(phoneme_ids=FIXTURE_IDS)
    assert doc["total_samples"] == len(audio)
    (utt,) = doc["utterances"]
    assert [p["id"] for p in utt["phonemes"]] == list(FIXTURE_IDS)


def test_client_errors(server):
    c = PiperClient(server.host, server.port)
    with pytest.raises(ValueError):
        c.synthesize()  # none of text/ipa/phoneme_ids
    with pytest.raises(ValueError):
        c.synthesize(text="x", phoneme_ids=[1])  # more than one
    with pytest.raises(PiperClientError) as e:
        c.synthesize(phoneme_ids=[1], voice="nope")
    assert e.value.status == 404
    with pytest.raises(PiperClientError) as e:
        c.synthesize(phoneme_ids=[10 ** 9])
    assert e.value.status == 400


def test_streaming_client(tmp_path_factory):
    d = tmp_path_factory.mktemp("client_stream")
    m, _ = make_synthetic_voice(d, quality="test", seed=6)
    rt = PiperRuntime(m)
    with PiperStreamingHTTPServer(rt, port=0) as srv:
        srv.start()
        c = PiperStreamingClient(srv.host, srv.port)
        chunks = list(c.stream(phoneme_ids=FIXTURE_IDS, seed=7))
        assert c.sample_rate == rt.sample_rate
        assert all(ch.dtype == np.int16 for ch in chunks)
        pcm = np.concatenate(chunks)
        assert len(pcm) > 0
        # deterministic per seed
        pcm2 = np.concatenate(list(c.stream(phoneme_ids=FIXTURE_IDS, seed=7)))
        np.testing.assert_array_equal(pcm, pcm2)
        # admission/validation errors surface with their status
        with pytest.raises(PiperClientError) as e:
            list(c.stream(phoneme_ids=[]))
        assert e.value.status == 400
        # closing the generator mid-stream must not wedge the server
        gen = c.stream(phoneme_ids=list(FIXTURE_IDS) * 4, seed=1)
        next(gen)
        gen.close()
        pcm3 = np.concatenate(list(c.stream(phoneme_ids=FIXTURE_IDS, seed=7)))
        np.testing.assert_array_equal(pcm3, pcm)


def test_client_tolerates_non_json_bodies():
    """health() returns False (not a crash) against a 200 that isn't our
    JSON, and error decoding tolerates non-object JSON bodies (review
    findings: proxies / wrong services answer in foreign formats)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Splash(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"<html>hi</html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            body = b'["boom"]'  # valid JSON, not an object
            self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Splash)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        c = PiperClient(*httpd.server_address)
        assert c.health() is False
        with pytest.raises(PiperClientError) as e:
            c.synthesize(phoneme_ids=[1])
        assert e.value.status == 500 and "boom" in str(e.value)
    finally:
        httpd.shutdown()
        httpd.server_close()
