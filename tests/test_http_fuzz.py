"""Malformed-input fuzz against every HTTP endpoint (round-5 VERDICT #8).

Adversarial clients — truncated bodies, lying Content-Length, huge JSON,
invalid UTF-8, non-object JSON, unknown routes/methods, raw garbage — must
each get a clean 4xx (or connection close) and must never wedge a handler
thread or take the worker down: after the whole barrage, a good request
still returns 200 audio.
"""

import http.client
import json
import socket

import pytest

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIX
from piper_tpu.engine.http_server import PiperHTTPServer
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_voices")
    m, _ = make_synthetic_voice(d, quality="test", seed=7, voice_name="v")
    srv = PiperHTTPServer({"v": PiperRuntime(m)}, port=0, stream=True,
                          max_batch=4, max_wait_ms=5)
    srv.start()
    yield srv
    srv.close()


POST_ENDPOINTS = ("/v1/synthesize", "/v1/durations", "/v1/audio/speech",
                  "/v1/stream")
GET_ENDPOINTS = ("/healthz", "/v1/voices", "/v1/metrics", "/metrics")


def _post(server, path, body: bytes, headers=None, timeout=60):
    conn = http.client.HTTPConnection(server.host, server.port,
                                      timeout=timeout)
    try:
        conn.putrequest("POST", path)
        for k, v in (headers or {"Content-Length": str(len(body)),
                                 "Content-Type": "application/json"}).items():
            conn.putheader(k, v)
        conn.endheaders()
        if body:
            conn.send(body)
        resp = conn.getresponse()
        data = resp.read()
        return resp.status, data
    finally:
        conn.close()


def _good_request_still_serves(server):
    st, data = _post(server, "/v1/synthesize",
                     json.dumps({"voice": "v",
                                 "phoneme_ids": list(FIX)}).encode())
    assert st == 200 and data[:4] == b"RIFF", (st, data[:60])


def test_invalid_utf8_body(server):
    for path in POST_ENDPOINTS:
        st, data = _post(server, path, b"\xff\xfe{\x80garbage\xff")
        assert st == 400, (path, st, data[:120])
    _good_request_still_serves(server)


def test_non_object_json(server):
    for path in POST_ENDPOINTS:
        for body in (b"[1, 2, 3]", b'"a string"', b"42", b"null"):
            st, _ = _post(server, path, body)
            assert st == 400, (path, body)
    _good_request_still_serves(server)


def test_huge_json_rejected_413(server):
    # Declared > 16 MiB: rejected up front without reading the body.
    st, data = _post(server, "/v1/synthesize", b"",
                     headers={"Content-Length": str(64 << 20),
                              "Content-Type": "application/json"})
    assert st == 413, (st, data[:120])
    _good_request_still_serves(server)


def test_wrong_content_length_too_small(server):
    # Content-Length shorter than the real body: the handler reads N bytes
    # (a JSON prefix) -> 400; the tail is discarded with the connection.
    body = json.dumps({"voice": "v", "phoneme_ids": list(FIX)}).encode()
    st, _ = _post(server, "/v1/synthesize", body,
                  headers={"Content-Length": "5",
                           "Content-Type": "application/json"})
    assert st == 400
    _good_request_still_serves(server)


def test_truncated_body_client_hangup(server):
    """Content-Length promises more than the client sends before closing:
    the handler's bounded read sees EOF, fails JSON parse, and the thread
    exits — no wedge, no worker impact."""
    for path in POST_ENDPOINTS:
        s = socket.create_connection((server.host, server.port), timeout=60)
        try:
            head = (f"POST {path} HTTP/1.1\r\n"
                    f"Host: x\r\nContent-Type: application/json\r\n"
                    f"Content-Length: 5000\r\n\r\n").encode()
            s.sendall(head + b'{"voice": "v", "phoneme')
        finally:
            s.close()  # hang up mid-body
    _good_request_still_serves(server)


def test_header_only_hangup(server):
    # Close immediately after the request line — stdlib server must just
    # drop the connection.
    s = socket.create_connection((server.host, server.port), timeout=60)
    s.sendall(b"POST /v1/synthesize HTTP/1.1\r\n")
    s.close()
    _good_request_still_serves(server)


def test_raw_garbage_connection(server):
    s = socket.create_connection((server.host, server.port), timeout=60)
    try:
        s.sendall(b"\x00\x01\x02 NOT HTTP AT ALL \xff\xff\r\n\r\n")
        s.settimeout(60)
        try:
            s.recv(256)  # 400 or close — either is fine
        except OSError:
            pass
    finally:
        s.close()
    _good_request_still_serves(server)


def test_unknown_routes_and_methods(server):
    st, _ = _post(server, "/v1/nope", b"{}")
    assert st == 404
    conn = http.client.HTTPConnection(server.host, server.port, timeout=60)
    try:
        conn.request("DELETE", "/v1/synthesize")
        assert conn.getresponse().status in (404, 501)
    finally:
        conn.close()
    for path in GET_ENDPOINTS:
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=60)
        try:
            conn.request("GET", path)
            assert conn.getresponse().status == 200, path
        finally:
            conn.close()
    _good_request_still_serves(server)


def test_adversarial_field_values(server):
    """Schema-shaped but hostile payloads: every one a 4xx, never a 500."""
    cases = [
        {"voice": "v", "phoneme_ids": []},
        {"voice": "v", "phoneme_ids": ["a", "b"]},
        {"voice": "v", "phoneme_ids": [0.5]},
        {"voice": "v", "phoneme_ids": list(FIX), "speaker_id": 99},
        {"voice": "v", "phoneme_ids": list(FIX), "speaker_mix": {"0": "x"}},
        {"voice": "v", "phoneme_ids": list(FIX), "speaker_mix": {}},
        {"voice": "v", "phoneme_ids": list(FIX), "length_scale": "loud"},
        {"voice": "v", "phoneme_ids": list(FIX), "length_scale": -1},
        {"voice": "v", "phoneme_ids": list(FIX), "length_scale": 0},
        {"voice": "v", "phoneme_ids": list(FIX), "noise_w": float("nan")},
        {"voice": "nope", "phoneme_ids": list(FIX)},
        {"voice": "v", "ssml": "<speak><voice name='ghost'>"
                               "<phoneme ph='a'>x</phoneme></voice></speak>"},
        {"voice": "v", "ssml": "<speak><unclosed></speak"},
        {"voice": "v", "text": ""},
        {"voice": "v"},
        # NOTE: {"phoneme_ids": [...]} without "voice" is NOT here — with
        # exactly one voice loaded the server intentionally defaults to it.
    ]
    # synthesize-only hostile values: fields /v1/durations ignores by
    # design (noise_scale does not affect the duration plan).
    synth_only = [
        {"voice": "v", "phoneme_ids": list(FIX), "noise_scale": "loud"},
        {"voice": "v", "phoneme_ids": list(FIX), "noise_scale": -2},
        # duration forcing (the "durations" field) only exists on
        # /v1/synthesize; /v1/durations ignores it and returns the plan.
        {"voice": "v", "phoneme_ids": list(FIX),
         "durations": [1] * (len(FIX) + 3)},
        {"voice": "v", "phoneme_ids": list(FIX), "durations": [-1] * len(FIX)},
    ]
    for path in ("/v1/synthesize", "/v1/durations"):
        for body in cases:
            st, data = _post(server, path, json.dumps(body).encode())
            assert 400 <= st < 500, (path, body, st, data[:200])
    for body in synth_only:
        st, data = _post(server, "/v1/synthesize", json.dumps(body).encode())
        assert 400 <= st < 500, (body, st, data[:200])
    _good_request_still_serves(server)


def test_text_without_phonemizer_is_501(server):
    """No espeak-ng on this box: a text/SSML-text request is a capability
    gap (501 with an actionable message), never a 500 internal error."""
    for body in ({"voice": "v", "text": "Hello there."},
                 {"voice": "v", "ssml": "<speak>Hello there.</speak>"}):
        st, data = _post(server, "/v1/synthesize",
                         json.dumps(body).encode())
        assert st == 501, (body, st, data[:200])
        assert b"phoneme ids" in data.lower() or b"espeak" in data.lower()
