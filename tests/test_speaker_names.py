"""Speaker selection by NAME via the voice config's speaker_id_map.

Real multi-speaker exports carry `speaker_id_map` (name -> id; reference
PiperConfig.swift:36 parses it but nothing consumes it). piper-tpu resolves
names everywhere a speaker can be chosen: runtime helpers, CLI --speaker /
--speaker-mix, HTTP "speaker"/"speaker_mix", and SSML <voice name=...>.
Synthetic multi-speaker voices map 'spk0'..'spkN-1'.
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
    d = tmp_path_factory.mktemp("names_voice")
    return make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                gin_channels=32)


@pytest.fixture(scope="module")
def runtime(ms_voice):
    return PiperRuntime(*ms_voice)


def test_speaker_index_resolution(runtime):
    assert runtime.speaker_index("spk2") == 2
    assert runtime.speaker_index(3) == 3
    assert runtime.speaker_index("1") == 1  # digit strings parse as ids
    with pytest.raises(ValueError):
        runtime.speaker_index("nobody")
    with pytest.raises(ValueError):
        runtime.speaker_index(9)
    with pytest.raises(ValueError):
        runtime.speaker_index(True)


def test_resolve_speaker_mix(runtime):
    assert runtime.resolve_speaker_mix({"spk0": 0.5, "spk3": 0.5}) == {
        0: 0.5, 3: 0.5}
    with pytest.raises(ValueError):
        # name and its id collide after resolution — a silent last-write-
        # wins would drop a weight
        runtime.resolve_speaker_mix({"spk2": 0.5, 2: 0.5})


def test_cli_speaker_by_name(ms_voice, tmp_path):
    model, _ = ms_voice
    ids_arg = ",".join(map(str, FIXTURE_IDS))
    out_name = tmp_path / "name.wav"
    out_id = tmp_path / "id.wav"
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "--speaker", "spk2", "-o", str(out_name)])
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "--speaker-id", "2", "-o", str(out_id)])
    assert np.array_equal(read_wav(out_name)[0], read_wav(out_id)[0])
    # mixes accept names too; one-hot name mix == the id
    out_mix = tmp_path / "mix.wav"
    cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
              "--speaker-mix", "spk2:1.0", "-o", str(out_mix)])
    assert np.array_equal(read_wav(out_mix)[0], read_wav(out_id)[0])
    # tidy exits: unknown name, conflicting flags
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "--speaker", "nobody", "-o", str(tmp_path / "x.wav")])
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids", ids_arg,
                  "--speaker", "spk1", "--speaker-id", "1",
                  "-o", str(tmp_path / "y.wav")])


def test_http_speaker_by_name(ms_voice):
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperHTTPServer

    srv = PiperHTTPServer({"v": PiperRuntime(*ms_voice)}, port=0,
                          max_batch=4, max_wait_ms=10)
    srv.start()

    def post(path, body):
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        try:
            conn.request("POST", path, body=_json.dumps(body).encode(),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, r.read()
        finally:
            conn.close()

    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        conn.request("GET", "/v1/voices")
        voices = _json.loads(conn.getresponse().read())
        conn.close()
        assert voices["v"]["speakers"] == {f"spk{i}": i for i in range(4)}
        st, by_name = post("/v1/synthesize",
                           {"phoneme_ids": list(FIXTURE_IDS),
                            "speaker": "spk2"})
        assert st == 200
        st, by_id = post("/v1/synthesize",
                         {"phoneme_ids": list(FIXTURE_IDS), "speaker_id": 2})
        assert st == 200 and by_name == by_id
        st, by_mix = post("/v1/synthesize",
                          {"phoneme_ids": list(FIXTURE_IDS),
                           "speaker_mix": {"spk2": 1.0}})
        assert st == 200 and by_mix == by_id
        # durations accept names the same way
        st, d_name = post("/v1/durations",
                          {"phoneme_ids": list(FIXTURE_IDS),
                           "speaker": "spk1"})
        st2, d_id = post("/v1/durations",
                         {"phoneme_ids": list(FIXTURE_IDS), "speaker_id": 1})
        assert st == 200 and st2 == 200 and d_name == d_id
        # errors are 400s
        for bad in ({"speaker": "nobody"},
                    {"speaker": "spk1", "speaker_id": 1},
                    {"speaker_mix": {"nobody": 1.0}}):
            st, _ = post("/v1/synthesize",
                         {"phoneme_ids": list(FIXTURE_IDS), **bad})
            assert st == 400, bad
    finally:
        srv.close()


def test_ssml_voice_by_name(runtime):
    from piper_tpu.core.ssml import SsmlError, render_ssml, ssml_alignment

    a_name = render_ssml(
        runtime,
        '<speak><voice name="spk2"><phoneme ph="AB"/></voice></speak>')
    a_id = render_ssml(
        runtime, '<speak><voice name="2"><phoneme ph="AB"/></voice></speak>')
    np.testing.assert_array_equal(a_name, a_id)
    # named mixes resolve too; one-hot name mix == the id
    a_mix = render_ssml(
        runtime,
        '<speak><voice name="spk2:1.0"><phoneme ph="AB"/></voice></speak>')
    np.testing.assert_array_equal(a_mix, a_id)
    with pytest.raises(SsmlError):
        render_ssml(runtime, '<speak><voice name="nobody">'
                             '<phoneme ph="AB"/></voice></speak>')
    with pytest.raises(SsmlError):
        # name + its id in one mix collide after resolution
        render_ssml(runtime, '<speak><voice name="spk2:0.5,2:0.5">'
                             '<phoneme ph="AB"/></voice></speak>')
    doc = ssml_alignment(
        runtime,
        '<speak><voice name="spk3"><phoneme ph="AB"/></voice></speak>')
    assert doc["total_samples"] > 0


def test_numeric_names_map_wins(tmp_path_factory):
    """libritts-style voices use numeric reader ids as NAMES ("3922" -> 1);
    the map must win over integer parsing or the wrong speaker plays."""
    import json

    d = tmp_path_factory.mktemp("numeric_names")
    model, config = make_synthetic_voice(d, quality="test", seed=6,
                                         n_speakers=4, gin_channels=32)
    cfg = json.loads(open(config).read())
    cfg["speaker_id_map"] = {"92": 0, "3922": 1, "116": 2, "2": 3}
    with open(config, "w") as f:
        json.dump(cfg, f)
    rt = PiperRuntime(model, config)
    assert rt.speaker_index("3922") == 1
    assert rt.speaker_index("2") == 3      # map wins over index parsing
    assert rt.speaker_index(2) == 2        # real ints stay indices
    assert rt.speaker_index("1") == 1      # not in map -> parses as index


def test_resolve_mix_rejects_bool_keys(runtime):
    with pytest.raises(ValueError):
        runtime.resolve_speaker_mix({True: 1.0})
    with pytest.raises(ValueError):
        runtime.resolve_speaker_mix({})
    with pytest.raises(ValueError):
        runtime.resolve_speaker_mix({1.5: 1.0})


def test_http_speaker_and_mix_conflict(ms_voice):
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperHTTPServer

    srv = PiperHTTPServer({"v": PiperRuntime(*ms_voice)}, port=0,
                          max_batch=4, max_wait_ms=10)
    srv.start()
    try:
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        conn.request("POST", "/v1/synthesize",
                     body=_json.dumps({"phoneme_ids": list(FIXTURE_IDS),
                                       "speaker": "spk2",
                                       "speaker_mix": {"0": 1.0}}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 400
        assert b"ONE of" in body  # the three-way message, not a misleading
        conn.close()              # "speaker_id" the client never sent
    finally:
        srv.close()


def test_cli_empty_mix_is_an_error(ms_voice, tmp_path):
    model, _ = ms_voice
    with pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--phoneme-ids",
                  ",".join(map(str, FIXTURE_IDS)),
                  "--speaker-mix", "", "-o", str(tmp_path / "e.wav")])


def test_single_speaker_voice_has_no_names(tmp_path_factory):
    d = tmp_path_factory.mktemp("mono_voice")
    rt = PiperRuntime(*make_synthetic_voice(d, quality="test", seed=3))
    with pytest.raises(ValueError):
        rt.speaker_index("anyone")
