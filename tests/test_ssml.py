"""SSML-lite parsing, planning, and rendering.

Parsing/planning are pure (no device, no espeak); rendering runs on the
synthetic multi-speaker voice. Text phonemization is injected as a plain
callable so no espeak binary is needed.
"""

import numpy as np
import pytest

from piper_tpu.core.ssml import (SsmlError, assemble, group_utterances,
                                 parse_ssml, plan_ssml, render_ssml)
from piper_tpu.engine.runtime import PiperRuntime
from piper_tpu.models.vits.synthetic import make_synthetic_voice

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tmp_path_factory):
    d = tmp_path_factory.mktemp("ssml_voice")
    return PiperRuntime(*make_synthetic_voice(d, quality="test", seed=6,
                                              n_speakers=4, gin_channels=32))


# -- parsing (pure) -------------------------------------------------------


def test_bare_text_wraps():
    doc = parse_ssml("Hello there.")
    assert [s.kind for s in doc.segments] == ["text"]
    assert doc.segments[0].content == "Hello there."
    assert doc.ignored == []


def test_breaks_and_collapsing():
    doc = parse_ssml('<speak>a <break time="500ms"/> b '
                     '<break time="0.25s"/><break strength="strong"/> c'
                     '<break time="2s"/></speak>')
    kinds = [(s.kind, s.break_s) for s in doc.segments]
    # trailing break dropped; adjacent breaks collapse to the longest
    assert kinds == [("text", None), ("break", 0.5), ("text", None),
                     ("break", 0.6), ("text", None)]


def test_break_strength_table_and_errors():
    doc = parse_ssml('<speak>a<break strength="x-weak"/>b</speak>')
    assert doc.segments[1].break_s == 0.05
    with pytest.raises(SsmlError):
        parse_ssml('<speak>a<break strength="huge"/>b</speak>')
    with pytest.raises(SsmlError):
        parse_ssml('<speak>a<break time="5 parsecs"/>b</speak>')
    with pytest.raises(SsmlError):
        parse_ssml('<speak>a<break time="61s"/>b</speak>')


def test_prosody_rate_volume_pitch():
    doc = parse_ssml('<speak><prosody rate="80%">slowish</prosody>'
                     '<prosody rate="fast" volume="-6dB">fast quiet'
                     '</prosody><prosody pitch="+2st">pitchy</prosody>'
                     '</speak>')
    segs = doc.segments
    assert segs[0].ctx.length_scale == pytest.approx(1 / 0.8)
    assert segs[1].ctx.length_scale == pytest.approx(1 / 1.25)
    assert segs[1].ctx.volume == pytest.approx(10 ** (-6 / 20))
    assert segs[2].ctx.length_scale is None  # pitch ignored, rate untouched
    assert any("pitch" in msg for msg in doc.ignored)
    with pytest.raises(SsmlError):
        parse_ssml('<speak><prosody rate="0.01">x</prosody></speak>')


def test_phoneme_element_and_tail():
    doc = parse_ssml('<speak><phoneme ph="ab">Fallback</phoneme> tail.'
                     '</speak>')
    assert [(s.kind, s.content) for s in doc.segments] == [
        ("ipa", "ab"), ("text", "tail.")]
    with pytest.raises(SsmlError):
        parse_ssml('<speak><phoneme>x</phoneme></speak>')
    with pytest.raises(SsmlError):
        parse_ssml('<speak><phoneme ph="a" alphabet="x-sampa">x</phoneme>'
                   '</speak>')


def test_voice_ids_and_mixes():
    doc = parse_ssml('<speak><voice name="2">two</voice>'
                     '<voice name="0:0.6,3:0.4">blend</voice> outside'
                     '</speak>')
    segs = doc.segments
    assert segs[0].ctx.speaker_id == 2 and segs[0].ctx.speaker_mix is None
    assert segs[1].ctx.speaker_mix == ((0, 0.6), (3, 0.4))
    assert segs[2].ctx.speaker_id is None  # tail restores the parent ctx
    # a NAME parses fine (resolved against the voice's speaker_id_map at
    # plan time); without a resolver, planning rejects it
    doc2 = parse_ssml('<speak><voice name="alice">x</voice></speak>')
    assert doc2.segments[0].ctx.speaker_name == "alice"
    with pytest.raises(SsmlError):
        plan_ssml(doc2, {"^": [1], "$": [2], "_": [0]}, _fake_phonemize)
    with pytest.raises(SsmlError):
        parse_ssml('<speak><voice name="0:0.5,0:0.5">x</voice></speak>')


def test_sub_say_as_unknown():
    doc = parse_ssml('<speak><sub alias="World Wide Web">WWW</sub> and '
                     '<say-as interpret-as="digits">123</say-as>'
                     '<wizard>magic</wizard></speak>')
    text = " ".join(s.content for s in doc.segments if s.kind == "text")
    assert "World Wide Web" in text and "WWW" not in text
    assert "123" in text and "magic" in text
    assert any("say-as" in m for m in doc.ignored)
    assert any("wizard" in m for m in doc.ignored)


def test_paragraph_sentence_boundaries():
    doc = parse_ssml("<speak><p><s>One.</s><s>Two.</s></p><p>Three.</p>"
                     "</speak>")
    kinds = [(s.kind, s.break_scale if s.kind == "break" else s.content)
             for s in doc.segments]
    # s-boundary gap (1x) between One/Two; p-boundary gap (2x) between the
    # paragraphs; text merging keeps each sentence separate here because
    # breaks intervene
    assert kinds == [("text", "One."), ("break", 1.0), ("text", "Two."),
                     ("break", 2.0), ("text", "Three.")]


def test_text_merges_across_noop_markup():
    doc = parse_ssml('<speak>Hello <mark name="m"/> world.</speak>')
    assert [s.content for s in doc.segments if s.kind == "text"] == [
        "Hello world."]


def test_non_numeric_and_nonfinite_prosody_values():
    for bad in ('rate="abc"', 'rate="abc%"', 'rate="nan"',
                'volume="abc"', 'volume="abcdb"', 'volume="nan"',
                'volume="inf"', 'volume="8000dB"'):
        with pytest.raises(SsmlError):
            parse_ssml(f'<speak><prosody {bad}>x</prosody></speak>')


def test_midword_markup_does_not_split_words():
    doc = parse_ssml('<speak>Hel<mark name="m"/>lo there</speak>')
    assert [s.content for s in doc.segments if s.kind == "text"] == [
        "Hello there"]
    doc2 = parse_ssml('<speak>re<sub alias="new">old</sub>ing</speak>')
    assert [s.content for s in doc2.segments if s.kind == "text"] == [
        "renewing"]


def test_unknown_ipa_symbol_is_ssml_error():
    idmap = {"^": [1], "$": [2], "_": [0], "a": [20]}
    with pytest.raises(SsmlError):
        plan_ssml('<speak><phoneme ph="aθ"/></speak>', idmap)


def test_parse_errors():
    with pytest.raises(SsmlError):
        parse_ssml("")
    with pytest.raises(SsmlError):
        parse_ssml("<speak><unclosed></speak>")
    with pytest.raises(SsmlError):
        parse_ssml('<speak><break time="1s"/></speak>')  # nothing to speak


# -- planning -------------------------------------------------------------


def _fake_phonemize(text):
    # deterministic ids from the text so tests don't need espeak
    return [1] + [20 + (ord(c) % 5) * 2 for c in text if c.isalpha()][:8] + [2]


def test_plan_gaps_and_defaults():
    plan = plan_ssml('<speak><phoneme ph="ab"/><break time="1s"/>'
                     '<phoneme ph="cd"/><phoneme ph="ef"/></speak>',
                     {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21],
                      "c": [22], "d": [23], "e": [24], "f": [25]},
                     sentence_silence=0.2)
    assert plan.assembly == [("utt", 0), ("gap", 1.0), ("utt", 1),
                             ("gap", 0.2), ("utt", 2)]


def test_plan_requires_phonemizer_for_text_only():
    idmap = {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]}
    with pytest.raises(SsmlError):
        plan_ssml("just text", idmap)
    plan = plan_ssml("just text", idmap, _fake_phonemize)
    assert len(plan.utterances) == 1
    # phoneme-only documents need no phonemizer
    plan2 = plan_ssml('<speak><phoneme ph="ab"/></speak>', idmap)
    assert len(plan2.utterances) == 1


def test_grouping_by_scale_and_conditioning():
    idmap = {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]}
    plan = plan_ssml(
        '<speak><phoneme ph="ab"/>'
        '<prosody rate="80%"><phoneme ph="ab"/></prosody>'
        '<voice name="1"><phoneme ph="ab"/></voice>'
        '<voice name="0:0.5,1:0.5"><phoneme ph="ab"/></voice>'
        '<phoneme ph="ba"/></speak>', idmap)
    groups = group_utterances(plan)
    # default-ls id rows batch together (incl. the <voice name=1> row);
    # the rate span and the mix span each get their own group
    assert sorted(map(sorted, groups)) == [[0, 2, 4], [1], [3]]


def test_assemble_volume_and_clip():
    plan = plan_ssml('<speak><prosody volume="2.0"><phoneme ph="ab"/>'
                     '</prosody></speak>',
                     {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]})
    loud = assemble([np.full(10, 0.6, np.float32)], plan, 100)
    assert loud.max() == pytest.approx(1.0)  # 0.6 * 2.0 clipped


# -- rendering on the runtime --------------------------------------------


def test_render_ipa_only(runtime):
    # Same document with two break lengths: identical batching (one 2-row
    # group both times), so the waveforms differ ONLY by the gap length
    # and the audio around it is bit-identical.
    short = render_ssml(runtime, '<speak><phoneme ph="ab"/>'
                                 '<break time="0.5s"/>'
                                 '<phoneme ph="ba"/></speak>')
    long = render_ssml(runtime, '<speak><phoneme ph="ab"/>'
                                '<break time="1.0s"/>'
                                '<phoneme ph="ba"/></speak>')
    extra = int(round(0.5 * runtime.sample_rate))
    assert len(long) == len(short) + extra
    # identical before the gap...
    np.testing.assert_array_equal(short[:1000], long[:1000])
    # ...identical after it (shifted by the extra silence)...
    np.testing.assert_array_equal(short[-1000:], long[-1000:])
    # ...and the difference is exactly silence
    assert (long == 0).sum() == (short == 0).sum() + extra


def test_render_voice_mix_one_hot(runtime):
    a_id = render_ssml(
        runtime, '<speak><voice name="2"><phoneme ph="ab"/></voice></speak>')
    a_mix = render_ssml(
        runtime,
        '<speak><voice name="2:1.0"><phoneme ph="ab"/></voice></speak>')
    np.testing.assert_array_equal(a_id, a_mix)


def test_render_rate_changes_duration(runtime):
    fast = render_ssml(runtime, '<speak><prosody rate="x-fast">'
                                '<phoneme ph="abab"/></prosody></speak>')
    slow = render_ssml(runtime, '<speak><prosody rate="x-slow">'
                                '<phoneme ph="abab"/></prosody></speak>')
    assert len(slow) > len(fast)


def test_render_volume(runtime):
    plain = render_ssml(runtime, '<speak><phoneme ph="ab"/></speak>')
    quiet = render_ssml(runtime, '<speak><prosody volume="-6dB">'
                                 '<phoneme ph="ab"/></prosody></speak>')
    ratio = np.abs(quiet).max() / np.abs(plain).max()
    assert ratio == pytest.approx(10 ** (-6 / 20), rel=1e-3)


def test_cli_ssml(runtime, tmp_path):
    from piper_tpu import cli
    from piper_tpu.utils.wav import read_wav

    # build a dedicated voice on disk for the CLI
    d = tmp_path / "cli_voice"
    model, _ = make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                    gin_channels=32)
    out = tmp_path / "ssml.wav"
    cli.main(["--model", str(model), "--ssml",
              '<speak><voice name="1"><phoneme ph="AB"/></voice>'
              '<break time="250ms"/><phoneme ph="BA"/></speak>',
              "-o", str(out)])
    audio, sr = read_wav(out)
    assert len(audio) > int(0.25 * sr)
    # a file path works too
    doc = tmp_path / "doc.ssml"
    doc.write_text('<speak><phoneme ph="AB"/></speak>')
    out2 = tmp_path / "ssml2.wav"
    cli.main(["--model", str(model), "--ssml", str(doc), "-o", str(out2)])
    assert read_wav(out2)[0].size > 0
    # conflicting flags are tidy exits
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--ssml", "<speak>x</speak>",
                  "--speaker-id", "1", "-o", str(tmp_path / "x.wav")])
    with _pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--ssml", "<speak><broken",
                  "-o", str(tmp_path / "y.wav")])
    # a typo'd file path must not be read ALOUD as literal text
    with _pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--ssml", "no_such_doc.ssml",
                  "-o", str(tmp_path / "z.wav")])
    # an out-of-range <voice> id is a tidy exit, not a traceback (and not
    # a silent clamp to the wrong speaker)
    with _pytest.raises(SystemExit):
        cli.main(["--model", str(model), "--ssml",
                  '<speak><voice name="99"><phoneme ph="AB"/></voice>'
                  '</speak>', "-o", str(tmp_path / "w.wav")])


def test_render_out_of_range_voice_raises(runtime):
    with pytest.raises(ValueError):
        render_ssml(runtime, '<speak><voice name="99">'
                             '<phoneme ph="AB"/></voice></speak>')
    with pytest.raises(ValueError):
        render_ssml(runtime, '<speak><voice name="-1">'
                             '<phoneme ph="AB"/></voice></speak>')


def test_http_ssml(runtime, tmp_path_factory):
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    d = tmp_path_factory.mktemp("http_ssml_voice")
    srv = PiperHTTPServer(
        {"v": _RT(*make_synthetic_voice(d, quality="test", seed=6,
                                        n_speakers=4, gin_channels=32))},
        port=0, max_batch=4, max_wait_ms=10)
    srv.start()

    def post(body):
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        try:
            conn.request("POST", "/v1/synthesize",
                         body=_json.dumps(body).encode(),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, r.read()
        finally:
            conn.close()

    try:
        st, wav = post({"ssml": '<speak><voice name="0:0.5,2:0.5">'
                                '<phoneme ph="AB"/></voice>'
                                '<break time="200ms"/>'
                                '<prosody rate="80%"><phoneme ph="BA"/>'
                                '</prosody></speak>'})
        assert st == 200 and wav[:4] == b"RIFF"
        # malformed / conflicting -> 400
        st, _ = post({"ssml": "<speak><broken"})
        assert st == 400
        st, _ = post({"ssml": "<speak><phoneme ph='AB'/></speak>",
                      "speaker_id": 1})
        assert st == 400
        st, _ = post({"ssml": '<speak><voice name="9"><phoneme ph="AB"/>'
                              '</voice></speak>'})
        assert st == 400  # out-of-range speaker from door-step validation
        # the client SDK end to end
        from piper_tpu.client import PiperClient

        c = PiperClient(srv.host, srv.port)
        audio, sr = c.synthesize(ssml='<speak><phoneme ph="AB"/></speak>')
        assert len(audio) > 0 and sr == 16000
        with pytest.raises(ValueError):
            c.synthesize(text="x", ssml="<speak>y</speak>")
    finally:
        srv.close()


def test_ssml_alignment_matches_render(runtime):
    from piper_tpu.core.ssml import ssml_alignment

    doc = ('<speak><voice name="1"><phoneme ph="AB"/></voice>'
           '<break time="0.4s"/>'
           '<prosody rate="80%"><phoneme ph="BABA"/></prosody></speak>')
    audio = render_ssml(runtime, doc)
    align = ssml_alignment(runtime, doc)
    # the alignment doc describes EXACTLY the rendered waveform
    assert align["total_samples"] == len(audio)
    utts = align["utterances"]
    assert len(utts) == 2
    # the second utterance starts after utterance 1 + the explicit break
    # (spans come back already shifted by the utterance offsets)
    gap = int(round(0.4 * runtime.sample_rate))
    u0_end = utts[0]["phonemes"][-1]["end_sample"]
    assert utts[1]["phonemes"][0]["start_sample"] >= u0_end + gap - 1
    # spans fall inside the waveform
    assert utts[1]["phonemes"][-1]["end_sample"] <= len(audio)


def test_http_ssml_durations(runtime, tmp_path_factory):
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    d = tmp_path_factory.mktemp("http_ssml_dur")
    srv = PiperHTTPServer(
        {"v": _RT(*make_synthetic_voice(d, quality="test", seed=6,
                                        n_speakers=4, gin_channels=32))},
        port=0, max_batch=4, max_wait_ms=10)
    srv.start()
    try:
        from piper_tpu.client import PiperClient

        c = PiperClient(srv.host, srv.port)
        doc = ('<speak><phoneme ph="AB"/><break time="0.3s"/>'
               '<voice name="0:0.5,2:0.5"><phoneme ph="BA"/></voice>'
               '</speak>')
        align = c.durations(ssml=doc)
        assert len(align["utterances"]) == 2
        assert align["total_samples"] > 0
        audio, sr = c.synthesize(ssml=doc)
        assert align["total_samples"] == len(audio)
        # conflicting knobs -> 400
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        try:
            conn.request("POST", "/v1/durations",
                         body=_json.dumps({"ssml": doc, "speaker_id": 1}
                                          ).encode(),
                         headers={"Content-Type": "application/json"})
            assert conn.getresponse().status == 400
        finally:
            conn.close()
    finally:
        srv.close()


def test_http_ssml_ignored_surfaced(runtime, tmp_path_factory):
    """Unsupported SSML features are REPORTED over HTTP (header on audio
    responses, 'ignored' in the durations JSON) — never silently dropped."""
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    d = tmp_path_factory.mktemp("http_ssml_ign")
    srv = PiperHTTPServer(
        {"v": _RT(*make_synthetic_voice(d, quality="test", seed=6,
                                        n_speakers=4, gin_channels=32))},
        port=0, max_batch=4, max_wait_ms=10)
    srv.start()
    try:
        doc = ('<speak><prosody pitch="+2st"><phoneme ph="AB"/></prosody>'
               '</speak>')
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        conn.request("POST", "/v1/synthesize",
                     body=_json.dumps({"ssml": doc}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 200
        assert "pitch" in (resp.getheader("X-Piper-Ignored") or "")
        conn.close()
        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        conn.request("POST", "/v1/durations",
                     body=_json.dumps({"ssml": doc}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = _json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert any("pitch" in m for m in body.get("ignored", []))
    finally:
        srv.close()


def test_stream_bad_speaker_is_400(tmp_path_factory):
    """Out-of-range speakers on the streaming surface fail BEFORE headers
    (clean 400) — not as a truncated 200 chunked body."""
    import http.client
    import json as _json

    from piper_tpu.engine.http_server import PiperStreamingHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    d = tmp_path_factory.mktemp("stream_400_voice")
    rt = _RT(*make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                   gin_channels=32))
    srv = PiperStreamingHTTPServer(rt, port=0, max_sessions=4)
    srv.start()
    try:
        for body in ({"phoneme_ids": list(FIXTURE_IDS), "speaker_id": 99},
                     {"ssml": '<speak><voice name="99">'
                              '<phoneme ph="AB"/></voice></speak>'}):
            conn = http.client.HTTPConnection(srv.host, srv.port,
                                              timeout=600)
            try:
                conn.request("POST", "/v1/stream",
                             body=_json.dumps(body).encode(),
                             headers={"Content-Type": "application/json"})
                assert conn.getresponse().status == 400, body
            finally:
                conn.close()
    finally:
        srv.close()


def test_streaming_http_ssml(tmp_path_factory):
    from piper_tpu.client import PiperStreamingClient
    from piper_tpu.engine.http_server import PiperStreamingHTTPServer
    from piper_tpu.engine.runtime import PiperRuntime as _RT

    d = tmp_path_factory.mktemp("stream_ssml_voice")
    rt = _RT(*make_synthetic_voice(d, quality="test", seed=6, n_speakers=4,
                                   gin_channels=32))
    srv = PiperStreamingHTTPServer(rt, port=0, max_sessions=4)
    srv.start()
    try:
        c = PiperStreamingClient(srv.host, srv.port)
        doc = ('<speak><voice name="2"><phoneme ph="AB"/></voice>'
               '<break time="0.3s"/>'
               '<prosody volume="50%"><phoneme ph="BA"/></prosody></speak>')
        audio = np.concatenate(list(c.stream(ssml=doc)))
        assert c.sample_rate == rt.sample_rate
        # the break arrives as >= 0.3s of exact silence
        gap = int(round(0.3 * rt.sample_rate))
        assert (audio == 0).sum() >= gap
        assert np.abs(audio).max() > 0
        # conflicting knobs are 400s before any bytes
        import http.client
        import json as _json

        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=600)
        try:
            conn.request("POST", "/v1/stream",
                         body=_json.dumps({"ssml": doc, "speaker_id": 1}
                                          ).encode(),
                         headers={"Content-Type": "application/json"})
            assert conn.getresponse().status == 400
        finally:
            conn.close()
    finally:
        srv.close()


def test_render_text_with_injected_phonemizer(runtime):
    audio = render_ssml(runtime, "<speak>Hello world. Second sentence."
                                 "</speak>", _fake_phonemize)
    assert len(audio) > 0 and np.isfinite(audio).all()
    # two sentences -> a default sentence gap of exact silence in between
    assert (audio == 0).sum() >= int(0.2 * runtime.sample_rate)
