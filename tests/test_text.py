"""Sentence segmentation + long-text CLI synthesis (batched sentences)."""

import stat

import numpy as np
import pytest

from piper_tpu.core.text import split_sentences


@pytest.mark.parametrize("text,want", [
    ("Hello there. How are you?", ["Hello there.", "How are you?"]),
    ("One! Two? Three.", ["One!", "Two?", "Three."]),
    ("Just one sentence", ["Just one sentence"]),
    ("", []),
    ("   ", []),
    # abbreviations and initials do not split
    ("Dr. Smith went to Washington. He arrived late.",
     ["Dr. Smith went to Washington.", "He arrived late."]),
    ("Meet J. R. Hartley. He wrote a book.",
     ["Meet J. R. Hartley.", "He wrote a book."]),
    ("It costs 3.14 dollars. Cheap!", ["It costs 3.14 dollars.", "Cheap!"]),
    ("See fig. 4 for details. Then continue.",
     ["See fig. 4 for details.", "Then continue."]),
    # quotes after terminators stay attached
    ('He said "stop." Then he left.', ['He said "stop."', "Then he left."]),
    # ellipsis
    ("Wait… What was that?", ["Wait…", "What was that?"]),
    # lowercase continuation after '.' does not split
    ("the file is main. py is great. Next sentence.",
     ["the file is main. py is great.", "Next sentence."]),
    # whitespace collapses
    ("A  first   one.   A\nsecond one.", ["A first one.", "A second one."]),
])
def test_split_sentences(text, want):
    assert split_sentences(text) == want


@pytest.fixture()
def fake_espeak(tmp_path, monkeypatch):
    """Fake espeak-ng (prints 'ab' for any input) patched into find_espeak
    so --text works without the real binary."""
    script = tmp_path / "espeak-ng"
    script.write_text("#!/bin/sh\necho 'ab'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr("piper_tpu.phonemize.find_espeak",
                        lambda: str(script))
    return str(script)


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    d = tmp_path_factory.mktemp("text_voice")
    model, _ = make_synthetic_voice(d, quality="test", seed=0)
    return model


def _read_wav(path):
    from piper_tpu.utils.wav import read_wav

    return read_wav(path)


def test_cli_multi_sentence_batch(voice, tmp_path, fake_espeak, capsys):
    from piper_tpu import cli

    out = tmp_path / "multi.wav"
    cli.main(["--model", str(voice), "--text", "First one. Second one!",
              "--sentence-silence", "0.25", "-o", str(out)])
    msg = capsys.readouterr().out
    assert "2 sentences" in msg
    audio, sr = _read_wav(str(out))
    # one 0.25 s gap of exact zeros between the sentences
    assert len(audio) > int(0.25 * sr)

    # single-utterance comparison: --no-sentence-split takes the old path
    out2 = tmp_path / "single.wav"
    cli.main(["--model", str(voice), "--text", "First one. Second one!",
              "--no-sentence-split", "-o", str(out2)])
    msg2 = capsys.readouterr().out
    assert "sentences" not in msg2


def test_cli_multi_sentence_stream(voice, tmp_path, fake_espeak, capsys):
    from piper_tpu import cli

    out = tmp_path / "multi_stream.wav"
    cli.main(["--model", str(voice), "--stream", "--text",
              "First one. Second one!", "--sentence-silence", "0.1",
              "-o", str(out)])
    msg = capsys.readouterr().out
    assert "2 sentences" in msg and "streamed" in msg
    audio, sr = _read_wav(str(out))
    assert len(audio) > int(0.1 * sr)
    assert np.isfinite(audio).all()


@pytest.mark.parametrize("text,want", [
    # terminator-led / dots-only prefixes must not crash (review finding)
    (". Hello there. Bye.", [".", "Hello there.", "Bye."]),
    ("... so it begins. Done.", ["... so it begins.", "Done."]),
    ("...", ["..."]),
])
def test_split_sentences_degenerate_prefixes(text, want):
    assert split_sentences(text) == want


def test_join_with_silence_rejects_negative():
    from piper_tpu.core.audio import join_with_silence

    with pytest.raises(ValueError):
        join_with_silence([np.zeros(4, np.float32)] * 2, -10)
    out = join_with_silence([np.ones(2, np.float32), np.ones(3, np.float32)], 5)
    assert len(out) == 10 and (out[2:7] == 0).all()


def test_cli_multi_sentence_speaker_id(tmp_path, fake_espeak, capsys):
    """--speaker-id must reach the batched sentence path as per-row
    speaker_ids (review finding: synthesize_batch has no speaker_id kwarg)."""
    from piper_tpu import cli
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    model, _ = make_synthetic_voice(tmp_path / "ms", quality="test", seed=4,
                                    n_speakers=3, gin_channels=16)
    out = tmp_path / "ms.wav"
    cli.main(["--model", str(model), "--text", "First one. Second one!",
              "--speaker-id", "2", "-o", str(out)])
    assert "2 sentences" in capsys.readouterr().out


def test_cli_negative_sentence_silence_is_usage_error(tmp_path, fake_espeak,
                                                      voice):
    from piper_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["--model", str(voice), "--text", "A one. B two.",
                  "--sentence-silence", "-0.1", "-o", str(tmp_path / "x.wav")])
