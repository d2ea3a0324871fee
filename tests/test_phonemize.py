"""Phonemizer subprocess tests via a fake espeak-ng binary + REPL smoke."""

import os
import stat

import numpy as np
import pytest

from piper_tpu import cli
from piper_tpu.models.vits.synthetic import make_synthetic_voice
from piper_tpu.phonemize import ESpeakPhonemizer, PhonemizerError


@pytest.fixture()
def fake_espeak(tmp_path):
    """A stand-in espeak-ng that prints a fixed IPA string for any input."""
    script = tmp_path / "espeak-ng"
    script.write_text("#!/bin/sh\necho 'ab'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


def test_phonemizer_pipeline(fake_espeak):
    id_map = {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]}
    ph = ESpeakPhonemizer("en", id_map, espeak_path=fake_espeak)
    assert ph.to_ipa("whatever text") == "ab"
    assert ph.phoneme_ids("whatever text") == [1, 20, 0, 21, 0, 2]


def test_phonemizer_failure(tmp_path):
    bad = tmp_path / "espeak-ng"
    bad.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    ph = ESpeakPhonemizer("en", {"^": [1], "$": [2], "_": [0]}, espeak_path=str(bad))
    with pytest.raises(PhonemizerError, match="exit code 3"):
        ph.to_ipa("x")


def test_repl_smoke(tmp_path, monkeypatch, capsys, fake_espeak):
    model, config = make_synthetic_voice(tmp_path / "v", quality="test", seed=0)
    lines = iter(["hello there", ":q"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(lines))
    monkeypatch.setattr("piper_tpu.phonemize.find_espeak", lambda: fake_espeak)
    monkeypatch.chdir(tmp_path)
    cli.main(["--model", str(model)])
    out = capsys.readouterr().out
    assert "wrote" in out
    from piper_tpu.utils.wav import read_wav

    audio, rate = read_wav(tmp_path / "repl_000.wav")
    assert rate == 16000
    assert len(audio) > 0 and np.isfinite(audio).all()
