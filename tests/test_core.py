"""Core I/O tests: config schema, phoneme framing, voice index, test vectors."""

import json

import numpy as np
import pytest

from piper_tpu.core.audio import AudioChunk, AudioFormat, float_to_int16
from piper_tpu.core.config import VoiceConfig
from piper_tpu.core.phonemes import UnknownSymbolError, ipa_to_ids
from piper_tpu.core.test_vector import TestSummary
from piper_tpu.core.voices import VoiceIndex

EXAMPLE_CONFIG = {
    "audio": {"sample_rate": 22050, "quality": "medium"},
    "espeak": {"voice": "en-gb-x-rp"},
    "inference": {"noise_scale": 0.667, "length_scale": 1.0, "noise_w": 0.8},
    "phoneme_type": "espeak",
    "phoneme_id_map": {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]},
    "num_symbols": 256,
    "num_speakers": 1,
    "language": {"code": "en_GB"},
    "dataset": "northern_english_male",
    "custom_extra": {"kept": True},
}


def test_config_roundtrip(tmp_path):
    p = tmp_path / "voice.onnx.json"
    p.write_text(json.dumps(EXAMPLE_CONFIG))
    cfg = VoiceConfig.load(p)
    assert cfg.audio.sample_rate == 22050
    assert cfg.audio.quality == "medium"
    assert cfg.espeak.voice == "en-gb-x-rp"
    assert cfg.inference.noise_scale == pytest.approx(0.667)
    assert cfg.inference.noise_w == pytest.approx(0.8)
    assert cfg.phoneme_id_map["a"] == [20]
    assert cfg.num_symbols == 256
    assert cfg.language.code == "en_GB"
    assert cfg.extras["custom_extra"] == {"kept": True}
    out = tmp_path / "roundtrip.json"
    cfg.save(out)
    cfg2 = VoiceConfig.load(out)
    assert cfg2 == cfg


def test_config_defaults():
    cfg = VoiceConfig.from_dict({"phoneme_id_map": {"^": [1]}})
    assert cfg.audio.sample_rate == 22050
    assert cfg.inference.length_scale == 1.0
    assert cfg.num_speakers == 1


def test_phoneme_framing():
    id_map = {"^": [1], "$": [2], "_": [0], "a": [20], "b": [21]}
    # bos, then (id, blank) per phoneme, then eos — matches the reference's
    # fixture layout [1, 20, 0, ..., 2] (ESpeakPhonemizer.swift:76-103).
    assert ipa_to_ids("ab", id_map) == [1, 20, 0, 21, 0, 2]
    assert ipa_to_ids("", id_map) == [1, 2]
    # Zero-width joiner and newlines are skipped.
    assert ipa_to_ids("a‍b\n", id_map) == [1, 20, 0, 21, 0, 2]
    with pytest.raises(UnknownSymbolError):
        ipa_to_ids("z", id_map)


def test_voice_index_bundled():
    idx = VoiceIndex.load_bundled()
    assert len(idx.entries) >= 100
    e = idx.get("en_GB-northern_english_male-medium")
    assert e is not None
    assert e.language == "en_GB"
    assert e.quality == "medium"
    assert e.model_url.endswith("en_GB-northern_english_male-medium.onnx")
    assert e.config_url == e.model_url + ".json"


def test_voice_index_pattern_fallback():
    e = VoiceIndex.entry_for_id("xx_YY-some-name-high")
    assert e.language == "xx_YY"
    assert e.quality == "high"
    assert "/xx/xx_YY/some-name/high/" in e.model_url


def test_test_summary_fixture(tmp_path):
    # The bench fixture layout from the reference
    # (bench/fixtures/test_summary.json).
    summary = {
        "model_path": "",
        "config_path": "",
        "num_tests": 1,
        "results": [
            {
                "test_id": "fixture_short",
                "phoneme_ids": [1, 20, 0, 120, 0, 61, 0, 24, 0, 59, 0, 100, 0, 2],
                "metadata": {
                    "sample_rate": 22050,
                    "input_length": 14,
                    "noise_scale": 0.667,
                    "length_scale": 1.0,
                    "noise_w": 0.8,
                    "speaker_id": None,
                },
                "audio_files": {"float32": "", "int16": "", "wav": ""},
            }
        ],
    }
    p = tmp_path / "test_summary.json"
    p.write_text(json.dumps(summary))
    s = TestSummary.load(p)
    assert s.num_tests == 1
    tv = s.results[0]
    assert tv.phoneme_ids[:3] == [1, 20, 0]
    assert len(tv.phoneme_ids) == 14
    assert tv.metadata.noise_w == pytest.approx(0.8)
    assert tv.metadata.speaker_id is None


def test_random_files_loading(tmp_path):
    dp = np.random.default_rng(0).standard_normal((1, 2, 14)).astype(np.float32)
    dp.tofile(tmp_path / "dp.bin")
    summary = {
        "results": [
            {
                "test_id": "t",
                "phoneme_ids": [1, 2],
                "metadata": {},
                "random_files": {
                    "dp_randomnormalike": "dp.bin",
                    "dp_shape": [1, 2, 14],
                    "main_randomnormalike": "",
                    "main_shape": [],
                },
            }
        ]
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(summary))
    s = TestSummary.load(p)
    rf = s.results[0].random_files
    loaded = rf.load_dp(s.base_dir)
    np.testing.assert_array_equal(loaded, dp)
    assert rf.load_main(s.base_dir) is None


def test_audio_types():
    chunk = AudioChunk(
        format=AudioFormat(sample_rate=22050),
        start_sample_index=0,
        samples=np.zeros(2205, dtype=np.float32),
        is_final=True,
    )
    assert chunk.duration_seconds == pytest.approx(0.1)
    i16 = float_to_int16(np.array([-2.0, -1.0, 0.0, 1.0, 2.0], dtype=np.float32))
    assert i16.dtype == np.int16
    assert i16.tolist() == [-32767, -32767, 0, 32767, 32767]
