"""Driver-contract test: bench.py must print ONE valid JSON line with the
schema the round driver records (BENCH_r{N}.json). Runs the real bench
main() on the tiny test preset so a broken flag default or schema typo
fails CI instead of the driver's end-of-round capture."""

import json

import pytest


@pytest.mark.slow
def test_bench_quick_schema(capsys):
    import bench

    bench.main([
        "--quick", "--platform", "cpu", "--quality", "test", "--batch", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])

    # the driver-required triplet
    assert payload["metric"] == "rtf_per_chip"
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["unit"] == "x_realtime"
    assert isinstance(payload["vs_baseline"], (int, float))

    # schema rows the judge reads
    assert payload["throughput"]["rtf_throughput"] > 0
    assert payload["throughput_pipelined"]["rtf_throughput"] > 0
    assert payload["multispeaker"]["rtf_throughput"] > 0
    assert payload["vocoder_precision"] == "high"
    assert payload["flow_precision"] == "high"
    assert payload["output_dtype"] == "int16"
    assert "streaming_server" in payload  # populated on full (non-quick) runs
    factors = [r["factor"] for r in payload["rows"]]
    assert factors == [1, 2]  # --quick trims the sweep
    for r in payload["rows"]:
        assert r["ms_mean"] > 0 and r["rtf_mean"] > 0

    # headline = best measured serving mode
    best = max(payload["throughput"]["rtf_throughput"],
               payload["throughput_pipelined"]["rtf_throughput"])
    assert payload["value"] == round(best, 2)
