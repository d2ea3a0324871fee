"""Roofline/MFU accounting tests: analytic cost model sanity + the measured
per-stage path end to end on CPU."""

import numpy as np
import pytest

from piper_tpu.models.vits.hparams import PRESETS
from piper_tpu.utils.roofline import (duration_predictor_cost, encoder_cost,
                                      flow_cost, pipeline_costs, total_cost,
                                      vocoder_level_costs)


def test_costs_positive_and_scale_with_shapes():
    hp = PRESETS["medium"]
    for s in pipeline_costs(hp, B=1, P=128, T=768):
        assert s.flops > 0 and s.bytes > 0, s.stage
    # FLOPs scale linearly in batch and (frame-stage) in T.
    t1 = total_cost(hp, 1, 128, 768)
    t2 = total_cost(hp, 2, 128, 768)
    assert t2.flops == pytest.approx(2 * t1.flops, rel=0.05)
    f1 = flow_cost(hp, 1, 768)
    f2 = flow_cost(hp, 1, 1536)
    assert f2.flops == pytest.approx(2 * f1.flops, rel=0.01)


def test_vocoder_dominates_medium_voice():
    """The documented FLOP split: the HiFi-GAN vocoder carries ~90% of the
    decode FLOPs (the waveform axis is hop_length x longer)."""
    hp = PRESETS["medium"]
    T, P = 768, 128
    voc = sum(s.flops for s in vocoder_level_costs(hp, 1, T))
    tot = total_cost(hp, 1, P, T).flops
    assert voc / tot > 0.7


def test_vocoder_flops_match_param_math():
    """Cross-check one level against hand math: level 0 of medium is
    conv_transpose 512->256 k16 at T plus 3 branches x 6 convs of 256^2."""
    hp = PRESETS["medium"]
    T = 100
    rows = vocoder_level_costs(hp, 1, T)
    up0 = rows[1]
    assert up0.stage == "vocoder.up0"
    ct_macs = T * 16 * 512 * 256
    res_macs = sum(
        T * hp.upsample_rates[0] * 256 * 256 * kj * 2 * len(dils)
        for kj, dils in zip(hp.resblock_kernel_sizes,
                            hp.resblock_dilation_sizes)
    )
    assert up0.flops == pytest.approx(2 * (ct_macs + res_macs), rel=1e-6)


def test_encoder_dp_costs_reasonable():
    hp = PRESETS["medium"]
    e = encoder_cost(hp, 1, 128)
    d = duration_predictor_cost(hp, 1, 128)
    # The encoder is much bigger than the DP but both are far below decode.
    assert e.flops > d.flops
    assert e.intensity > 1.0


@pytest.mark.slow
def test_measured_report_on_cpu(tiny_voice):
    """End-to-end measured report on the tiny voice: every stage gets a
    time, achieved rates, and a roofline verdict."""
    from piper_tpu.engine.runtime import PiperRuntime
    from piper_tpu.utils.roofline import roofline_report

    rt = PiperRuntime(*tiny_voice)
    # Tiny ceilings run (and tiny shapes) so the test stays in seconds.
    from piper_tpu.utils import roofline as rl

    ceilings = rl.measure_ceilings(iters=2, n=256)
    for v in ceilings.values():
        assert v > 0
    rep = roofline_report(rt, B=2, P=16, T=64, iters=2, per_level=True,
                          ceilings=ceilings)
    names = [s["stage"] for s in rep["stages"]]
    assert "encode(enc+dp)" in names and "flow" in names and "vocoder" in names
    assert any(n.startswith("vocoder.up") for n in names)
    for s in rep["stages"]:
        # Report values are rounded: a sub-µs stage can round ms to 0.0,
        # and a badly contended box can round a tiny stage's tf_s to 0.0
        # (both seen once on a fully loaded box). Per-stage values are
        # therefore only sign-checked; real positivity is asserted on the
        # totals below and on at least one stage.
        assert s["ms"] >= 0
        assert s["tf_s"] >= 0
        assert s["bound"] in ("compute", "memory")
    assert any(s["tf_s"] > 0 for s in rep["stages"])
    assert rep["total_gflops_per_synthesis"] > 0
