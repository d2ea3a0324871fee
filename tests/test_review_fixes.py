"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax.numpy as jnp

from piper_tpu import cli
from piper_tpu.engine.batcher import BatchingServer
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions
from piper_tpu.models.vits.hparams import VitsHParams
from piper_tpu.models.vits.model import encode, decode
from piper_tpu.models.vits.params import params_from_arrays
from piper_tpu.models.vits.synthetic import synthetic_params
from piper_tpu.testing import record_test_vector

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS

SMALL = VitsHParams(
    n_vocab=40, inter_channels=32, hidden_channels=32, filter_channels=64,
    n_heads=2, n_layers=1, dp_filter_channels=32, dp_n_flows=2,
    flow_n_flows=1, flow_hidden_channels=32, flow_n_layers=2,
    resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
    upsample_rates=[4, 4], upsample_initial_channel=64,
    upsample_kernel_sizes=[8, 8],
)


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_padded_decode_equals_exact_length_decode():
    """Finding 1: bucket padding must not contaminate the valid audio tail.

    Decoding at a padded bucket and at exactly y_len frames must agree on
    the valid region (the dynamic-shape reference ends its array at y_len)."""
    weights = synthetic_params(SMALL, seed=31)
    params = params_from_arrays(weights)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, SMALL.n_vocab, size=(1, 12))
    dp_noise = rng.standard_normal((1, 2, 12)).astype(np.float32)
    enc = encode(params, SMALL, jnp.asarray(ids), jnp.asarray([12]),
                 jnp.asarray(dp_noise))
    y_len = int(np.asarray(enc.y_total)[0])
    assert y_len >= 4, "need a few frames for the comparison"
    big = y_len + 40
    noise = rng.standard_normal((1, SMALL.inter_channels, big)).astype(np.float32)

    a_pad, _ = decode(params, SMALL, enc, jnp.asarray(noise), max_frames=big)
    a_exact, _ = decode(params, SMALL, enc, jnp.asarray(noise[:, :, :y_len]),
                        max_frames=y_len)
    n = y_len * SMALL.hop_length
    np.testing.assert_allclose(np.asarray(a_pad)[0, :n], np.asarray(a_exact)[0, :n],
                               atol=1e-5)


def test_streaming_matches_full_without_total_frames(runtime):
    """Finding 3: with shared injected noise, streaming must equal the full
    decode even with the DEFAULT total_frames (no override)."""
    hp = runtime.hparams
    rng = np.random.default_rng(11)
    ids = FIXTURE_IDS * 2
    dp_noise = rng.standard_normal((1, 2, len(ids))).astype(np.float32)
    runtime.synthesize(ids, dp_noise=dp_noise)
    fb = runtime.last_run_timings.frame_bucket
    main_noise = rng.standard_normal((1, hp.inter_channels, fb)).astype(np.float32)
    full = runtime.synthesize(ids, dp_noise=dp_noise, main_noise=main_noise)
    streamed = np.concatenate([
        c.samples for c in runtime.synthesize_stream_incremental(
            ids, chunk_frames=16, dp_noise=dp_noise, main_noise=main_noise)
    ])
    assert len(streamed) == len(full)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_injected_noise_overflow_clamps(tiny_voice):
    """Finding 2: the injected-noise path clamps instead of raising."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(frame_buckets=(32, 64)))
    rng = np.random.default_rng(0)
    mn = rng.standard_normal((1, rt.hparams.inter_channels, 64)).astype(np.float32)
    audio = rt.synthesize(FIXTURE_IDS, length_scale=10.0, main_noise=mn)
    assert len(audio) == 64 * rt.hparams.hop_length
    assert np.isfinite(audio).all()


def test_streaming_validates_inputs(runtime):
    """Finding 6: streaming validates like every other entry point."""
    with pytest.raises(ValueError):
        list(runtime.synthesize_stream_incremental([]))
    with pytest.raises(ValueError):
        list(runtime.synthesize_stream_incremental([999999]))


def test_recorder_times_only_recorded_run(runtime, tmp_path):
    """Finding 5: inference_time_sec covers one synthesis, so RTF is sane."""
    vec = record_test_vector(runtime, FIXTURE_IDS * 4, tmp_path, "t", seed=1)
    md = vec["metadata"]
    # One x_low synthesis of ~1.3s audio takes well under 2s on CPU once
    # compiled; the old double-counting made this 2x.
    assert md["inference_time_sec"] < 10
    assert md["real_time_factor"] == pytest.approx(
        md["audio_duration_sec"] / md["inference_time_sec"], rel=1e-6
    )


def test_batcher_preserves_arrival_order_on_scale_mismatch(runtime):
    """Finding 8: a mismatched-scale request is served AFTER the group it
    interrupted — completion order follows arrival order."""
    import time

    done_order = []
    with BatchingServer(runtime, max_batch=8, max_wait_ms=150) as server:
        f_a = server.submit(FIXTURE_IDS)
        f_a.add_done_callback(lambda _: done_order.append("a"))
        time.sleep(0.02)
        f_b = server.submit(FIXTURE_IDS, length_scale=2.0)
        f_b.add_done_callback(lambda _: done_order.append("b"))
        a = f_a.result(timeout=300)
        b = f_b.result(timeout=300)
    assert len(b) > len(a)
    assert done_order == ["a", "b"]


def test_cli_env_precision_flag(tiny_voice, tmp_path, monkeypatch):
    """Finding 9: PIPER_TPU_PRECISION reaches the runtime from the CLI."""
    model, _ = tiny_voice
    monkeypatch.setenv("PIPER_TPU_PRECISION", "high")
    captured = {}
    orig_init = PiperRuntime.__init__

    def spy(self, *a, **k):
        orig_init(self, *a, **k)
        captured["precision"] = self.options.precision

    monkeypatch.setattr(PiperRuntime, "__init__", spy)
    out = tmp_path / "o.wav"
    cli.main(["--model", str(model), "--phoneme-ids", "1,20,0,2", "-o", str(out)])
    assert captured["precision"] == "high"


# --- round-3 review findings -------------------------------------------------


def _tensor_proto_bytes(name, dims, data_type, payload=b""):
    """Minimal TensorProto: dims(1, packed), data_type(2), name(8), payload."""
    def varint(v):
        out = b""
        while True:
            b7, v = v & 0x7F, v >> 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def len_field(f, b):
        return varint((f << 3) | 2) + varint(len(b)) + b

    out = b""
    if dims:
        out += len_field(1, b"".join(varint(d) for d in dims))
    out += varint((2 << 3) | 0) + varint(data_type)
    out += len_field(8, name.encode())
    return out + payload


def test_loader_decodes_float16_in_int32_data():
    """Finding: int32_data payloads must be decoded per the declared type —
    float16 is stored there as raw bit patterns, not int32 values."""
    from piper_tpu.onnx.loader import _decode_tensor
    from piper_tpu.onnx.wire import Reader

    want = np.array([1.5, -2.0, 0.25], np.float16)

    def varint(v):
        out = b""
        while True:
            b7, v = v & 0x7F, v >> 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    bits = want.view(np.uint16).astype(np.int64)
    payload = b"".join(varint(int(b)) for b in bits)
    data = _tensor_proto_bytes(
        "w", [3], 10,  # FLOAT16
        varint((5 << 3) | 2) + varint(len(payload)) + payload)
    t = _decode_tensor(Reader(data))
    assert t.array.dtype == np.float16
    np.testing.assert_array_equal(t.array, want)


def test_loader_rejects_payloadless_tensor():
    """Finding: a non-empty tensor with no inline payload (external data)
    must fail loudly, never load as silent zeros."""
    from piper_tpu.onnx.loader import OnnxLoadError, _decode_tensor
    from piper_tpu.onnx.wire import Reader

    data = _tensor_proto_bytes("w", [2, 3], 1)  # FLOAT, no payload
    with pytest.raises(OnnxLoadError, match="no inline payload"):
        _decode_tensor(Reader(data))


def test_dispatch_batch_fused_false_takes_split_path(tiny_voice):
    """Finding: explicit fused=False on a 1-row batch of a fused-mode
    runtime must take the split path (the prewarmed-program contract), not
    silently delegate to dispatch_fused."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(mode="fused"))
    outs, meta = rt.dispatch_batch([FIXTURE_IDS], fused=False)
    assert not meta.get("fused1") and not meta.get("fused")
    # And the default (fused=None) still delegates for bit-identity.
    outs2, meta2 = rt.dispatch_batch([FIXTURE_IDS])
    assert meta2.get("fused1")


def test_single_chip_rungs_keep_exact_group_limit(runtime):
    """Finding: without a mesh, the top rung must be the bucket's exact
    group limit (e.g. 24), not snapped up the power-of-two ladder to 32."""
    server = BatchingServer.__new__(BatchingServer)
    server.rt = runtime
    server.max_rows = 24
    server.phoneme_budget = 24 * 128
    rungs = server._rungs(128)
    assert rungs[-1] == 24, rungs


def test_reset_metrics_zeroes_counters(runtime):
    with BatchingServer(runtime, max_batch=4, max_wait_ms=1.0) as server:
        server.submit(FIXTURE_IDS).result(timeout=300)
        assert server.metrics()["submitted"] == 1
        server.reset_metrics()
        m = server.metrics()
        assert m["submitted"] == 0 and m["groups"] == 0
        assert m["wait_ms_mean"] == 0.0


def test_roofline_dp_flows_matches_reverse_pass():
    """Finding: the analytic SDP cost must count dp_n_flows - 1 ConvFlows
    (the reverse pass skips the first one)."""
    import dataclasses

    from piper_tpu.utils.roofline import duration_predictor_cost

    hp2 = SMALL
    hp3 = dataclasses.replace(SMALL, dp_n_flows=3)
    c2 = duration_predictor_cost(hp2, 1, 64)
    c3 = duration_predictor_cost(hp3, 1, 64)
    # Adding one flow adds exactly one ConvFlow of cost; with the skip,
    # dp_n_flows=2 counts 1 ConvFlow and dp_n_flows=3 counts 2 — the
    # difference equals the per-flow cost, and the base (n=2) must be
    # strictly less than twice the difference plus the non-flow part.
    assert c3.flops > c2.flops
    per_flow = c3.flops - c2.flops
    # dp_n_flows=2 case: pre + convs + 1 ConvFlow => removing that one
    # ConvFlow's cost leaves the pre+convs part, which must be positive.
    assert c2.flops - per_flow > 0


def test_negative_seed_wraps_not_raises(tiny_runtime):
    """Negative integer seeds are legal caller input and must wrap mod 2**32
    (numpy 2 raises OverflowError on uint32(-1) otherwise). Wrapped seeds
    are also deterministic: -1 and 2**32 - 1 are the same stream."""
    import numpy as np

    a = tiny_runtime.synthesize(FIXTURE_IDS, seed=-1)
    b = tiny_runtime.synthesize(FIXTURE_IDS, seed=(1 << 32) - 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # streaming + batched head paths accept negatives too
    chunks = list(tiny_runtime.synthesize_stream(FIXTURE_IDS,
                                                 incremental=True, seed=-1000))
    assert chunks and chunks[-1].is_final
