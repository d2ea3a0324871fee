"""Async serving pipeline tests."""

import numpy as np
import pytest

from piper_tpu.engine.pipeline import ServingPipeline
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


@pytest.fixture(scope="module")
def runtime(tiny_runtime):
    return tiny_runtime


def test_pipeline_matches_fused_synthesize(runtime):
    rt_fused = PiperRuntime(
        runtime.model_path, runtime.config_path, RuntimeOptions(mode="fused")
    )
    ref = rt_fused.synthesize(FIXTURE_IDS, seed=9)
    with ServingPipeline(runtime) as pipe:
        fut = pipe.submit(FIXTURE_IDS, seed=9)
        audio = fut.result(timeout=300)
    np.testing.assert_array_equal(audio, ref)


def test_pipeline_many_requests_in_flight(runtime):
    reqs = [FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS * 2, FIXTURE_IDS[:4]] * 3
    with ServingPipeline(runtime, max_inflight=4) as pipe:
        futs = [pipe.submit(ids, seed=i) for i, ids in enumerate(reqs)]
        audios = [f.result(timeout=300) for f in futs]
    assert len(audios) == len(reqs)
    for a in audios:
        assert len(a) > 0 and np.isfinite(a).all()
    # Determinism across the pipeline: same request+seed, same audio.
    with ServingPipeline(runtime) as pipe:
        again = pipe.submit(reqs[0], seed=0).result(timeout=300)
    np.testing.assert_array_equal(again, audios[0])


@pytest.mark.slow
def test_pipeline_overflow_falls_back(runtime):
    rt = PiperRuntime(
        runtime.model_path, runtime.config_path,
        RuntimeOptions(mode="fused", fused_frames_per_phoneme=1),
    )
    ref = rt.synthesize(FIXTURE_IDS, length_scale=3.0)  # overflows the budget
    with ServingPipeline(rt) as pipe:
        audio = pipe.submit(FIXTURE_IDS, length_scale=3.0).result(timeout=300)
    np.testing.assert_array_equal(audio, ref)


def test_submit_batch_matches_synthesize_batch(runtime):
    batch = [FIXTURE_IDS, FIXTURE_IDS[:8], FIXTURE_IDS * 2]
    ref = runtime.synthesize_batch(batch, seed=7)
    with ServingPipeline(runtime) as pipe:
        audios = pipe.submit_batch(batch, seed=7).result(timeout=300)
    assert len(audios) == len(ref)
    for a, r in zip(audios, ref):
        np.testing.assert_array_equal(a, r)


def test_submit_batch_pipelines_multiple_batches(runtime):
    batch = [FIXTURE_IDS, FIXTURE_IDS[:6]]
    with ServingPipeline(runtime, max_inflight=3) as pipe:
        futs = [pipe.submit_batch(batch, seed=i) for i in range(5)]
        results = [f.result(timeout=300) for f in futs]
    # seeds differ -> batches differ; same seed reproduces
    assert not np.array_equal(results[0][0], results[1][0])
    with ServingPipeline(runtime) as pipe:
        again = pipe.submit_batch(batch, seed=0).result(timeout=300)
    np.testing.assert_array_equal(again[0], results[0][0])


def test_submit_batch_singleton_matches_fused(tiny_voice):
    """A 1-row batch on a fused-mode runtime must produce the SAME audio as
    synthesize_batch (which takes the fused path for b==1 — the keyed noise
    depends on the frame bucket, so fused vs split are different
    realizations). dispatch_batch delegates to dispatch_fused for this."""
    rt = PiperRuntime(*tiny_voice, RuntimeOptions(mode="fused"))
    ref = rt.synthesize_batch([FIXTURE_IDS], seed=21)
    with ServingPipeline(rt) as pipe:
        out = pipe.submit_batch([FIXTURE_IDS], seed=21).result(timeout=300)
    np.testing.assert_array_equal(out[0], ref[0])


def test_flow_precision_env_none(monkeypatch):
    """'none' is the documented 'inherit' spelling everywhere, including the
    env flags (a literal 'none' string would crash jax at first decode)."""
    monkeypatch.setenv("PIPER_TPU_FLOW_PRECISION", "none")
    assert RuntimeOptions.from_env().flow_precision is None
    monkeypatch.setenv("PIPER_TPU_VOCODER_PRECISION", "none")
    assert RuntimeOptions.from_env().vocoder_precision is None
    monkeypatch.setenv("PIPER_TPU_VOCODER_PRECISION", "high,none")
    assert RuntimeOptions.from_env().vocoder_precision == ("high", None)


def test_submit_batch_multispeaker(tmp_path_factory):
    from piper_tpu.models.vits.synthetic import make_synthetic_voice

    model, config = make_synthetic_voice(
        tmp_path_factory.mktemp("ms_voice"), quality="test", seed=2,
        n_speakers=4, gin_channels=16,
    )
    rt = PiperRuntime(model, config)
    batch = [FIXTURE_IDS, FIXTURE_IDS[:8]]
    sids = [1, 3]
    ref = rt.synthesize_batch(batch, speaker_ids=sids, seed=11)
    with ServingPipeline(rt) as pipe:
        audios = pipe.submit_batch(batch, speaker_ids=sids, seed=11).result(timeout=300)
    for a, r in zip(audios, ref):
        np.testing.assert_array_equal(a, r)


def test_submit_batch_error_propagates(runtime):
    with ServingPipeline(runtime) as pipe:
        fut = pipe.submit_batch([[999999], FIXTURE_IDS])
        with pytest.raises(ValueError):
            fut.result(timeout=60)
        audios = pipe.submit_batch([FIXTURE_IDS]).result(timeout=300)
    assert len(audios) == 1 and len(audios[0]) > 0


def test_pipeline_error_propagates(runtime):
    with ServingPipeline(runtime) as pipe:
        fut = pipe.submit([999999])  # out-of-range phoneme id
        with pytest.raises(ValueError):
            fut.result(timeout=60)
    # pipeline still usable after an error
    with ServingPipeline(runtime) as pipe:
        audio = pipe.submit(FIXTURE_IDS).result(timeout=300)
    assert len(audio) > 0


def test_submit_after_close_raises(runtime):
    pipe = ServingPipeline(runtime)
    pipe.close()
    with pytest.raises(RuntimeError):
        pipe.submit(FIXTURE_IDS)


def test_cancelled_future_does_not_kill_fetchers(runtime):
    """Review finding: set_result on a caller-cancelled future raised
    InvalidStateError and killed the fetcher thread; after num_fetchers
    cancellations every later submit hung. Cancel several, then verify the
    pipeline still serves."""
    from piper_tpu.engine.pipeline import ServingPipeline

    with ServingPipeline(runtime, num_fetchers=2) as pipe:
        for _ in range(4):  # more cancels than fetchers
            fut = pipe.submit(FIXTURE_IDS)
            fut.cancel()  # may or may not win the race; both must be safe
        outs = [pipe.submit(FIXTURE_IDS) for _ in range(3)]
        for f in outs:
            audio = f.result(timeout=300)
            assert len(audio) > 0


def test_cancelled_batch_future_keeps_worker(runtime):
    from piper_tpu.engine.pipeline import ServingPipeline

    with ServingPipeline(runtime) as pipe:
        f0 = pipe.submit_batch([FIXTURE_IDS, FIXTURE_IDS[:6]])
        f0.cancel()
        f1 = pipe.submit_batch([FIXTURE_IDS])
        audios = f1.result(timeout=300)
        assert len(audios) == 1 and len(audios[0]) > 0
