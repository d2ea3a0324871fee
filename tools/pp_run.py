#!/usr/bin/env python3
"""Run a pipeline-parallel (pp) decode without writing code.

Makes `ShardedVits.synthesize_pipelined` (parallel/pp.py — GPipe stage
pipeline over the pp mesh axis) reachable as a tool: load a voice (real
checkpoint or synthetic preset), build a dp x pp mesh, synthesize a batch
through the stage pipeline, optionally write the WAV rows and/or check
exactness against the single-device whole-graph decode.

When to use pp at all: see docs/CAPACITY.md "Scaling axes" — for VITS at
Piper sizes the measured/reasoned answer is "don't" (dp dominates
throughput, tp dominates latency; pp's stage ppermutes + bubbles buy
nothing for a 65 MB model that fits one chip many times over). The path
exists, exactness-tested, for two reasons: parity with SURVEY §2.9's
parallelism obligations, and as the working template for decoders big
enough to need stage sharding.

Examples:
    # 4 virtual CPU devices, dp=2 x pp=2, synthetic medium voice:
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python tools/pp_run.py --platform cpu --pp 2 --check

    # a real checkpoint over 8 devices, pp=4:
    python tools/pp_run.py --model v.onnx --pp 4 --out out.wav
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(
        description="pipeline-parallel VITS decode (GPipe over the pp axis)")
    p.add_argument("--model", default=None,
                   help="voice checkpoint (.onnx with sibling .onnx.json); "
                        "omit for a synthetic --quality voice")
    p.add_argument("--config", default=None)
    p.add_argument("--quality", default="medium",
                   help="synthetic preset when --model is omitted")
    p.add_argument("--pp", type=int, default=2, help="pipeline stages")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel width (default: devices // pp)")
    p.add_argument("--batch", type=int, default=0,
                   help="rows (default: one per dp group)")
    p.add_argument("--ids", default=None, help="comma-separated phoneme ids")
    p.add_argument("--max-frames", type=int, default=256)
    p.add_argument("--microbatches", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu for virtual devices)")
    p.add_argument("--out", default=None, help="write row 0 as WAV here")
    p.add_argument("--check", action="store_true",
                   help="also decode on one device and report max-abs err")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from piper_tpu.parallel.mesh import make_mesh
    from piper_tpu.parallel.serving import ShardedVits

    n_dev = len(jax.devices())
    if n_dev % args.pp:
        raise SystemExit(
            f"{n_dev} devices not divisible by pp={args.pp} "
            f"(virtual devices: XLA_FLAGS=--xla_force_host_platform_"
            f"device_count=N with --platform cpu)")
    dp = args.dp or n_dev // args.pp
    mesh = make_mesh(dp * args.pp, pipeline_parallel=args.pp)

    if args.model:
        from piper_tpu.core.config import VoiceConfig
        from piper_tpu.models.vits.hparams import derive_hparams
        from piper_tpu.models.vits.params import host_arrays_from_graph
        from piper_tpu.onnx import load_model

        cfg_path = args.config or f"{args.model}.json"
        cfg = VoiceConfig.load(cfg_path)
        m = load_model(args.model)
        hp = derive_hparams(m.graph, sample_rate=cfg.audio.sample_rate,
                            n_speakers=cfg.num_speakers)
        host = host_arrays_from_graph(m.graph)
        sample_rate = cfg.audio.sample_rate
    else:
        from piper_tpu.models.vits.hparams import PRESETS
        from piper_tpu.models.vits.synthetic import synthetic_params

        hp = PRESETS[args.quality]
        host = synthetic_params(hp, seed=0)
        sample_rate = hp.sample_rate

    from piper_tpu.models.vits.params import params_from_arrays

    params = params_from_arrays(host)
    sharded = ShardedVits.create(mesh, params, hp)

    if args.ids:
        ids_row = [int(x) for x in args.ids.split(",")]
    else:
        ids_row = [i % hp.n_vocab for i in FIXTURE_PHONEME_IDS]
    b = args.batch or dp
    if b % dp:
        raise SystemExit(f"--batch {b} not divisible by dp={dp}")
    ids = np.asarray([ids_row] * b, np.int32)
    lengths = np.full((b,), len(ids_row), np.int32)

    t0 = time.perf_counter()
    audio, y_len = sharded.synthesize_pipelined(
        ids, lengths, max_frames=args.max_frames, seed=args.seed,
        microbatches=args.microbatches)
    wall = time.perf_counter() - t0
    n = int(y_len[0]) * hp.hop_length
    print(f"pp={args.pp} dp={dp} b={b}: {audio.shape} "
          f"({n} samples/row, {n / sample_rate:.2f}s) in {wall:.2f}s "
          f"(includes compile)")

    if args.check:
        single = make_mesh(1, devices=jax.devices()[:1])
        ref_model = ShardedVits.create(single, params, hp)
        ref, ref_len = ref_model.synthesize_batch(
            ids, lengths, max_frames=args.max_frames, seed=args.seed)
        err = float(np.max(np.abs(audio[:, :n] - ref[:, :n])))
        print(f"max-abs err vs single-device decode: {err:.2e} "
              f"({'OK' if err < 1e-4 else 'MISMATCH'})")
        if err >= 1e-4:
            raise SystemExit(1)

    if args.out:
        from piper_tpu.utils.wav import write_wav

        write_wav(args.out, audio[0, :n], sample_rate)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
