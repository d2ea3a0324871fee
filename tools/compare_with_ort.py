#!/usr/bin/env python3
"""Cross-validate piper-tpu against onnxruntime on a real voice checkpoint.

The BASELINE fidelity gate: max-abs waveform error <= 1e-3 vs the ORT CPU
reference with injected RNG tensors. This script:

  1. rewrites the checkpoint so its RandomNormalLike nodes become inputs
     (piper_tpu.onnx.rewrite.externalize_random),
  2. synthesizes with piper-tpu using recorded noise tensors,
  3. runs the rewritten graph under onnxruntime with the SAME noise,
  4. reports the max-abs error over the overlapping samples.

Requires the `onnxruntime` package and a real voice checkpoint — neither is
available in the offline development environment, so this tool is exercised
there only down to the graph rewrite (tests/test_rewrite.py); run it on a
networked machine for the full gate:

    python tools/compare_with_ort.py --model en_GB-....onnx [--ids "1,20,...""]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from piper_tpu.core.test_vector import FIXTURE_PHONEME_IDS as FIXTURE_IDS


def compare(model_path: str, config_path=None, ids=None, tolerance: float = 1e-3,
            seed: int = 0, ort=None) -> dict:
    """The full comparison pipeline, ORT injected so a rot-guard test can
    exercise every piper-tpu-side step (noise recording, graph rewrite,
    rewritten-model save, feed construction, error math) with a stub
    runner while the real package is uninstallable offline
    (tests/test_tool_rot.py). `ort` must expose
    InferenceSession(path, providers=...).run(None, feeds) — the
    onnxruntime module itself in production.

    Returns {"ours": samples, "theirs": samples, "err": max-abs,
    "ok": bool, "frames": n}."""
    if ort is None:
        import onnxruntime as ort  # noqa: F811 — the production runner

    from piper_tpu.engine.runtime import PiperRuntime
    from piper_tpu.onnx import load_model
    from piper_tpu.onnx.rewrite import externalize_random
    from piper_tpu.onnx.writer import save_model_ir

    ids = list(ids) if ids is not None else list(FIXTURE_IDS)
    rt = PiperRuntime(model_path, config_path)
    hp = rt.hparams

    rng = np.random.default_rng(seed)
    dp_noise = rng.standard_normal((1, 2, len(ids))).astype(np.float32)
    rt.synthesize(ids, dp_noise=dp_noise)  # probe for the frame bucket
    frames = int(rt.last_run_timings.frames)
    main_noise = rng.standard_normal((1, hp.inter_channels, frames)).astype(np.float32)
    ours = rt.synthesize(ids, dp_noise=dp_noise, main_noise=main_noise)

    # Rewrite the graph so ORT takes the same noise as inputs.
    model = load_model(model_path)
    rewritten, noise_inputs = externalize_random(model)
    if len(noise_inputs) != 2:
        raise SystemExit(
            f"expected exactly 2 RNG nodes (dp, main) in the export; found "
            f"{noise_inputs} — cannot feed recorded noise unambiguously"
        )
    rewritten_path = str(Path(model_path).with_suffix(".norng.onnx"))
    save_model_ir(rewritten_path, rewritten)

    sess = ort.InferenceSession(rewritten_path, providers=["CPUExecutionProvider"])
    feeds = {
        "input": np.asarray([ids], np.int64),
        "input_lengths": np.asarray([len(ids)], np.int64),
        "scales": np.asarray(
            [rt.config.inference.noise_scale, rt.config.inference.length_scale,
             rt.config.inference.noise_w], np.float32,
        ),
        # Piper's export orders the dp noise node before the main one.
        noise_inputs[0]: dp_noise,
    }
    # ORT computes its own frame count from the durations; fp32 rounding can
    # put it off-by-a-few vs ours, and the injected main noise must match its
    # internal shape exactly — retry with padded/sliced noise around ours.
    theirs = None
    last_err = None
    for delta in (0, 1, -1, 2, -2, 3, -3):
        nf = frames + delta
        if nf <= 0:
            continue
        mn = np.zeros((1, main_noise.shape[1], nf), np.float32)
        span = min(nf, main_noise.shape[-1])
        mn[:, :, :span] = main_noise[:, :, :span]
        try:
            theirs = sess.run(None, {**feeds, noise_inputs[1]: mn})[0]
            theirs = theirs.reshape(-1).astype(np.float32)
            if delta:
                print(f"note: ORT frame count differed by {delta:+d}")
            break
        except Exception as e:  # noqa: BLE001 — shape mismatch, try next
            last_err = e
    if theirs is None:
        raise SystemExit(f"ORT run failed for all frame counts near {frames}: {last_err}")

    n = min(len(ours), len(theirs))
    err = float(np.max(np.abs(ours[:n] - theirs[:n]))) if n else float("inf")
    ok = err <= tolerance and abs(len(ours) - len(theirs)) <= 256
    return {"ours": ours, "theirs": theirs, "err": err, "ok": ok,
            "frames": frames}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--ids", default=None, help="comma-separated phoneme ids")
    parser.add_argument("--tolerance", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    try:
        import onnxruntime as ort
    except ImportError:
        raise SystemExit("onnxruntime is required for this comparison")

    ids = [int(x) for x in args.ids.split(",")] if args.ids else None
    r = compare(args.model, args.config, ids=ids, tolerance=args.tolerance,
                seed=args.seed, ort=ort)
    print(
        f"piper-tpu {len(r['ours'])} samples, ORT {len(r['theirs'])} samples, "
        f"max-abs err {r['err']:.2e} (tolerance {args.tolerance}) -> "
        f"{'PASS' if r['ok'] else 'FAIL'}"
    )
    raise SystemExit(0 if r["ok"] else 1)


if __name__ == "__main__":
    main()
