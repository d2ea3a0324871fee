"""Roofline / MFU report for the synthesis pipeline on the active device.

Measures the chip's actual ceilings (square-GEMM TF/s per precision tier,
streaming HBM GB/s), then times each pipeline stage in isolation — encoder,
flow decoder, whole vocoder, and every vocoder upsample level — and reports
achieved TF/s, GB/s, MFU vs the matching GEMM ceiling, and whether the
stage sits on the compute or memory roofline. This is the evidence for
kernel decisions (e.g. keep or replace XLA's conv_transpose lowering).

Usage:
    python3 tools/roofline.py                           # TPU, medium voice
    python3 tools/roofline.py --batch 32 --frames 768
    python3 tools/roofline.py --platform cpu --quality test --iters 3

Prints one JSON document (indented; pass --compact for one line).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="real voice checkpoint (.onnx)")
    ap.add_argument("--config")
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--vocoder-precision", default="high")
    ap.add_argument("--flow-precision", default="high")
    ap.add_argument("--mode", default="fused")
    ap.add_argument("--output-dtype", default="int16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--phonemes", type=int, default=128,
                    help="phoneme bucket for the encode stage")
    ap.add_argument("--frames", type=int, default=768,
                    help="frame bucket for the decode stages")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-levels", dest="levels", action="store_false",
                    default=True, help="skip per-vocoder-level programs")
    ap.add_argument("--platform", help="force jax platform (e.g. cpu)")
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        from piper_tpu.utils.env import apply_platform_override

        apply_platform_override()

    import bench as bench_mod
    from piper_tpu.utils.roofline import roofline_report

    rt = bench_mod.get_runtime(args)
    report = roofline_report(rt, args.batch, args.phonemes, args.frames,
                             iters=args.iters, per_level=args.levels)
    import jax

    report["platform"] = jax.devices()[0].platform
    report["quality"] = args.quality
    print(json.dumps(report) if args.compact else json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
