"""Measure folded-layout MRF kernels against the production kernels on TPU.

Per-call device time via an in-jit fori_loop (the measurement discipline in
CLAUDE.md: the tunnel adds ~30 ms per fetch, so loop K kernel applications
inside ONE program and divide). The loop feeds the kernel's output back as
its input, so each iteration pays the full deployed cost — including the
folded variant's XLA fold/unfold transposes and in-jit weight folding.

Shapes: the two memory/utilization-bound vocoder levels at the bench's
B=32 / 768-frame decode bucket (docs/BENCH.md roofline table):
  up2: ch=64, n=4096    up3: ch=32, n=16384

Usage: python tools/folded_probe.py [--b 32] [--iters 20] [--reps 3]
Emits one JSON line per (shape, kernel, precision) with ms/call.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--shapes", default="32:16384,64:4096",
                    help="comma list of ch:n")
    ap.add_argument("--folds", default="2,4")
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from piper_tpu.ops.pallas.folded import pallas_resblock1_mrf_folded
    from piper_tpu.ops.pallas.resblock import (
        pallas_resblock1_branch,
        pallas_resblock1_mrf,
    )

    rng = np.random.default_rng(0)
    dils = (1, 3, 5)
    m = len(dils)

    def run_case(ch: int, n: int) -> None:
        x = jnp.asarray(
            rng.standard_normal((args.b, ch, n)).astype(np.float32) * 0.3)
        branches = []
        for k in (3, 7, 11):
            w1 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)
                  ).astype(np.float32)
            b1 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
            w2 = (rng.standard_normal((m, ch, ch, k)) / np.sqrt(ch * k)
                  ).astype(np.float32)
            b2 = (rng.standard_normal((m, ch)) * 0.02).astype(np.float32)
            branches.append((jnp.asarray(w1), jnp.asarray(b1),
                             jnp.asarray(w2), jnp.asarray(b2), k, dils))
        bounds = jnp.full((args.b,), n, jnp.int32)

        def timed(name: str, fn) -> None:
            @jax.jit
            def loop(x0):
                def body(_, y):
                    return fn(y)
                return jax.lax.fori_loop(0, args.iters, body, x0)

            try:
                out = loop(x)
                jax.device_get(out.ravel()[:1])  # compile + warm
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    out = loop(x)
                    jax.device_get(out.ravel()[:1])
                    ts.append((time.perf_counter() - t0 - 0.030) / args.iters)
                ms = float(np.median(ts)) * 1e3
                print(json.dumps({"ch": ch, "n": n, "b": args.b,
                                  "kernel": name, "ms_per_call": round(ms, 3),
                                  "precision": args.precision}), flush=True)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(json.dumps({"ch": ch, "n": n, "b": args.b,
                                  "kernel": name,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)

        timed("mrf", lambda y: pallas_resblock1_mrf(
            y, branches, bounds=bounds, precision=args.precision))

        def per_branch(y):
            ys = [pallas_resblock1_branch(
                y, w1, b1, w2, b2, kernel=k, dilations=d, bounds=bounds,
                precision=args.precision)
                for (w1, b1, w2, b2, k, d) in branches]
            return sum(ys) / len(ys)

        timed("per_branch", per_branch)

        for f in (int(v) for v in args.folds.split(",")):
            if f * ch > 512:
                continue
            timed(f"folded_f{f}", lambda y, f=f: pallas_resblock1_mrf_folded(
                y, branches, fold=f, bounds=bounds, tile=args.tile,
                precision=args.precision))

    for spec in args.shapes.split(","):
        ch, n = (int(v) for v in spec.split(":"))
        run_case(ch, n)


if __name__ == "__main__":
    main()
