"""Decompose a late vocoder level's time: conv_transpose vs MRF vs lrelu.

The round-3 roofline left up3 at 10.8 TF/s and ~21 GB/s — far below BOTH
measured ceilings once the fused-MRF traffic model is used, i.e. neither
roofline explains the level's 155 ms. This probe times the level's pieces
in isolation at production shapes (B=32, 768-frame decode bucket) to find
where the time actually goes: the XLA conv_transpose lowering (another
narrow-M GEMM), the fused-MRF kernel, or the elementwise passes.

Usage: PYTHONPATH=/root/repo python tools/level_probe.py [--level 3]
Emits one JSON line per piece with ms/call (in-jit fori_loop timing).

MEASUREMENT CAVEAT (found by tools/ct_probe.py): the "(+fold back)" pieces
include a reshape/sum/repeat reducer that keeps the fori_loop shape-stable;
XLA materializes it as real relayout traffic (~30 ms at up3 shapes between
a transposed producer and consumer), so those rows OVERSTATE the piece.
Read them only relative to each other; use ct_probe's isolated pieces for
absolute conv_transpose cost.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--frames", type=int, default=768)
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default="high")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from piper_tpu.models.vits.hifigan import LRELU_SLOPE
    from piper_tpu.ops.conv import conv_transpose1d
    from piper_tpu.ops.nn import leaky_relu
    from piper_tpu.ops.pallas.resblock import pallas_resblock1_mrf

    # medium-voice architecture at the bench decode bucket
    rates = [8, 8, 2, 2]
    kerns = [16, 16, 4, 4]
    ch0 = 512
    i = args.level
    t_in = args.frames
    for r in rates[:i]:
        t_in *= r
    c_in = ch0 // (2 ** i)
    c_out = c_in // 2
    u, k = rates[i], kerns[i]
    n_out = t_in * u

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.b, c_in, t_in)).astype(np.float32) * 0.3)
    wct = jnp.asarray((rng.standard_normal((c_in, c_out, k)) / np.sqrt(c_in * k)
                       ).astype(np.float32))
    bct = jnp.asarray((rng.standard_normal((c_out,)) * 0.02).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((args.b, c_out, n_out)).astype(np.float32) * 0.3)
    dils = (1, 3, 5)
    m = len(dils)
    branches = []
    for kk in (3, 7, 11):
        w1 = (rng.standard_normal((m, c_out, c_out, kk)) / np.sqrt(c_out * kk)
              ).astype(np.float32)
        b1 = (rng.standard_normal((m, c_out)) * 0.02).astype(np.float32)
        w2 = (rng.standard_normal((m, c_out, c_out, kk)) / np.sqrt(c_out * kk)
              ).astype(np.float32)
        b2 = (rng.standard_normal((m, c_out)) * 0.02).astype(np.float32)
        branches.append((jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
                         jnp.asarray(b2), kk, dils))
    bounds = jnp.full((args.b,), n_out, jnp.int32)

    meta = {"level": i, "b": args.b, "c_in": c_in, "c_out": c_out,
            "t_in": t_in, "n_out": n_out, "u": u, "k": k,
            "precision": args.precision}
    print(json.dumps({**meta, "what": "shapes"}), flush=True)

    def timed(name: str, fn, x0) -> None:
        @jax.jit
        def loop(v):
            def body(_, y):
                return fn(y)
            return jax.lax.fori_loop(0, args.iters, body, v)

        try:
            out = loop(x0)
            jax.device_get(out.ravel()[:1])
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = loop(x0)
                jax.device_get(out.ravel()[:1])
                ts.append((time.perf_counter() - t0 - 0.030) / args.iters)
            ms = float(np.median(ts)) * 1e3
            print(json.dumps({"piece": name, "ms_per_call": round(ms, 3),
                              "level": i}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"piece": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    with jax.default_matmul_precision(args.precision):
        # pieces that map (B, c_in, t_in) -> same shape need a re-projection
        # to loop; instead each piece loops on ITS natural input/output by
        # summing back into the input shape cheaply where shapes differ.
        timed("lrelu_only", lambda y: leaky_relu(y, LRELU_SLOPE), x)

        def ct_loop(y):
            o = conv_transpose1d(leaky_relu(y, LRELU_SLOPE), wct, bct,
                                 stride=u, padding=(k - u) // 2)
            # fold back to input shape so fori_loop shapes match: sum pairs
            return o.reshape(args.b, c_out, t_in, u).sum(-1).repeat(2, 1)

        timed("lrelu+conv_transpose(+fold back)", ct_loop, x)

        timed("mrf_fused", lambda y: pallas_resblock1_mrf(
            y, branches, bounds=bounds, precision=args.precision), z)

        def level_loop(y):
            o = conv_transpose1d(leaky_relu(y, LRELU_SLOPE), wct, bct,
                                 stride=u, padding=(k - u) // 2)
            o = pallas_resblock1_mrf(o, branches, bounds=bounds,
                                     precision=args.precision)
            return o.reshape(args.b, c_out, t_in, u).sum(-1).repeat(2, 1)

        timed("whole_level(+fold back)", level_loop, x)


if __name__ == "__main__":
    main()
