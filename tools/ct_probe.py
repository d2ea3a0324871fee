"""Where does the late-level conv_transpose's time go on this chip?

level_probe measured lrelu+conv_transpose at ~43 ms for up3 (51 GFLOP,
~2.4 GB min traffic — both ceilings say ~10 ms). The polyphase lowering is
conv (M=stride*c_out rows) + an interleaving minor-axis transpose; this
probe times each piece and the alternatives:

  poly_conv    the polyphase conv alone, output left in phase-major
               (folded) layout — no interleave
  interleave   the (B, r, c, q) -> (B, c, q*r) minor-axis transpose alone
  full_ct      production conv_transpose1d (conv + interleave)
  native_ct    XLA's input-dilated lowering (lax.conv_general_dilated with
               lhs_dilation; 2x FLOPs, no transpose)
  mosaic_interleave  a Pallas kernel doing the interleave via in-VMEM
               stack+reshape (does Mosaic lower a lane interleave at all,
               and at what rate?)

Usage: PYTHONPATH=/root/repo python tools/ct_probe.py [--level 3]
"""

from __future__ import annotations

import argparse
import functools
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from piper_tpu.models.vits.hifigan import LRELU_SLOPE
    from piper_tpu.ops.conv import conv_transpose1d
    from piper_tpu.ops.nn import leaky_relu

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

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.b, c_in, t_in)).astype(np.float32) * 0.3)
    wct = jnp.asarray((rng.standard_normal((c_in, c_out, k)) / np.sqrt(c_in * k)
                       ).astype(np.float32))
    bct = jnp.asarray((rng.standard_normal((c_out,)) * 0.02).astype(np.float32))
    print(json.dumps({"level": i, "c_in": c_in, "c_out": c_out, "t_in": t_in,
                      "u": u, "k": k, "what": "shapes"}), flush=True)

    def timed(name, fn, x0):
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
            print(json.dumps({"piece": name,
                              "ms_per_call": round(float(np.median(ts)) * 1e3, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"piece": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    kr = -(-k // u)
    wpad = jnp.pad(wct, ((0, 0), (0, 0), (0, kr * u - k)))
    wp = wpad.reshape(c_in, c_out, kr, u)
    wp = jnp.flip(wp, axis=2).transpose(3, 1, 0, 2).reshape(u * c_out, c_in, kr)

    with jax.default_matmul_precision(args.precision):

        def poly_conv(y):
            y = leaky_relu(y, LRELU_SLOPE)
            o = lax.conv_general_dilated(
                y, wp, window_strides=(1,), padding=[(kr - 1, kr - 1)],
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=y.dtype)
            # keep folded; reduce back to input shape for the loop
            return o[:, :c_in, :t_in]

        timed("poly_conv_folded_out", poly_conv, x)

        y4 = jnp.asarray(rng.standard_normal(
            (args.b, u, c_out, t_in + kr - 1)).astype(np.float32))

        def interleave(y):
            b, r, c, q = y.shape
            o = y.transpose(0, 2, 3, 1).reshape(b, c, q * r)
            # inverse interleave (same relayout cost, mirrored) keeps the
            # loop shape-stable; the reported ms is for the PAIR — one
            # interleave is ~half.
            return o.reshape(b, c, q, r).transpose(0, 3, 1, 2)

        timed("interleave_pair(2x)", interleave, y4)

        def full_ct(y):
            o = conv_transpose1d(leaky_relu(y, LRELU_SLOPE), wct, bct,
                                 stride=u, padding=(k - u) // 2)
            return o.reshape(args.b, c_out, t_in, u).sum(-1).repeat(2, 1)

        timed("full_ct(+fold back)", full_ct, x)

        wnat = jnp.flip(wct, axis=-1).transpose(1, 0, 2)  # (c_out, c_in, k)
        pad_t = k - 1 - (k - u) // 2

        def native_ct(y):
            y = leaky_relu(y, LRELU_SLOPE)
            o = lax.conv_general_dilated(
                y, wnat, window_strides=(1,), padding=[(pad_t, pad_t)],
                lhs_dilation=(u,), dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=y.dtype)
            return o[:, :, : t_in * u].reshape(
                args.b, c_out, t_in, u).sum(-1).repeat(2, 1)

        timed("native_ct_lhs_dilated(+fold back)", native_ct, x)

    # Mosaic interleave: (r, c, q) tiles -> (c, q*r) via stack+reshape.
    def _int_kernel(y_ref, o_ref, *, c, w, r):
        parts = [y_ref[ri] for ri in range(r)]
        o_ref[:] = jnp.stack(parts, axis=-1).reshape(c, w * r)

    def mosaic_interleave(y):
        b, r, c, q = y.shape
        tile = 2048
        qp = -(-q // tile) * tile
        yp = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, qp - q)))
        out = pl.pallas_call(
            functools.partial(_int_kernel, c=c, w=tile, r=r),
            grid=(b, qp // tile),
            in_specs=[pl.BlockSpec((None, r, c, tile),
                                   lambda i, t: (i, 0, 0, t),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, c, tile * r),
                                   lambda i, t: (i, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, qp * r), y.dtype),
        )(yp)
        return out[:, :, : q * r].reshape(b, r, c, q)

    timed("mosaic_interleave", mosaic_interleave, y4)


if __name__ == "__main__":
    main()
