"""Probe int8 vs bf16 MXU throughput on the attached chip.

Measures square GEMMs (the proxy bench BENCH.md uses for the chip ceiling)
at int8xint8->int32, bf16xbf16->f32, and f32 HIGHEST, looping in-jit via
lax.fori_loop so the tunnel RTT (~30 ms) is amortised.  Decides whether an
opt-in quantized vocoder tier is worth building on this device.

Usage: python3 tools/int8_probe.py [--n 2048] [--iters 30]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def timed_gemm(n: int, iters: int, dtype, acc_dtype, precision=None) -> float:
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int32).astype(jnp.int8)
        b = jax.random.randint(key, (n, n), -127, 127, dtype=jnp.int32).astype(jnp.int8)
    else:
        a = jax.random.normal(key, (n, n), dtype=dtype)
        b = jax.random.normal(key, (n, n), dtype=dtype)

    def body(_, carry):
        x, s = carry
        y = lax.dot_general(
            x, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=acc_dtype,
        )
        # fold back to the input dtype so the loop is shape/dtype stable
        if dtype == jnp.int8:
            x2 = (y >> 8).astype(jnp.int8)
        else:
            x2 = y.astype(dtype)
        return x2, s + y.astype(jnp.float32)[0, 0]

    @jax.jit
    def run(a):
        out, s = lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return s

    # warm (compile)
    float(jax.device_get(run(a)))
    t0 = time.perf_counter()
    float(jax.device_get(run(a)))
    dt = time.perf_counter() - t0
    flops = 2.0 * n * n * n * iters
    return flops / dt / 1e12


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    print(f"devices: {jax.devices()}")
    for name, dtype, acc, prec in (
        ("int8->int32", jnp.int8, jnp.int32, None),
        ("bf16->f32", jnp.bfloat16, jnp.float32, None),
        ("f32 HIGHEST", jnp.float32, jnp.float32, lax.Precision.HIGHEST),
    ):
        try:
            tf = timed_gemm(args.n, args.iters, dtype, acc, prec)
            print(f"{name:12s} n={args.n} : {tf:6.2f} TF/s")
        except Exception as e:  # noqa: BLE001 - probe tool, report and continue
            print(f"{name:12s} n={args.n} : FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
