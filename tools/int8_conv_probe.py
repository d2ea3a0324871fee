"""Probe int8 vs bf16 dilated-conv throughput at vocoder shapes.

The vocoder's hot ops are 1-D dilated convs (k=3/7/11) at channel widths
256..32 and long frame axes. If s8xs8->s32 convs hit the MXU at the GEMM
probe's ~1.5x-over-bf16 rate, a quantized vocoder tier is worth building.

Usage: python3 tools/int8_conv_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

SHAPES = [
    # (B, C_in, C_out, L, k, dilation)  — vocoder-like levels
    (32, 256, 256, 750, 7, 1),
    (32, 128, 128, 3000, 3, 1),
    (32, 128, 128, 3000, 3, 3),
    (32, 64, 64, 12000, 3, 1),
]


def timed_conv(B, Cin, Cout, L, k, dil, dtype, acc, iters=20) -> float:
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (B, Cin, L), -127, 127, jnp.int32).astype(jnp.int8)
        w = jax.random.randint(key, (Cout, Cin, k), -127, 127, jnp.int32).astype(jnp.int8)
    else:
        x = jax.random.normal(key, (B, Cin, L), dtype)
        w = jax.random.normal(key, (Cout, Cin, k), dtype)
    pad = (k - 1) * dil // 2

    def body(_, carry):
        xx, s = carry
        y = lax.conv_general_dilated(
            xx, w, (1,), ((pad, pad),), rhs_dilation=(dil,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=acc,
        )
        if dtype == jnp.int8:
            xx2 = (y >> 7).astype(jnp.int8)
        else:
            xx2 = y.astype(dtype)
        return xx2, s + y.astype(jnp.float32)[0, 0, 0]

    @jax.jit
    def run(x):
        _, s = lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return s

    float(jax.device_get(run(x)))
    t0 = time.perf_counter()
    float(jax.device_get(run(x)))
    dt = time.perf_counter() - t0
    flops = 2.0 * B * Cin * Cout * L * k * iters
    return flops / dt / 1e12


def main() -> None:
    print(f"devices: {jax.devices()}")
    for shape in SHAPES:
        row = f"B{shape[0]} C{shape[1]}->{shape[2]} L{shape[3]} k{shape[4]} d{shape[5]}"
        for name, dtype, acc in (
            ("int8", jnp.int8, jnp.int32),
            ("bf16", jnp.bfloat16, jnp.float32),
        ):
            try:
                tf = timed_conv(*shape, dtype, acc)
                print(f"{row:34s} {name}: {tf:6.2f} TF/s")
            except Exception as e:  # noqa: BLE001 - probe tool
                print(f"{row:34s} {name}: FAILED ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
