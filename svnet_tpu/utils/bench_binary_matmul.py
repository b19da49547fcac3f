"""Benchmark: int8-MXU vs bit-packed XNOR-popcount binary matmul.

Settles VERDICT r1 item 3 with data (PERF.md records the outcome). Shapes
default to the flagship model's biggest binary matmul (the head linear,
2044 -> 512, batched over B*N-ish rows).

Usage: python -m svnet_tpu.utils.bench_binary_matmul [M] [K] [N]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

ROUNDTRIP_MS = 26.0


def _timed(fn, x, w, iters=16):
    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x, w)
            return acc + jnp.sum(y) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return max((best * 1e3 - ROUNDTRIP_MS) / iters, 1e-9)


def main(M=4096, K=2048, N=512):
    from svnet_tpu.ops.pallas.binary_matmul import xnor_popcount_matmul

    key = jax.random.PRNGKey(0)
    x = jnp.sign(jax.random.normal(key, (M, K))) + 0.0  # zero-free ±1
    w = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (K, N))) + 0.0

    def int8_mm(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.int8), w.astype(jnp.int8),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    def bf16_mm(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    # correctness first
    ref = x @ w
    got = xnor_popcount_matmul(x, w, interpret=jax.default_backend() != "tpu")
    err = float(jnp.abs(got - ref).max())
    print(f"xnor kernel exactness vs dense: max|err| = {err}")

    gmac = M * K * N / 1e9
    for name, fn in (("int8-MXU", int8_mm), ("bf16-MXU", bf16_mm),
                     ("xnor-popcount (VPU)",
                      lambda x, w: xnor_popcount_matmul(x, w))):
        try:
            ms = _timed(fn, x, w)
            print(f"{name}: {ms:.3f} ms  ({gmac / ms:.1f} TMAC/s)")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
