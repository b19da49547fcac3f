"""Bit-packed XNOR-popcount binary matmul — built to settle a design question.

The reference's binarized eval path is a pure ±1 x ±1 matmul
(ref models/sv_layers.py:38-49), the classic XNOR-popcount target on CPUs/
GPUs. On TPU there are two candidate lowerings:

  A. int8 MXU: cast ±1 (or 0) operands to int8 and run the systolic array
     at 2x the bf16 rate with exact int32 accumulation
     (svnet_tpu/nn/sv_layers.py::_binary_matmul_eval, config.binary_matmul).
  B. bit-packing: pack 32 signs per int32 lane, XNOR + popcount on the VPU,
     and reduce — this file.

Why A wins on TPU (measured numbers in PERF.md):
  * the MXU runs int8 at ~394 Tops/s on v5e; the VPU peaks around ~5 T
    elementops/s. Packing shrinks the contraction 32x but turns the matmul
    into VPU work: per (row, out-col) pair the packed dot costs ~3 VPU ops
    (xor, popcount, accumulate) per packed lane, i.e. ~3*M*N*K/32 VPU ops
    vs M*N*K MXU MACs — an effective ~50 Tops/s ceiling, ~8x below int8 MXU,
    before popcount's actual lowering cost.
  * sign(0) = 0 (torch.sign semantics, SURVEY §7 hard part 1) is
    representable in int8 but NOT in 1-bit packing; a packed kernel needs a
    separate zero-mask pass, adding passes to the VPU path.

This kernel exists so the claim is measured, not asserted
(VERDICT r1 item 3): `python -m svnet_tpu.utils.bench_binary_matmul`
benchmarks A vs B on the current backend; tests/test_binary_matmul.py checks
B's exactness against the dense ±1 matmul (zero-free inputs) in interpret
mode. Production paths use A.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_signs(x: jax.Array) -> jax.Array:
    """(M, K) ±1 f32/int -> (M, K//32) int32, bit b = 1 iff x[:, 32j+b] > 0.

    K must be a multiple of 32. Zeros pack as -1 (the caller must guarantee
    zero-free inputs for exactness — see module docstring).
    """
    M, K = x.shape
    assert K % 32 == 0, K
    bits = (x > 0).astype(jnp.uint32).reshape(M, K // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1).astype(jnp.int32)


def _xnor_kernel(xpT_ref, wpT_ref, out_ref, *, K: int):
    """out[m, n] = K - 2 * popcount(xp[m] ^ wp[n]).

    xpT: (K/32, TM) packed rows transposed; wpT: (K/32, N) packed columns.
    Loop over packed lanes j, broadcasting (TM, 1) ^ (1, N) into one
    (TM, N) popcount accumulator — VMEM stays O(TM*N), not O(TM*K*N/32)
    (the column-unrolled variant stack-OOM'd on-chip at 62 MB scoped).
    """
    TM = out_ref.shape[0]
    N = out_ref.shape[1]
    L = xpT_ref.shape[0]  # K / 32 packed lanes

    def body(j, acc):
        xcol = xpT_ref[j, :].reshape(TM, 1)
        wrow = wpT_ref[j, :].reshape(1, N)
        return acc + jax.lax.population_count(xcol ^ wrow)

    acc = jax.lax.fori_loop(0, L, body, jnp.zeros((TM, N), jnp.int32))
    out_ref[:] = jnp.float32(K) - 2.0 * acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def xnor_popcount_matmul(
    x: jax.Array, w: jax.Array, interpret: bool = False
) -> jax.Array:
    """±1 matmul via bit-packed XNOR-popcount. x: (M, K), w: (K, N) -> (M, N).

    Exact for zero-free ±1 operands. Benchmark-only — see module docstring.
    """
    M, K = x.shape
    N = w.shape[1]
    xpT = pack_signs(x).T  # (K/32, M): lane j is a contiguous sublane row
    wpT = pack_signs(w.T).T  # (K/32, N)
    TM = min(M, 256)
    while M % TM:  # largest divisor of M up to 256, so any M works
        TM -= 1
    return pl.pallas_call(
        functools.partial(_xnor_kernel, K=K),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((K // 32, TM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 32, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(xpT, wpT)
