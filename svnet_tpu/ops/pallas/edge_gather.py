"""Differentiable row gather for training — Pallas forward AND backward.

The training path gathers k neighbour rows per point (ref
dgcnn_util.py:24-49 / sv_util.py:90-116 do it with a flat-index gather).
XLA lowers both that gather and its scatter-add transpose to ~30 GB/s
loops on TPU (measured round 2, probe4: 175 us/cloud for one round's
gather — slower than the whole fused eval round). This op routes both
directions through the MXU instead:

  forward:  per (batch, point-tile) program, k one-hot int8 matmuls
            against byte planes of src reconstruct the gathered rows
            bit-exactly (same trick as sv_round2);
  backward: dsrc[n] = sum over edges (t, j) with idx[t, j] == n of
            g[t, j] — a transposed one-hot bf16 matmul per source tile
            (scatter-add as MXU work, ROADMAP r1 item 1's design). The
            cotangent rides two bf16 planes (hi + residual) with f32 MXU
            accumulation -> ~2^-16-relative (near-f32) gradients; 'xla'
            (config.edge_gather) remains the exact-f32 escape hatch.

Selection indices carry no gradient (piecewise-constant), matching
jax.lax.stop_gradient semantics of the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu.ops.pallas.sv_round2 import (
    _decode_exact,
    _plane_stride,
    pack_planes_exact,
)


def _fwd_kernel(idx_ref, planes_ref, out_ref, *, k: int, T: int, N: int, C: int):
    planes = planes_ref[0]  # (N, 4*stride) int8
    idxl = idx_ref[0]  # (T, k) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    for j in range(k):
        mask = (cols == idxl[:, j : j + 1]).astype(jnp.int8)  # (T, N)
        g = jax.lax.dot_general(
            mask, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[0, :, j, :] = _decode_exact(g, C)


def _bwd_kernel(idx_ref, g_ref, out_ref, *, T: int, CH: int):
    """dsrc tile (T, C) += contributions from one edge chunk.

    Grid (B, N//T, NK//CH); the output block is revisited across the chunk
    axis (constant index) and accumulated. oh[r, m] = (idx[r] == n0 + m)
    builds the transposed one-hot on the fly; chunking keeps the (CH, T)
    one-hot and the (CH, C) cotangent chunk inside the ~16 MB VMEM budget.
    """
    t = pl.program_id(1)
    c = pl.program_id(2)
    n0 = t * T

    @pl.when(c == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idxl = idx_ref[0]  # (1, CH) int32 chunk
    rows = jax.lax.broadcasted_iota(jnp.int32, (CH, T), 1) + n0
    oh = (idxl.reshape(CH, 1) == rows).astype(jnp.bfloat16)  # (CH, T)
    # two-plane bf16 split of the f32 cotangent (hi + residual): the one-hot
    # operand is exact in bf16 and the MXU accumulates in f32, so the only
    # error left is the residual's own bf16 rounding ~2^-16 relative —
    # near-f32 gradients at 2x the matmul cost (ADVICE r2)
    gf = g_ref[0]  # (CH, C) f32
    g_hi = gf.astype(jnp.bfloat16)
    g_lo = (gf - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        oh, g_hi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc += jax.lax.dot_general(
        oh, g_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] += acc  # (T, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def edge_gather(src: jax.Array, idx: jax.Array, interpret: bool = False):
    """Gather rows: (B, N, C) x (B, N, k) int32 -> (B, N, k, C), bit-exact.

    Equivalent to jnp.take_along_axis(src, idx.reshape(B, N*k, 1), 1)
    reshaped — but MXU-lowered in both directions (see module docstring).
    """
    return _edge_gather_fwd_impl(src, idx, interpret)


def _fwd_tile(N: int, k: int, C: int) -> int:
    """Target-tile height under the forward kernel's scoped-VMEM budget.

    Mosaic keeps all k unrolled (T, N) int8 one-hot masks live plus the
    double-buffered (T, k, C) f32 output block (calibrated on-chip: the
    model predicts the 17.7M scoped allocation observed at
    N=2048/k=40/C=136 within 3%), so T shrinks below 128 at partseg-scale
    k*C instead of tripping the 16M scoped-vmem limit at compile time.
    """
    T = min(128, N)
    planes = N * 4 * _plane_stride(C)
    while T > 8:
        scoped = planes + T * N * (k + 4) + 2 * T * k * C * 4
        if scoped <= 12 * 1024 * 1024:
            break
        T //= 2
    return T


def _edge_gather_fwd_impl(src, idx, interpret):
    B, N, C = src.shape
    k = idx.shape[-1]
    T = _fwd_tile(N, k, C)
    assert N % T == 0
    planes = pack_planes_exact(src)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, T=T, N=N, C=C),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, T, k), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, N, 4 * _plane_stride(C)),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, k, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, k, C), jnp.float32),
        interpret=interpret,
    )(idx, planes)


def _edge_gather_fwd(src, idx, interpret):
    # fwd takes the primal's full signature; only bwd gets nondiff_argnums
    # prepended
    return _edge_gather_fwd_impl(src, idx, interpret), (idx, src.shape)


def _edge_gather_bwd(interpret, res, g):
    idx, (B, N, C) = res
    k = idx.shape[-1]
    T = min(128, N)
    NK = N * k
    CH = NK
    # chunk the edge axis so (CH, T) one-hot + (CH, C) chunk fit VMEM
    while CH * (T * 2 + C * 6) > 6 * 1024 * 1024 and CH % 2 == 0:
        CH //= 2
    idx_flat = idx.reshape(B, 1, NK)
    g_flat = g.reshape(B, NK, C)
    dsrc = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, CH=CH),
        grid=(B, N // T, NK // CH),
        in_specs=[
            pl.BlockSpec((1, 1, CH), lambda b, t, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C), lambda b, t, c: (b, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, C), lambda b, t, c: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        interpret=interpret,
    )(idx_flat, g_flat)
    # integer idx takes a float0 cotangent
    return dsrc, np.zeros(idx.shape, dtype=jax.dtypes.float0)


# custom_vjp with nondiff_argnums passes them FIRST to fwd/bwd
edge_gather.defvjp(_edge_gather_fwd, _edge_gather_bwd)
