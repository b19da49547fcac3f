"""Tiled Pallas kNN: pairwise distances + top-k without sort or (N, N) HBM.

Replaces the reference's knn (sv_util.py:19-25) hot spot the TPU way
(BASELINE.json names this op explicitly):

  * per (batch, point-tile) program: one MXU matmul produces a (T, N)
    negative-squared-distance tile in VMEM;
  * top-k via the sv_round2 fused extraction (round 2): exact mode uses
    order-preserving int32 keys (1 fused update+max pass + 1 min-where
    pass per rank — was ~5 passes of argmax in round 1); fast mode packs
    the quantized distance with the column index so the max IS the winner
    (1 fused pass per rank);
  * neighbour ordering is by descending -distance with lowest-index
    tie-break — same neighbour *sets* as torch.topk (order cancels through
    the symmetric svpool, SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu.ops.pallas.sv_round2 import (
    _build_key,
    _extract_rank,
    _neg_dist,
)


def _knn_kernel(x_tile_ref, x_all_ref, out_ref, *, k: int, N: int, mode: str):
    xt = x_tile_ref[0].astype(jnp.float32)  # (T, C)
    xa = x_all_ref[0].astype(jnp.float32)  # (N, C)
    exact = mode == "exact"
    T = xt.shape[0]

    neg = _neg_dist(xt, xa, N, exact)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    key = _build_key(neg, cols, N, mode)
    m = jnp.max(key, axis=1, keepdims=True)
    for j in range(k):
        mask, key, m = _extract_rank(key, m, cols, N, exact)
        # winner column from the one-hot mask in one reduce
        out_ref[0, :, j] = jnp.max(mask.astype(jnp.int32) * cols, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "mode", "interpret"))
def knn_pallas(
    x: jax.Array, k: int, tile: int = 128, mode: str = "exact",
    interpret: bool = False,
) -> jax.Array:
    """k nearest neighbours (self included). x: (B, N, C) -> (B, N, k) int32.

    ``mode``: 'exact' = f32-exact ordering (HIGHEST-precision distances,
    sortable-int keys); 'fast'/'approx' = quantized 18-bit ordering with
    single-pass extraction (see sv_round2).
    """
    B, N, C = x.shape
    assert N % tile == 0, (N, tile)
    grid = (B, N // tile)

    return pl.pallas_call(
        functools.partial(_knn_kernel, k=k, N=N, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, C),
                lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, C),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, k), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        interpret=interpret,
    )(x, x)
