"""Tiled Pallas kNN: pairwise distances + top-k without sort or (N, N) HBM.

Replaces the reference's knn (sv_util.py:19-25) hot spot the TPU way
(BASELINE.json names this op explicitly):

  * per (batch, point-tile) program: one MXU matmul produces a (T, N)
    negative-squared-distance tile in VMEM;
  * top-k via k iterative masked-argmax passes on the VPU (k is 20/40 —
    far cheaper than XLA's full row sort, and the (N, N) matrix never
    touches HBM);
  * neighbour ordering is by descending -distance with first-occurrence
    tie-break — same neighbour *sets* as torch.topk (order cancels through
    the symmetric svpool, SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _knn_kernel(x_tile_ref, x_all_ref, out_ref, *, k: int, n: int):
    xt = x_tile_ref[0].astype(jnp.float32)  # (T, C)
    xa = x_all_ref[0].astype(jnp.float32)  # (N, C)

    inner = jax.lax.dot_general(
        xt,
        xa,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, N)
    tt = jnp.sum(xt * xt, axis=1, keepdims=True)  # (T, 1)
    aa = jnp.sum(xa * xa, axis=1, keepdims=True).reshape(1, -1)  # (1, N)
    neg = 2.0 * inner - tt - aa  # (T, N), larger = closer

    cols = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 1)
    for j in range(k):
        amax = jnp.argmax(neg, axis=1).astype(jnp.int32)  # (T,)
        out_ref[0, :, j] = amax
        neg = jnp.where(cols == amax[:, None], _NEG_INF, neg)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def knn_pallas(x: jax.Array, k: int, tile: int = 128, interpret: bool = False) -> jax.Array:
    """k nearest neighbours (self included). x: (B, N, C) -> (B, N, k) int32."""
    B, N, C = x.shape
    assert N % tile == 0, (N, tile)
    grid = (B, N // tile)

    return pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n=N),
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
