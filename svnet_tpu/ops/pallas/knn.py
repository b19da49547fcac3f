"""Tiled Pallas kNN: pairwise distances + top-k without sort or (N, N) HBM.

Replaces the reference's knn (sv_util.py:19-25) hot spot the TPU way
(BASELINE.json names this op explicitly):

  * per (batch, point-tile) program: one MXU matmul produces a (T, N)
    negative-squared-distance tile in VMEM;
  * top-k via thresholded selection over an immutable key array (round
    3.1): exact mode uses order-preserving int32 keys (2 traversals per
    rank — was ~5 passes of argmax in round 1); fast mode packs the
    quantized distance with the column index so the max IS the winner
    (1 traversal per rank, no key writes);
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

import numpy as np

from svnet_tpu.ops.pallas.sv_round2 import (
    _BIG,
    _INT_MIN,
    _build_key,
    _idx_bits,
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
    if exact:
        from svnet_tpu import config  # lazy: avoids an import cycle

        if config.exact_selection == "pair":
            # (value, col) sorted-pair tournament along LANES: identical
            # exact semantics (min-col tie-break), _SEL_G ranks/traversal
            from svnet_tpu.ops.pallas.sv_round3 import (
                _SEL_G,
                _top_group_pair,
            )

            st = None
            for j0 in range(0, k, _SEL_G):
                tops = _top_group_pair(
                    key, cols, min(_SEL_G, k - j0), st, axis=1
                )
                st = tops[-1]
                for g, (_, r) in enumerate(tops):
                    out_ref[0, :, j0 + g] = r[:, 0]
            return
        # f32-bit keys can TIE, so the update-and-rescan loop stands:
        # min-col-id among the current max (torch.topk tie-break), INT_MIN
        # scatter at the winner, fresh max. Threshold/no-write schemes
        # measured no faster for exact on this chip (PERF.md r3.1).
        m = jnp.max(key, axis=1, keepdims=True)
        for j in range(k):
            amin = jnp.min(
                jnp.where(key == m, cols, _BIG), axis=1, keepdims=True
            )
            out_ref[0, :, j] = amin[:, 0]
            if j + 1 < k:
                key = jnp.where(cols == amin, _INT_MIN, key)
                m = jnp.max(key, axis=1, keepdims=True)
    else:
        # packed keys are unique (column id in the low bits): rank j+1 is
        # the max over keys strictly below rank j's value — the key array
        # stays immutable and the winner id falls out of the max (r3.1).
        ib = np.int32(1 << _idx_bits(N))
        st = None
        for j in range(k):
            if st is None:
                m = jnp.max(key, axis=1, keepdims=True)
            else:
                m = jnp.max(
                    jnp.where(key < st, key, _INT_MIN), axis=1, keepdims=True
                )
            st = m
            win = (ib - 1) - jnp.remainder(m, ib)  # floor-mod: keys < 0
            out_ref[0, :, j] = win[:, 0]


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
