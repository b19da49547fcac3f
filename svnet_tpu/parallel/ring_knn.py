"""Ring kNN: exact brute-force kNN with points sharded across a device mesh.

The multi-chip path for N >> 100k (SURVEY §5.7; docs/ring_knn_design.md):
shard the N point rows over a mesh axis; each device keeps its query shard
resident and the SOURCE shards rotate around the ring via
`jax.lax.ppermute`, with a running top-k merge per step — the blockwise/
ring-attention skeleton applied to top-k instead of softmax.

This is the XLA collectives implementation: it expresses the ring with
`shard_map` + `ppermute`, so it compiles and runs bit-for-bit on the
virtual CPU mesh (the correctness dryrun VERDICT r2 item 8 asked for) and
on real multi-chip slices, where XLA schedules the permute over ICI. The
Pallas double-buffered remote-DMA variant (overlapping compute with the
ring transfer, design note §ring) can replace the body kernel-for-kernel
without changing this module's contract.

Reference semantics: the kNN of models/utils/sv_util.py:19-25 (self
included, largest negative squared distance first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def ring_knn_body(xq: jax.Array, k: int, axis_name: str) -> jax.Array:
    """The ring top-k merge, callable INSIDE any shard_map body.

    xq: (B, Nl, C) — this device's resident query (and initial source)
    shard of the globally (B, N, C) array sharded on ``axis_name``.
    Returns (B, Nl, k) int32 GLOBAL neighbour indices for the local
    queries. Shared by ring_knn below and the end-to-end sharded
    inference forwards (parallel/sharded_infer.py), which embed the merge
    in their own mapped regions so a whole round runs in ONE shard_map.
    """
    B, Nl, _ = xq.shape
    Pn = jax.lax.axis_size(axis_name)
    p = jax.lax.axis_index(axis_name)
    src = xq
    offset = jnp.full((1,), p * Nl, jnp.int32)
    qq = jnp.sum(xq * xq, axis=-1, keepdims=True)  # (B, Nl, 1)
    best_v = jnp.full((B, Nl, k), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((B, Nl, k), jnp.int32)
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]
    for step in range(Pn):
        ss = jnp.sum(src * src, axis=-1)[:, None, :]  # (B, 1, Ns)
        inner = jnp.einsum("bqc,bsc->bqs", xq, src)
        neg = 2.0 * inner - qq - ss  # (B, Nl, Ns)
        v, i = jax.lax.top_k(neg, k)
        ci = jnp.concatenate([best_i, i + offset[0]], axis=-1)
        cv = jnp.concatenate([best_v, v], axis=-1)
        best_v, sel = jax.lax.top_k(cv, k)
        best_i = jnp.take_along_axis(ci, sel, axis=-1)
        if step < Pn - 1:
            src = jax.lax.ppermute(src, axis_name, perm)
            offset = jax.lax.ppermute(offset, axis_name, perm)
    return best_i


@functools.partial(jax.jit, static_argnames=("k", "axis_name", "mesh"))
def ring_knn(
    x: jax.Array, k: int, mesh: Mesh, axis_name: str = "data"
) -> jax.Array:
    """x: (B, N, C) -> (B, N, k) int32 global neighbour indices.

    N must divide the mesh axis size, with N/P >= k. The output rows for
    query i are the k nearest of ALL N points (self included); within a
    row, order follows descending -||.||^2 with arbitrary tie order across
    shard boundaries (neighbour SETS match the single-device ops.knn —
    ties beyond that are benign: every consumer pools symmetrically over
    k, SURVEY §7 hard part 2).
    """
    B, N, C = x.shape
    Pn = mesh.shape[axis_name]
    Nl = N // Pn
    assert Nl * Pn == N and Nl >= k, (N, Pn, k)

    return shard_map(
        lambda xq: ring_knn_body(xq, k, axis_name),
        mesh=mesh,
        in_specs=P(None, axis_name, None),
        out_specs=P(None, axis_name, None),
    )(x)
