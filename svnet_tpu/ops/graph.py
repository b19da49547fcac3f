"""Edge-feature construction and SV-pair pooling/concat.

TPU-native equivalents of the reference graph ops:
  * ``get_graph_feature``        <- models/utils/sv_util.py:28-62
  * ``get_graph_feature_cross``  <- models/utils/sv_util.py:64-88 (+vn_util.py:52-76)
  * ``get_graph_feature_sv``     <- models/utils/sv_util.py:90-116
  * ``vn_graph_feature``         <- models/utils/vn_util.py:23-49
  * ``svpool`` / ``svcat``       <- models/utils/sv_util.py:118-144

Layouts are channels-last throughout:
  scalars  s: (B, N, [k,] S)
  vectors  v: (B, N, [k,] 3, V)
  points   p: (B, N, 3)

The reference's channels-first (B, C, 3, N, k) tensors are permutations of
these; the channel *ordering* within the last axis matches the reference
(diff first, then center, then cross), which the .pth converter relies on.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from svnet_tpu.ops.knn import knn

SVPair = Tuple[jax.Array, jax.Array]


def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-point neighbours: x (B, N, ...), idx (B, N, k) -> (B, N, k, ...).

    Replaces the reference's flat-index trick (sv_util.py:41-51). On TPU
    (config.edge_gather) this routes through the custom-VJP Pallas op —
    one-hot MXU matmuls forward, transposed-matmul scatter-add backward —
    instead of XLA's ~30 GB/s gather/scatter loops; elsewhere a per-batch
    vmap'd gather.
    """
    from svnet_tpu import config

    impl = config.edge_gather
    if impl == "auto":
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and x.shape[1] % 128 == 0
            else "xla"
        )
    if impl == "pallas":
        from svnet_tpu.ops.pallas.edge_gather import edge_gather

        B, N = x.shape[:2]
        flat = x.reshape(B, N, -1)
        out = edge_gather(flat, idx)
        return out.reshape(x.shape[:2] + (idx.shape[-1],) + x.shape[2:])
    return jax.vmap(lambda pts, i: pts[i])(x, idx)


def get_graph_feature(
    points: jax.Array, k: int, idx: jax.Array | None = None,
    first: bool = False,
) -> jax.Array:
    """First-layer vector edge features from raw coordinates.

    ref: sv_util.py:28-62. ``first=False`` (the default, and the only path
    any reference model calls) emits [nbr - ctr, ctr]; ``first=True`` is
    the reference's layer-0 variant (branch at sv_util.py:55-58) emitting
    [nbr - ctr, mean_k(nbr - ctr)] — the centre channel is replaced by the
    edge-mean so layer 0 sees only translation-invariant quantities.

    Args:
      points: (B, N, 3).

    Returns:
      v: (B, N, k, 3, 2) with channels [neighbour - center, center] or,
      with ``first``, [neighbour - center, mean_k(neighbour - center)].
    """
    if idx is None:
        idx = knn(points, k)
    nbr = gather_neighbors(points, idx)  # (B, N, k, 3)
    ctr = jnp.broadcast_to(points[:, :, None, :], nbr.shape)
    diff = nbr - ctr
    if first:
        mean = jnp.broadcast_to(jnp.mean(diff, axis=2, keepdims=True), diff.shape)
        return jnp.stack([diff, mean], axis=-1)
    return jnp.stack([diff, ctr], axis=-1)


def get_graph_feature_cross(
    points: jax.Array, k: int, idx: jax.Array | None = None
) -> jax.Array:
    """First-layer vector edge features with a cross-product channel.

    ref: sv_util.py:64-88 / vn_util.py:52-76.

    Returns:
      v: (B, N, k, 3, 3) with channels [nbr - ctr, ctr, cross(nbr, ctr)].
    """
    if idx is None:
        idx = knn(points, k)
    nbr = gather_neighbors(points, idx)  # (B, N, k, 3)
    ctr = jnp.broadcast_to(points[:, :, None, :], nbr.shape)
    cross = jnp.cross(nbr, ctr)
    return jnp.stack([nbr - ctr, ctr, cross], axis=-1)


def vn_graph_feature(
    v: jax.Array, k: int, idx: jax.Array | None = None
) -> jax.Array:
    """Vector-neuron edge features over an existing vector field.

    ref: vn_util.py:23-49. kNN runs in the flattened 3*V feature space.

    Args:
      v: (B, N, 3, V).

    Returns:
      (B, N, k, 3, 2V) with channels [nbr - ctr (V), ctr (V)].
    """
    B, N = v.shape[0], v.shape[1]
    if idx is None:
        idx = knn(v.reshape(B, N, -1), k)
    nbr = gather_neighbors(v, idx)  # (B, N, k, 3, V)
    ctr = jnp.broadcast_to(v[:, :, None], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def scalar_graph_feature(
    x: jax.Array, k: int, idx: jax.Array | None = None
) -> jax.Array:
    """Classic DGCNN scalar edge features. ref models/utils/dgcnn_util.py:24-49.

    Args:
      x: (B, N, C) scalar point features (kNN over them if idx is None).

    Returns:
      (B, N, k, 2C) with channels [nbr - ctr, ctr].
    """
    if idx is None:
        idx = knn(x, k)
    nbr = gather_neighbors(x, idx)  # (B, N, k, C)
    ctr = jnp.broadcast_to(x[:, :, None], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def get_graph_feature_sv(
    x: SVPair, k: int, idx: jax.Array | None = None
) -> SVPair:
    """Edge features over an (s, v) pair; kNN in the joint [s, flat(v)] space.

    ref: sv_util.py:90-116.

    Args:
      x: (s, v) with s (B, N, S), v (B, N, 3, V).

    Returns:
      (s_feat, v_feat): s_feat (B, N, k, 2S) = [nbr - ctr, ctr],
                        v_feat (B, N, k, 3, 2V) = [nbr - ctr, ctr].
    """
    s, v = x
    B, N = s.shape[0], s.shape[1]
    S = s.shape[-1]
    V = v.shape[-1]
    joint = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
    if idx is None:
        idx = knn(joint, k)

    # one gather over the joint features instead of two
    nbr = gather_neighbors(joint, idx)  # (B, N, k, S + 3V)
    ctr = jnp.broadcast_to(joint[:, :, None], nbr.shape)

    s_feat = jnp.concatenate(
        [nbr[..., :S] - ctr[..., :S], ctr[..., :S]], axis=-1
    )
    v_nbr = nbr[..., S:].reshape(B, N, k, 3, V)
    v_ctr = ctr[..., S:].reshape(B, N, k, 3, V)
    v_feat = jnp.concatenate([v_nbr - v_ctr, v_ctr], axis=-1)
    return s_feat, v_feat


def svpool(
    x: SVPair, axis: int = 2, keepdims: bool = False, spool: str = "max"
) -> SVPair:
    """Pool an SV pair: max (or mean) over scalars, mean over vectors.

    Mean is the equivariant reduction for the vector stream (max is not).
    ref: sv_util.py:118-132. ``axis`` indexes the *scalar* tensor; the vector
    tensor shares leading axes (B, N, k), so the same axis applies as long as
    axis <= 2, which covers every reference call site (axis=1 or 2).
    """
    s, v = x
    if spool == "max":
        s = jnp.max(s, axis=axis, keepdims=keepdims)
    elif spool == "mean":
        s = jnp.mean(s, axis=axis, keepdims=keepdims)
    else:
        raise ValueError(f"unrecognized scalar pooling {spool!r}")
    v = jnp.mean(v, axis=axis, keepdims=keepdims)
    return s, v


def svcat(xlist: Sequence[SVPair]) -> SVPair:
    """Channel-concat SV pairs. ref: sv_util.py:134-144."""
    s = jnp.concatenate([x[0] for x in xlist], axis=-1)
    v = jnp.concatenate([x[1] for x in xlist], axis=-1)
    return s, v
