"""PointNet++ sampling/grouping ops, TPU-native.

Capability parity with reference models/utils/pointnet_util.py:19-149
(square_distance, index_points, farthest_point_sample, query_ball_point,
sample_and_group{,_all}) — vestigial in the reference (unused by any main,
SURVEY.md §2.1) but part of the component inventory; rebuilt with static
shapes and `lax` control flow so everything jits to one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svnet_tpu.ops.knn import pairwise_neg_sqdist


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(B, N, C) x (B, M, C) -> (B, N, M) squared distances.

    ref pointnet_util.py:19-34 (same matmul formulation).
    """
    return -pairwise_neg_sqdist(src, dst)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows: points (B, N, C), idx (B, ...) -> (B, ..., C).

    ref pointnet_util.py:37-52.
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


def farthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest point sampling. (B, N, 3) -> (B, npoint) int32.

    ref pointnet_util.py:55-75. Deterministic: starts from point 0 (the
    reference starts from a random point; pass ``start`` for that).
    """
    B, N, _ = xyz.shape

    def step(carry, _):
        dists, last_idx = carry
        last_pt = jnp.take_along_axis(
            xyz, last_idx[:, None, None], axis=1
        )  # (B, 1, 3)
        d = jnp.sum((xyz - last_pt) ** 2, axis=-1)  # (B, N)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)  # (B,)
        return (dists, nxt), nxt

    init = (jnp.full((B, N), jnp.inf, xyz.dtype), jnp.zeros((B,), jnp.int32))
    (_, _), rest = jax.lax.scan(step, init, None, length=npoint - 1)
    first = jnp.zeros((B, 1), jnp.int32)
    return jnp.concatenate([first, rest.T], axis=1)


def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Indices of up to nsample points within radius of each query center.

    ref pointnet_util.py:78-96: points beyond the radius are replaced by the
    first in-radius point (static shape (B, S, nsample)).
    """
    B, S, _ = new_xyz.shape
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    inside = sqrdists <= radius**2
    # sort by (outside, index): in-radius points first, by index
    N = xyz.shape[1]
    order_key = jnp.where(inside, 0, N) + jax.lax.broadcasted_iota(
        jnp.int32, sqrdists.shape, 2
    )
    idx_sorted = jnp.argsort(order_key, axis=-1)[..., :nsample].astype(jnp.int32)
    first = idx_sorted[..., :1]
    keys = jnp.take_along_axis(order_key, idx_sorted, axis=-1)
    return jnp.where(keys < N, idx_sorted, first)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: jax.Array | None,
    return_fps: bool = False,
):
    """FPS + ball query + relative grouping. ref pointnet_util.py:99-131."""
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # (B, S, nsample, 3)
    grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    if return_fps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz: jax.Array, points: jax.Array | None):
    """Single global group. ref pointnet_util.py:134-149."""
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points[:, None, :, :]], axis=-1
        )
    else:
        new_points = grouped_xyz
    return new_xyz, new_points
