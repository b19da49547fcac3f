"""PointNet++ set-abstraction / feature-propagation modules, TPU-native.

Capability parity with reference models/utils/pointnet_util.py:166-320
(PointNetSetAbstraction{,Msg}, PointNetFeaturePropagation) — vestigial in
the reference but part of the inventory. Channels-last layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu.nn.sv_layers import Linear
from svnet_tpu.ops.sampling import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
    square_distance,
)


def _mlp_stack(x, widths, name, train):
    for i, w in enumerate(widths):
        x = Linear(w, use_bias=True, name=f"{name}_conv{i}")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name=f"{name}_bn{i}",
        )(x)
        x = nn.relu(x)
    return x


class PointNetSetAbstraction(nn.Module):
    """ref pointnet_util.py:166-207. Inputs/outputs channels-last:
    xyz (B, N, 3), points (B, N, D) -> (B, S, 3), (B, S, D')."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        if self.group_all:
            new_xyz, new_points = sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points
            )
        new_points = _mlp_stack(new_points, self.mlp, "mlp", train)
        return new_xyz, jnp.max(new_points, axis=2)


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale grouping variant. ref pointnet_util.py:210-267."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, C = xyz.shape
        S = self.npoint
        new_xyz = index_points(xyz, farthest_point_sample(xyz, S))
        outs = []
        for i, radius in enumerate(self.radius_list):
            K = self.nsample_list[i]
            idx = query_ball_point(radius, K, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            grouped = _mlp_stack(grouped, self.mlp_list[i], f"branch{i}", train)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """Inverse-distance-weighted 3-NN upsampling + MLP.

    ref pointnet_util.py:270-320.
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,     # (B, N, 3) dense positions
        xyz2: jax.Array,     # (B, S, 3) sparse positions
        points1: Optional[jax.Array],  # (B, N, D1)
        points2: jax.Array,  # (B, S, D2)
        train: bool = False,
    ) -> jax.Array:
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(
                points2, (B, N, points2.shape[-1])
            )
        else:
            dists = square_distance(xyz1, xyz2)  # (B, N, S)
            neg, idx = jax.lax.top_k(-dists, 3)
            d3 = -neg
            recip = 1.0 / (d3 + 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interpolated = jnp.sum(
                index_points(points2, idx) * weight[..., None], axis=2
            )
        if points1 is not None:
            x = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            x = interpolated
        return _mlp_stack(x, self.mlp, "mlp", train)
