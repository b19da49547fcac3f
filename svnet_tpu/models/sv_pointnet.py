"""SVNet-PointNet classification and part-segmentation models.

Capability parity with reference models/sv_pointnet_cls.py:12-81 and
models/sv_pointnet_partseg.py:12-97, rebuilt channels-last for TPU.
Single kNN graph (built once from coordinates via get_graph_feature_cross),
SV_STNkd global token, global-mean context concat.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl


class SVPointNetEncoder(nn.Module):
    """ref sv_pointnet_cls.py:12-58."""

    k: int = 20
    binary: bool = False

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        v = ops.get_graph_feature_cross(points, k=self.k)  # (B, N, k, 3, 3)
        s = svl.Vector2Scalar(3, name="init_scalar")(v, train)  # (B, N, k, 9)
        x = (s, v)
        x = svl.SVBlock(64 // 2, 64 // 6, name="conv_pos")(x, train)  # always FP
        x = ops.svpool(x)  # over k -> (B, N, ·)

        x = svl.SVBlock(64 // 2, 64 // 6, self.binary, name="conv1")(x, train)

        g = svl.SV_STNkd(64 // 2, 64 // 6, self.binary, name="fstn")(x, train)
        g = (
            jnp.broadcast_to(g[0][:, None], x[0].shape),
            jnp.broadcast_to(g[1][:, None], x[1].shape),
        )
        x = ops.svcat([x, g])

        x = svl.SVBlock(128 // 2, 128 // 6, self.binary, name="conv2")(x, train)
        x = svl.SVBlock(1024 // 2, 1024 // 6, self.binary, name="conv3")(x, train)

        x_mean = ops.svpool(x, axis=1, keepdims=True)
        x_mean = (
            jnp.broadcast_to(x_mean[0], x[0].shape),
            jnp.broadcast_to(x_mean[1], x[1].shape),
        )
        x = ops.svcat([x, x_mean])
        x = svl.SVBlock(1024 // 2, 1024 // 6, self.binary, name="conv_fuse")(x, train)

        x = ops.svpool(x, axis=1)  # (B, ·)
        x = svl.SVFuse(3, self.binary, name="svfuse")(x, train)  # (B, 1022)
        return x


class SV_PointNet_CLS(nn.Module):
    """ref sv_pointnet_cls.py:60-81."""

    num_classes: int = 40
    k: int = 20
    binary: bool = False

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        p_drop = 0.0 if self.binary else 0.4
        x = SVPointNetEncoder(self.k, self.binary, name="feat")(points, train)
        x = svl.Linear(
            512, use_bias=False, bw=self.binary, ba=self.binary, name="fc1"
        )(x, train)
        x = svl.BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = svl.Linear(
            256, use_bias=False, bw=self.binary, ba=self.binary, name="fc2"
        )(x, train)
        # ref order: relu(bn2(dropout(fc2(x))))
        x = nn.Dropout(rate=p_drop, deterministic=not train)(x)
        x = svl.BatchNorm(name="bn2")(x, train)
        x = nn.relu(x)
        x = svl.Linear(self.num_classes, use_bias=True, name="fc3")(x)
        return x


class SV_PointNet_PSEG(nn.Module):
    """ref sv_pointnet_partseg.py:12-97.

    Keeps the SVFuse frame (``trans_back``) and un-projects the skip-concat
    vector features through it before the per-point head; squeeze-and-excite
    style conv_fuse bottleneck on the fused per-point features; mean- instead
    of max-pool for the binary model's global feature (ref :80-83).
    """

    num_part: int = 50
    k: int = 40
    binary: bool = False

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ) -> jax.Array:
        B, N = points.shape[0], points.shape[1]

        v = ops.get_graph_feature_cross(points, k=self.k)
        s = svl.Vector2Scalar(3, name="init_scalar")(v, train)
        x = (s, v)
        x = svl.SVBlock(64 // 2, 64 // 6, name="conv_pos")(x, train)
        x = ops.svpool(x)

        out1 = svl.SVBlock(64 // 2, 64 // 6, self.binary, name="conv1")(x, train)
        out2 = svl.SVBlock(128 // 2, 128 // 6, self.binary, name="conv2")(out1, train)
        out3 = svl.SVBlock(128 // 2, 128 // 6, self.binary, name="conv3")(out2, train)

        g = svl.SV_STNkd(128 // 2, 128 // 6, self.binary, name="fstn")(out3, train)
        g = (
            jnp.broadcast_to(g[0][:, None], out3[0].shape),
            jnp.broadcast_to(g[1][:, None], out3[1].shape),
        )
        x_transformed = ops.svcat([out3, g])
        out4 = svl.SVBlock(512 // 2, 512 // 6, self.binary, name="conv4")(
            x_transformed, train
        )
        out5 = svl.SVBlock(2048 // 2, 2048 // 6, self.binary, name="conv5")(out4, train)

        x_mean = ops.svpool(out5, axis=1, keepdims=True, spool="mean")
        x_mean = (
            jnp.broadcast_to(x_mean[0], out5[0].shape),
            jnp.broadcast_to(x_mean[1], out5[1].shape),
        )
        x = ops.svcat([out5, x_mean])  # (B, N, [3,] 4096//(2,6))
        x, trans = svl.SVFuse(3, self.binary, trans_back=True, name="svfuse")(x, train)
        # x: (B, N, C=2048//2*2 + 2048//6*2*3), trans: (B, N, 3, 3)

        channels = x.shape[-1]
        x = _conv_bn_relu(
            x, channels // 8, self.binary, "conv_fuse1", train
        )
        x = _conv_bn_relu(x, channels, self.binary, "conv_fuse2", train)
        if self.binary:
            x = jnp.mean(x, axis=1)  # (B, C)
        else:
            x = jnp.max(x, axis=1)

        x_l = jnp.concatenate([x, label], axis=-1)  # (B, C+16)
        x_l = jnp.broadcast_to(x_l[:, None, :], (B, N, x_l.shape[-1]))

        concat = ops.svcat([out1, out2, out3, out4, out5])
        # un-project skip vectors through the learned frame:
        # ref sv_pointnet_partseg.py:89: einsum('bimj,bijk->bimk', v^T, trans)
        # with our layout v (B, N, 3, V): out[b,n,c,k] = sum_i v[b,n,i,c] t[b,n,i,k]
        concat_v = jnp.einsum("bnic,bnik->bnck", concat[1], trans).reshape(B, N, -1)
        per_point = jnp.concatenate([concat[0], concat_v], axis=-1)
        net = jnp.concatenate([x_l, per_point], axis=-1)

        net = _conv_bn_relu(net, 256, self.binary, "convs1", train)
        net = _conv_bn_relu(net, 256, self.binary, "convs2", train)
        net = _conv_bn_relu(net, 128, self.binary, "convs3", train)
        net = svl.Linear(self.num_part, use_bias=True, name="convs4")(net)
        return net  # (B, N, num_part)


def _conv_bn_relu(x, features, binary, name, train):
    """Binarizable pointwise conv + BN + ReLU (ref Conv1d+BN1d+ReLU stacks)."""
    x = svl.Linear(
        features, use_bias=False, bw=binary, ba=binary, name=f"{name}_conv"
    )(x, train)
    x = svl.BatchNorm(name=f"{name}_bn")(x, train)
    return nn.relu(x)
