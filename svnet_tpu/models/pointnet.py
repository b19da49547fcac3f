"""Classic PointNet (``--model original``), with input + feature T-Nets.

Capability parity with reference models/pointnet_cls.py:9-99 and
models/pointnet_partseg.py:13-71 — and fixes the reference's dead CLI wiring
(SURVEY.md §2.10) so the original models actually run. Returns
(logits, trans_feat) for the T-Net orthogonality regularizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu.nn import sv_layers as svl


def _lin_bn_relu(x, features, name, train):
    x = svl.Linear(features, name=f"{name}")(x)
    x = svl.BatchNorm(name=f"bn_{name}")(x, train)
    return nn.relu(x)


class STNkd(nn.Module):
    """Spatial transformer -> (B, k, k), identity-initialized via additive eye.

    ref pointnet_cls.py:9-43. Input (B, N, k_feat).
    """

    k: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B = x.shape[0]
        x = _lin_bn_relu(x, 64, "conv1", train)
        x = _lin_bn_relu(x, 128, "conv2", train)
        x = _lin_bn_relu(x, 1024, "conv3", train)
        x = jnp.max(x, axis=1)  # (B, 1024)
        x = _lin_bn_relu(x, 512, "fc1", train)
        x = _lin_bn_relu(x, 256, "fc2", train)
        x = svl.Linear(self.k * self.k, name="fc3")(x)
        x = x + jnp.eye(self.k).reshape(-1)
        return x.reshape(B, self.k, self.k)


class PointNetEncoder(nn.Module):
    """ref pointnet_cls.py:46-80."""

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        trans = STNkd(3, name="stn")(points, train)
        x = jnp.einsum("bni,bij->bnj", points, trans)
        x = _lin_bn_relu(x, 64, "conv1", train)

        trans_feat = STNkd(64, name="fstn")(x, train)
        x = jnp.einsum("bni,bij->bnj", x, trans_feat)

        x = _lin_bn_relu(x, 128, "conv2", train)
        x = svl.Linear(1024, name="conv3")(x)
        x = svl.BatchNorm(name="bn_conv3")(x, train)
        x = jnp.max(x, axis=1)  # (B, 1024)
        return x, trans, trans_feat


class PointNet_CLS(nn.Module):
    """ref pointnet_cls.py:82-99. Returns (logits, trans_feat)."""

    num_classes: int = 40
    k: int = 20  # unused; kept for a uniform constructor across the zoo

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        x, _, trans_feat = PointNetEncoder(name="feat")(points, train)
        x = svl.Linear(512, name="fc1")(x)
        x = svl.BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = svl.Linear(256, name="fc2")(x)
        x = nn.Dropout(rate=0.4, deterministic=not train)(x)
        x = svl.BatchNorm(name="bn2")(x, train)
        x = nn.relu(x)
        x = svl.Linear(self.num_classes, name="fc3")(x)
        return x, trans_feat


class PointNet_PSEG(nn.Module):
    """ref pointnet_partseg.py:13-71. Returns (per-point logits, trans_feat)."""

    num_part: int = 50
    k: int = 40  # unused; uniform constructor

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ):
        B, N = points.shape[0], points.shape[1]
        trans = STNkd(3, name="stn")(points, train)
        x = jnp.einsum("bni,bij->bnj", points, trans)

        out1 = _lin_bn_relu(x, 64, "conv1", train)
        out2 = _lin_bn_relu(out1, 128, "conv2", train)
        out3 = _lin_bn_relu(out2, 128, "conv3", train)

        trans_feat = STNkd(128, name="fstn")(out3, train)
        net_transformed = jnp.einsum("bni,bij->bnj", out3, trans_feat)

        out4 = _lin_bn_relu(net_transformed, 512, "conv4", train)
        out5 = svl.Linear(2048, name="conv5")(out4)
        out5 = svl.BatchNorm(name="bn_conv5")(out5, train)
        out_max = jnp.max(out5, axis=1)  # (B, 2048)

        expand = jnp.concatenate([out_max, label], axis=-1)[:, None, :]
        expand = jnp.broadcast_to(expand, (B, N, expand.shape[-1]))
        concat = jnp.concatenate([expand, out1, out2, out3, out4, out5], axis=-1)

        net = _lin_bn_relu(concat, 256, "convs1", train)
        net = _lin_bn_relu(net, 256, "convs2", train)
        net = _lin_bn_relu(net, 128, "convs3", train)
        net = svl.Linear(self.num_part, name="convs4")(net)
        return net, trans_feat
