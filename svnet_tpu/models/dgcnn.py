"""Classic DGCNN (``--model original``).

Capability parity with reference models/dgcnn_cls.py:10-76 and
models/dgcnn_partseg.py:12-156 (Transform_Net included) — and fixes the
reference's dead wiring (`models.DGCNN_cls` not exported, SURVEY.md §2.10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl


def _conv_bn_lrelu(x, features, name, train, slope=0.2):
    x = svl.Linear(features, use_bias=False, name=name)(x)
    x = svl.BatchNorm(name=f"bn_{name}")(x, train)
    return nn.leaky_relu(x, negative_slope=slope)


class DGCNN_CLS(nn.Module):
    """ref dgcnn_cls.py:10-76."""

    num_classes: int = 40
    k: int = 20

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        x = ops.scalar_graph_feature(points, k=self.k)  # (B, N, k, 6)
        x = _conv_bn_lrelu(x, 64, "conv1", train)
        x1 = jnp.max(x, axis=2)

        x = ops.scalar_graph_feature(x1, k=self.k)
        x = _conv_bn_lrelu(x, 64, "conv2", train)
        x2 = jnp.max(x, axis=2)

        x = ops.scalar_graph_feature(x2, k=self.k)
        x = _conv_bn_lrelu(x, 128, "conv3", train)
        x3 = jnp.max(x, axis=2)

        x = ops.scalar_graph_feature(x3, k=self.k)
        x = _conv_bn_lrelu(x, 256, "conv4", train)
        x4 = jnp.max(x, axis=2)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        x = _conv_bn_lrelu(x, 1024, "conv5", train)

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)

        x = svl.Linear(512, use_bias=False, name="linear1")(x)
        x = svl.BatchNorm(name="bn6")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(256, name="linear2")(x)
        x = svl.BatchNorm(name="bn7")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(self.num_classes, name="linear3")(x)
        return x


class Transform_Net(nn.Module):
    """Input 3x3 transform net over edge features. ref dgcnn_partseg.py:12-57.

    (Also repairs the reference's missing ``torch.nn.init`` import, §2.10:
    the final transform layer is zero-kernel / identity-bias initialized.)
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, N, k, 6) edge features of raw coords
        B = x.shape[0]
        x = _conv_bn_lrelu(x, 64, "conv1", train)
        x = _conv_bn_lrelu(x, 128, "conv2", train)
        x = jnp.max(x, axis=2)  # over k -> (B, N, 128)
        x = _conv_bn_lrelu(x, 1024, "conv3", train)
        x = jnp.max(x, axis=1)  # (B, 1024)
        x = svl.Linear(512, use_bias=False, name="linear1")(x)
        x = svl.BatchNorm(name="bn3")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = svl.Linear(256, use_bias=False, name="linear2")(x)
        x = svl.BatchNorm(name="bn4")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        # zero kernel + identity bias (ref :38-39 intent)
        x = _TransformHead(name="transform")(x)
        return x.reshape(B, 3, 3)


class _TransformHead(nn.Module):
    """256 -> 9 linear, zero-kernel / identity-bias initialized."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.zeros, (x.shape[-1], 9))
        bias = self.param("bias", lambda *_: jnp.eye(3).reshape(9), (9,))
        return x @ kernel + bias


class DGCNN_PSEG(nn.Module):
    """ref dgcnn_partseg.py:59-156."""

    num_part: int = 50
    k: int = 40

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ) -> jax.Array:
        B, N = points.shape[0], points.shape[1]

        x0 = ops.scalar_graph_feature(points, k=self.k)
        t = Transform_Net(name="transform_net")(x0, train)
        x = jnp.einsum("bni,bij->bnj", points, t)

        x = ops.scalar_graph_feature(x, k=self.k)
        x = _conv_bn_lrelu(x, 64, "conv1", train)
        x = _conv_bn_lrelu(x, 64, "conv2", train)
        x1 = jnp.max(x, axis=2)

        x = ops.scalar_graph_feature(x1, k=self.k)
        x = _conv_bn_lrelu(x, 64, "conv3", train)
        x = _conv_bn_lrelu(x, 64, "conv4", train)
        x2 = jnp.max(x, axis=2)

        x = ops.scalar_graph_feature(x2, k=self.k)
        x = _conv_bn_lrelu(x, 64, "conv5", train)
        x3 = jnp.max(x, axis=2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, N, 192)
        x = _conv_bn_lrelu(x, 1024, "conv6", train)
        x = jnp.max(x, axis=1)  # (B, 1024)

        l = svl.Linear(64, use_bias=False, name="conv7")(label)
        l = svl.BatchNorm(name="bn7")(l, train)
        l = nn.leaky_relu(l, negative_slope=0.2)

        g = jnp.concatenate([x, l], axis=-1)[:, None, :]
        g = jnp.broadcast_to(g, (B, N, g.shape[-1]))
        x = jnp.concatenate([g, x1, x2, x3], axis=-1)  # (B, N, 1280)

        x = _conv_bn_lrelu(x, 256, "conv8", train)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = _conv_bn_lrelu(x, 256, "conv9", train)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = _conv_bn_lrelu(x, 128, "conv10", train)
        x = svl.Linear(self.num_part, use_bias=False, name="conv11")(x)
        return x
