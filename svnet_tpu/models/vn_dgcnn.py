"""Vector-Neuron DGCNN models (``--model vn``).

Capability parity with reference models/vn_dgcnn_cls.py:12-84 and
models/vn_dgcnn_partseg.py:12-104, rebuilt channels-last.

The invariant read-out flattens VNStdFeature's (3, C) as channel-major (C, 3)
in the reference; we keep our natural (3, C) flatten and note it for the
checkpoint converter (a fixed permutation on the following linear's input).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl
from svnet_tpu.nn import vn_layers as vnl


class VN_DGCNN_CLS(nn.Module):
    """ref vn_dgcnn_cls.py:12-84."""

    num_classes: int = 40
    k: int = 20
    pooling: str = "mean"

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        B, N = points.shape[0], points.shape[1]
        v0 = points[..., None]  # (B, N, 3, 1)

        x = ops.vn_graph_feature(v0, k=self.k)  # (B, N, k, 3, 2)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv1")(x, train)
        x1 = self._pool(x, "pool1")

        x = ops.vn_graph_feature(x1, k=self.k)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv2")(x, train)
        x2 = self._pool(x, "pool2")

        x = ops.vn_graph_feature(x2, k=self.k)
        x = vnl.VNLinearLeakyReLU(128 // 3, name="conv3")(x, train)
        x3 = self._pool(x, "pool3")

        x = ops.vn_graph_feature(x3, k=self.k)
        x = vnl.VNLinearLeakyReLU(256 // 3, name="conv4")(x, train)
        x4 = self._pool(x, "pool4")

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 3, ·)
        x = vnl.VNLinearLeakyReLU(
            1024 // 3, share_nonlinearity=True, name="conv5"
        )(x, train)

        x_mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=-1)
        x, _ = vnl.VNStdFeature(name="std_feature")(x, train)  # (B, N, 3, 2·1024//3)
        x = x.reshape(B, N, -1)  # invariant (B, N, 1024//3*6)

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)

        x = svl.Linear(512, name="linear1")(x)
        x = svl.BatchNorm(name="bn1")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(256, name="linear2")(x)
        x = svl.BatchNorm(name="bn2")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(self.num_classes, name="linear3")(x)
        return x

    def _pool(self, x, name):
        if self.pooling == "max":
            return vnl.VNMaxPool(axis=2, name=name)(x)
        return vnl.mean_pool(x, axis=2)


class VN_DGCNN_PSEG(nn.Module):
    """ref vn_dgcnn_partseg.py:12-104."""

    num_part: int = 50
    k: int = 40
    pooling: str = "mean"

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ) -> jax.Array:
        B, N = points.shape[0], points.shape[1]
        v0 = points[..., None]

        x = ops.vn_graph_feature(v0, k=self.k)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv1")(x, train)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv2")(x, train)
        x1 = self._pool(x, "pool1")

        x = ops.vn_graph_feature(x1, k=self.k)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv3")(x, train)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv4")(x, train)
        x2 = self._pool(x, "pool2")

        x = ops.vn_graph_feature(x2, k=self.k)
        x = vnl.VNLinearLeakyReLU(64 // 3, name="conv5")(x, train)
        x3 = self._pool(x, "pool3")

        x123 = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, N, 3, 63)

        x = vnl.VNLinearLeakyReLU(
            1024 // 3, share_nonlinearity=True, name="conv6"
        )(x123, train)
        x_mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=-1)
        x, z0 = vnl.VNStdFeature(name="std_feature")(x, train)
        # project skip features through the frame (ref :85)
        x123 = jnp.einsum("bnic,bnij->bnjc", x123, z0).reshape(B, N, -1)
        x = x.reshape(B, N, -1)
        x = jnp.max(x, axis=1)  # (B, 1024//3*6)

        l = svl.Linear(64, use_bias=False, name="conv7")(label)
        l = svl.BatchNorm(name="bn7")(l, train)
        l = nn.leaky_relu(l, negative_slope=0.2)

        g = jnp.concatenate([x, l], axis=-1)[:, None, :]
        g = jnp.broadcast_to(g, (B, N, g.shape[-1]))
        x = jnp.concatenate([g, x123], axis=-1)

        x = svl.Linear(256, use_bias=False, name="conv8")(x)
        x = svl.BatchNorm(name="bn8")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(256, use_bias=False, name="conv9")(x)
        x = svl.BatchNorm(name="bn9")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = svl.Linear(128, use_bias=False, name="conv10")(x)
        x = svl.BatchNorm(name="bn10")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = svl.Linear(self.num_part, use_bias=False, name="conv11")(x)
        return x

    def _pool(self, x, name):
        if self.pooling == "max":
            return vnl.VNMaxPool(axis=2, name=name)(x)
        return vnl.mean_pool(x, axis=2)
