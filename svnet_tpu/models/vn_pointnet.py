"""Vector-Neuron PointNet models (``--model vn``).

Capability parity with reference models/vn_pointnet_cls.py:11-77 and
models/vn_pointnet_partseg.py:14-85, rebuilt channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl
from svnet_tpu.nn import vn_layers as vnl


class VNPointNetEncoder(nn.Module):
    """ref vn_pointnet_cls.py:11-57."""

    k: int = 20
    pooling: str = "mean"

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        B, N = points.shape[0], points.shape[1]
        v0 = points[..., None]  # (B, N, 3, 1)

        feat = ops.get_graph_feature_cross(points, k=self.k)  # (B, N, k, 3, 3)
        x = vnl.VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv_pos")(
            feat, train
        )
        if self.pooling == "max":
            x = vnl.VNMaxPool(axis=2, name="pool")(x)
        else:
            x = vnl.mean_pool(x, axis=2)  # (B, N, 3, 21)

        x = vnl.VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(x, train)

        g = vnl.VN_STNkd(64 // 3, self.pooling, name="fstn")(x, train)  # (B, 3, 21)
        g = jnp.broadcast_to(g[:, None], x.shape)
        x = jnp.concatenate([x, g], axis=-1)

        x = vnl.VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv2")(x, train)
        x = vnl.VNLinear(1024 // 3, name="conv3")(x)
        x = vnl.VNBatchNorm(name="bn3")(x, train)

        x_mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=-1)
        x, _ = vnl.VNStdFeature(negative_slope=0.0, name="std_feature")(x, train)
        x = x.reshape(B, N, -1)
        return jnp.max(x, axis=1)  # (B, 1024//3*6)


class VN_PointNet_CLS(nn.Module):
    """ref vn_pointnet_cls.py:59-77."""

    num_classes: int = 40
    k: int = 20
    pooling: str = "mean"

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        x = VNPointNetEncoder(self.k, self.pooling, name="feat")(points, train)
        x = svl.Linear(512, name="fc1")(x)
        x = svl.BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = svl.Linear(256, name="fc2")(x)
        x = nn.Dropout(rate=0.4, deterministic=not train)(x)
        x = svl.BatchNorm(name="bn2")(x, train)
        x = nn.relu(x)
        x = svl.Linear(self.num_classes, name="fc3")(x)
        return x


class VN_PointNet_PSEG(nn.Module):
    """ref vn_pointnet_partseg.py:14-85."""

    num_part: int = 50
    k: int = 40
    pooling: str = "mean"

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ) -> jax.Array:
        B, N = points.shape[0], points.shape[1]

        feat = ops.get_graph_feature_cross(points, k=self.k)
        x = vnl.VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv_pos")(
            feat, train
        )
        if self.pooling == "max":
            x = vnl.VNMaxPool(axis=2, name="pool")(x)
        else:
            x = vnl.mean_pool(x, axis=2)

        out1 = vnl.VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(x, train)
        out2 = vnl.VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv2")(out1, train)
        out3 = vnl.VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv3")(out2, train)

        g = vnl.VN_STNkd(128 // 3, self.pooling, name="fstn")(out3, train)
        g = jnp.broadcast_to(g[:, None], out3.shape)
        net_transformed = jnp.concatenate([out3, g], axis=-1)

        out4 = vnl.VNLinearLeakyReLU(512 // 3, negative_slope=0.0, name="conv4")(
            net_transformed, train
        )
        out5 = vnl.VNLinear(2048 // 3, name="conv5")(out4)
        out5 = vnl.VNBatchNorm(name="bn5")(out5, train)

        out5_mean = jnp.broadcast_to(jnp.mean(out5, axis=1, keepdims=True), out5.shape)
        out5_cat = jnp.concatenate([out5, out5_mean], axis=-1)
        out5_std, trans = vnl.VNStdFeature(negative_slope=0.0, name="std_feature")(
            out5_cat, train
        )
        out5_std = out5_std.reshape(B, N, -1)

        out_max = jnp.max(out5_std, axis=1)  # (B, 2048//3*6)
        expand = jnp.concatenate([out_max, label], axis=-1)[:, None, :]
        expand = jnp.broadcast_to(expand, (B, N, expand.shape[-1]))

        out1234 = jnp.concatenate([out1, out2, out3, out4], axis=-1)
        out1234 = jnp.einsum("bnic,bnij->bnjc", out1234, trans).reshape(B, N, -1)

        concat = jnp.concatenate([expand, out1234, out5_std], axis=-1)

        net = svl.Linear(256, name="convs1")(concat)
        net = svl.BatchNorm(name="bns1")(net, train)
        net = nn.relu(net)
        net = svl.Linear(256, name="convs2")(net)
        net = svl.BatchNorm(name="bns2")(net, train)
        net = nn.relu(net)
        net = svl.Linear(128, name="convs3")(net)
        net = svl.BatchNorm(name="bns3")(net, train)
        net = nn.relu(net)
        net = svl.Linear(self.num_part, name="convs4")(net)
        return net
