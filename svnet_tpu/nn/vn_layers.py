"""Vector-Neuron (VNN) layer library — baseline equivariant stack.

Capability parity with reference models/vn_layers.py (the VNN paper's layers,
kept for ``--model vn``), rebuilt channels-last for TPU.

Layout: vector features v: (B, N, [k,] 3, C) — the reference uses
(B, C, 3, N, [k]); all channel mixing is a dense op over the last axis, which
XLA maps straight onto the MXU without the reference's transpose dance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu.nn.sv_layers import torch_linear_init

EPS = 1e-6


class VNLinear(nn.Module):
    """Channel-mixing linear on the channel axis. ref vn_layers.py:16-26."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", torch_linear_init(x.shape[-1]), (x.shape[-1], self.features)
        )
        return x @ kernel


class VNLeakyReLU(nn.Module):
    """Direction-learned leaky ReLU: reflect the negative half-space.

    ref vn_layers.py:29-47. Learns a direction d per channel; where x·d < 0,
    the component of x along d is removed, blended with slope.
    """

    negative_slope: float = 0.2
    share_nonlinearity: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_out = 1 if self.share_nonlinearity else x.shape[-1]
        d = VNLinear(d_out, name="map_to_dir")(x)
        dot = jnp.sum(x * d, axis=-2, keepdims=True)
        d_sq = jnp.sum(d * d, axis=-2, keepdims=True)
        mask = (dot >= 0).astype(x.dtype)
        reflected = x - (dot / (d_sq + EPS)) * d
        return self.negative_slope * x + (1 - self.negative_slope) * (
            mask * x + (1 - mask) * reflected
        )


class VNBatchNorm(nn.Module):
    """BN on vector norms, directions untouched. ref vn_layers.py:111-131."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # floored before sqrt: inf gradient at underflowed-to-0 norms
        # (see sv_layers.VectorBN)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-2), 1e-12)) + EPS
        norm_bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(norm)
        return x / norm[..., None, :] * norm_bn[..., None, :]


class VNLinearLeakyReLU(nn.Module):
    """Fused linear + VNBatchNorm + direction leaky-ReLU.

    ref vn_layers.py:50-78. Note the reference applies the direction map to
    the *input* x but the ReLU geometry to the post-BN features p.
    """

    features: int
    negative_slope: float = 0.2
    share_nonlinearity: bool = False
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = VNLinear(self.features, name="map_to_feat")(x)
        if self.use_batchnorm:
            p = VNBatchNorm(name="batchnorm")(p, train)
        d_out = 1 if self.share_nonlinearity else self.features
        d = VNLinear(d_out, name="map_to_dir")(x)
        dot = jnp.sum(p * d, axis=-2, keepdims=True)
        d_sq = jnp.sum(d * d, axis=-2, keepdims=True)
        mask = (dot >= 0).astype(p.dtype)
        reflected = p - (dot / (d_sq + EPS)) * d
        return self.negative_slope * p + (1 - self.negative_slope) * (
            mask * p + (1 - mask) * reflected
        )


class VNLinearAndLeakyReLU(nn.Module):
    """Unfused linear -> (optional) VNBatchNorm -> direction leaky-ReLU.

    Counterpart of reference vn_layers.py:81-108 — whose constructor is
    broken by a wrong-class super() call (SURVEY.md §2.10); this is the
    working version of what it intends.
    """

    features: int
    negative_slope: float = 0.2
    share_nonlinearity: bool = False
    use_batchnorm: str = "norm"  # 'norm' | 'none'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = VNLinear(self.features, name="linear")(x)
        if self.use_batchnorm != "none":
            x = VNBatchNorm(name="batchnorm")(x, train)
        return VNLeakyReLU(
            negative_slope=self.negative_slope,
            share_nonlinearity=self.share_nonlinearity,
            name="leaky_relu",
        )(x)


class VNMaxPool(nn.Module):
    """Max-pool over an axis by learned-direction dot product.

    ref vn_layers.py:134-148 (pool over the trailing samples axis there; here
    ``axis`` indexes our (B, N, [k,] 3, C) layout, default the k axis = 2,
    or 1 to pool over points).
    """

    axis: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = VNLinear(x.shape[-1], name="map_to_dir")(x)
        dot = jnp.sum(x * d, axis=-2)  # (..., pool_axis, ..., C)
        idx = jnp.argmax(dot, axis=self.axis)  # drop pool axis
        idx = jnp.expand_dims(jnp.expand_dims(idx, self.axis), -2)
        idx = jnp.broadcast_to(
            idx, x.shape[: self.axis] + (1,) + x.shape[self.axis + 1 :]
        )
        return jnp.take_along_axis(x, idx, axis=self.axis).squeeze(self.axis)


def mean_pool(x: jax.Array, axis: int = 1, keepdims: bool = False) -> jax.Array:
    """ref vn_layers.py:151-152 (the default, --pooling mean)."""
    return jnp.mean(x, axis=axis, keepdims=keepdims)


class VNStdFeature(nn.Module):
    """Learn a 3x3 frame z0 from features; emit invariant x·z0 (plus z0).

    ref vn_layers.py:155-202. With ``normalize_frame``, the first two learned
    directions are Gram-Schmidt-orthonormalized and completed by cross
    product.

    Input (B, [N,] 3, C) -> (x_std (B, [N,] 3, C), z0 (B, [N,] 3, 3)); the
    output's -2 axis indexes the three frame directions (invariant), not
    vector components. z0[..., i, j]: i = vector component, j = direction.
    """

    negative_slope: float = 0.2
    share_nonlinearity: bool = False
    normalize_frame: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        C = x.shape[-1]
        z = VNLinearLeakyReLU(
            C // 2,
            negative_slope=self.negative_slope,
            share_nonlinearity=self.share_nonlinearity,
            name="vn1",
        )(x, train)
        z = VNLinearLeakyReLU(
            C // 4,
            negative_slope=self.negative_slope,
            share_nonlinearity=self.share_nonlinearity,
            name="vn2",
        )(z, train)
        n_dir = 2 if self.normalize_frame else 3
        z0 = VNLinear(n_dir, name="vn_lin")(z)  # (..., 3, n_dir)

        if self.normalize_frame:
            v1 = z0[..., 0]  # (..., 3)
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0[..., 1]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            z0 = jnp.stack([u1, u2, u3], axis=-1)  # (..., 3, 3)

        # x_std[..., j, c] = sum_i x[..., i, c] * z0[..., i, j]
        x_std = jnp.einsum("...ic,...ij->...jc", x, z0)
        return x_std, z0


class VN_STNkd(nn.Module):
    """VN spatial transformer used by VN-PointNet. ref vn_layers.py:204-235.

    Input (B, N, 3, d) -> global (B, 3, d) token. ``pooling`` in
    {'mean', 'max'} (reference default --pooling mean).
    """

    d: int = 21
    pooling: str = "mean"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = VNLinearLeakyReLU(64 // 3, negative_slope=0.0, name="conv1")(x, train)
        x = VNLinearLeakyReLU(128 // 3, negative_slope=0.0, name="conv2")(x, train)
        x = VNLinearLeakyReLU(1024 // 3, negative_slope=0.0, name="conv3")(x, train)
        if self.pooling == "max":
            x = VNMaxPool(axis=1, name="pool")(x)
        else:
            x = mean_pool(x, axis=1)
        x = VNLinearLeakyReLU(512 // 3, negative_slope=0.0, name="fc1")(x, train)
        x = VNLinearLeakyReLU(256 // 3, negative_slope=0.0, name="fc2")(x, train)
        x = VNLinear(self.d, name="fc3")(x)
        return x
