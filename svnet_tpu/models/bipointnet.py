"""BiPointNet models (third-party binarization baseline, ``--model bipointnet``).

Capability parity with reference models/bipointnet.py: BiSTN3d/BiSTNkd with
pool in {max, mean, ema-max} (EMA-max offsets {1024: -3.2041, 2048: -3.4025,
4096: -3.5836}), BiPointNetEncoder, classification and part-segmentation
heads. Exports are the LSR + EMA-max configs (ref bipointnet.py:386-396).
"""

from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu.nn import sv_layers as svl
from svnet_tpu.nn import bipointnet_layers as bil

OFFSET_MAP = {1024: -3.2041, 2048: -3.4025, 4096: -3.5836}


def ema_max_offset(n: int) -> float:
    """EMA-max offset for n points. Exact table values for the reference's
    supported sizes (ref bipointnet.py:42-46); piecewise-linear in log2(n)
    otherwise (the reference raises KeyError there)."""
    if n in OFFSET_MAP:
        return OFFSET_MAP[n]
    import math

    xs = [10.0, 11.0, 12.0]
    ys = [-3.2041, -3.4025, -3.5836]
    x = math.log2(n)
    if x <= xs[0]:
        lo, hi = 0, 1
    elif x >= xs[-1]:
        lo, hi = 1, 2
    else:
        lo, hi = (0, 1) if x < xs[1] else (1, 2)
    t = (x - xs[lo]) / (xs[hi] - xs[lo])
    return ys[lo] + t * (ys[hi] - ys[lo])


def _pool(x, pool: str, axis: int = 1):
    """Pool over points with the BiPointNet pooling family.

    For 'ema-max' the caller must add ema_max_offset(N) per ref semantics where
    applicable (BN'd features get the offset; see call sites).
    """
    if pool in ("max", "ema-max"):
        return jnp.max(x, axis=axis)
    if pool == "mean":
        return jnp.mean(x, axis=axis)
    raise ValueError(f"unknown pool {pool!r}")


class _ConvBNHt(nn.Module):
    """Binarizable pointwise linear + BN + hardtanh."""

    features: int
    linear_cls: Type[nn.Module]
    affine: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = self.linear_cls(self.features, name="lin")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=self.affine,
            use_scale=self.affine,
            name="bn",
        )(x)
        return jax.nn.hard_tanh(x)


class BiSTNkd(nn.Module):
    """Binary spatial transformer. ref bipointnet.py:59-149 (BiSTN3d is k=3).

    ``bi_first`` selects whether the first conv is binarized (default: FP,
    matching the exported configs).
    """

    k: int = 3
    linear_cls: Type[nn.Module] = bil.BiLinearLSR
    pool: str = "max"
    affine: bool = True
    bi_first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, N = x.shape[0], x.shape[1]
        # ref: BiSTN3d (k=3) keeps an FP first conv unless bi_first
        # (bipointnet.py:62-65); BiSTNkd (feature T-Net) binarizes it always
        # (bipointnet.py:111)
        if self.k == 3 and not self.bi_first:
            first_cls = _FPLinear
        else:
            first_cls = self.linear_cls
        x = _ConvBNHt(64, first_cls, self.affine, name="conv1")(x, train)
        x = _ConvBNHt(128, self.linear_cls, self.affine, name="conv2")(x, train)
        if self.pool == "ema-max":
            x = self.linear_cls(1024, name="conv3_lin")(x, train)
            x = svl.BatchNorm(name="conv3_bn")(x, train)
            x = jnp.max(x + ema_max_offset(N), axis=1)
        else:
            x = _ConvBNHt(1024, self.linear_cls, self.affine, name="conv3")(x, train)
            x = _pool(x, self.pool, axis=1)
        x = _ConvBNHt(512, self.linear_cls, self.affine, name="fc1")(x, train)
        x = _ConvBNHt(256, self.linear_cls, self.affine, name="fc2")(x, train)
        x = self.linear_cls(self.k * self.k, name="fc3")(x, train)
        x = x + jnp.eye(self.k).reshape(-1)
        return x.reshape(B, self.k, self.k)


class _FPLinear(nn.Module):
    """Full-precision linear with the (features, name)(x, train) calling
    convention of the Bi linears."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        return svl.Linear(self.features, name="lin")(x)


class BiPointNetEncoder(nn.Module):
    """ref bipointnet.py:152-227 (global_feat=True, feature_transform=True)."""

    linear_cls: Type[nn.Module] = bil.BiLinearLSR
    pool: str = "ema-max"
    affine: bool = True
    tnet: bool = True
    bi_first: bool = False

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        B, N = points.shape[0], points.shape[1]
        if self.tnet:
            trans = BiSTNkd(
                3, self.linear_cls, self.pool, self.affine, self.bi_first,
                name="stn",
            )(points, train)
            x = jnp.einsum("bni,bij->bnj", points, trans)
        else:
            trans = None
            x = points

        first_cls = self.linear_cls if self.bi_first else _FPLinear
        x = _ConvBNHt(64, first_cls, self.affine, name="conv1")(x, train)

        trans_feat = None
        if self.tnet:
            trans_feat = BiSTNkd(
                64, self.linear_cls, self.pool, self.affine, self.bi_first,
                name="fstn",
            )(x, train)
            x = jnp.einsum("bni,bij->bnj", x, trans_feat)

        x = _ConvBNHt(128, self.linear_cls, self.affine, name="conv2")(x, train)
        x = self.linear_cls(1024, name="conv3_lin")(x, train)
        x = svl.BatchNorm(name="conv3_bn")(x, train)

        if self.pool == "ema-max":
            x = jnp.max(x, axis=1) + ema_max_offset(N)
        else:
            x = _pool(x, self.pool, axis=1)
        return x, trans, trans_feat


class BiPointNet_CLS(nn.Module):
    """ref bipointnet.py:230-254 (BasicBiPointNet); default config is the
    exported BiPointNetLSREMax (LSR linears, ema-max pool). Returns
    (logits, trans_feat)."""

    num_classes: int = 40
    k: int = 20  # unused; uniform constructor
    linear: str = "BiLinearLSR"
    pool: str = "ema-max"
    affine: bool = True

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        linear_cls = bil.BI_LINEARS[self.linear]
        x, _, trans_feat = BiPointNetEncoder(
            linear_cls, self.pool, self.affine, name="feat"
        )(points, train)
        x = _ConvBNHt(512, linear_cls, self.affine, name="fc1")(x, train)
        x = _ConvBNHt(256, linear_cls, self.affine, name="fc2")(x, train)
        x = svl.Linear(self.num_classes, name="fc3")(x)
        return x, trans_feat


class BiPointNet_PSEG(nn.Module):
    """ref bipointnet.py:256-328 (BasicBiPointNetPartSeg); default is the
    exported BiPointNetPartSegLSREMax. Returns (per-point logits, trans_feat)."""

    num_part: int = 50
    k: int = 40  # unused; uniform constructor
    linear: str = "BiLinearLSR"
    pool: str = "ema-max"
    affine: bool = True

    @nn.compact
    def __call__(self, points: jax.Array, label: jax.Array, train: bool = False):
        linear_cls = bil.BI_LINEARS[self.linear]
        B, N = points.shape[0], points.shape[1]

        trans = BiSTNkd(3, linear_cls, self.pool, self.affine, name="stn")(
            points, train
        )
        x = jnp.einsum("bni,bij->bnj", points, trans)

        out1 = _ConvBNHt(64, _FPLinear, self.affine, name="conv1")(x, train)
        out2 = _ConvBNHt(128, linear_cls, self.affine, name="conv2")(out1, train)
        out3 = _ConvBNHt(128, linear_cls, self.affine, name="conv3")(out2, train)

        trans_feat = BiSTNkd(128, linear_cls, self.pool, self.affine, name="fstn")(
            out3, train
        )
        net_transformed = jnp.einsum("bni,bij->bnj", out3, trans_feat)

        out4 = _ConvBNHt(512, linear_cls, self.affine, name="conv4")(
            net_transformed, train
        )
        out5 = linear_cls(2048, name="conv5_lin")(out4, train)
        out5 = svl.BatchNorm(name="conv5_bn")(out5, train)

        if self.pool == "ema-max":
            out_pool = jnp.max(out5, axis=1) + ema_max_offset(N)
        else:
            out_pool = _pool(out5, self.pool, axis=1)

        expand = jnp.concatenate([out_pool, label], axis=-1)[:, None, :]
        expand = jnp.broadcast_to(expand, (B, N, expand.shape[-1]))
        concat = jnp.concatenate([expand, out1, out2, out3, out4, out5], axis=-1)

        net = _ConvBNHt(256, linear_cls, self.affine, name="convs1")(concat, train)
        net = _ConvBNHt(256, linear_cls, self.affine, name="convs2")(net, train)
        net = _ConvBNHt(128, linear_cls, self.affine, name="convs3")(net, train)
        net = svl.Linear(self.num_part, name="convs4")(net)
        return net, trans_feat


class BiPointNet_SEMSEG(nn.Module):
    """Semantic segmentation head over the (non-global) encoder.

    ref bipointnet.py:331-383 (BasicBiPointNetSemSeg). Channels-last:
    points (B, N, 3[+6 features]) -> per-point (B, N, num_classes) logits.
    """

    num_classes: int = 13
    linear: str = "BiLinearLSR"
    pool: str = "ema-max"
    affine: bool = True

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        linear_cls = bil.BI_LINEARS[self.linear]
        B, N = points.shape[0], points.shape[1]
        xyz = points[..., :3]

        trans = BiSTNkd(3, linear_cls, self.pool, self.affine, name="stn")(
            xyz, train
        )
        x = jnp.einsum("bni,bij->bnj", xyz, trans)
        if points.shape[-1] > 3:
            x = jnp.concatenate([x, points[..., 3:]], axis=-1)
        x = _ConvBNHt(64, _FPLinear, self.affine, name="conv1")(x, train)

        trans_feat = BiSTNkd(
            64, linear_cls, self.pool, self.affine, name="fstn"
        )(x, train)
        x = jnp.einsum("bni,bij->bnj", x, trans_feat)
        pointfeat = x

        x = _ConvBNHt(128, linear_cls, self.affine, name="conv2")(x, train)
        x = linear_cls(1024, name="conv3_lin")(x, train)
        x = svl.BatchNorm(name="conv3_bn")(x, train)
        if self.pool == "ema-max":
            g = jnp.max(x, axis=1) + ema_max_offset(N)
        else:
            g = _pool(x, self.pool, axis=1)
        g = jnp.broadcast_to(g[:, None, :], (B, N, g.shape[-1]))
        x = jnp.concatenate([g, pointfeat], axis=-1)  # (B, N, 1088)

        x = _ConvBNHt(512, linear_cls, self.affine, name="convs1")(x, train)
        x = _ConvBNHt(256, linear_cls, self.affine, name="convs2")(x, train)
        x = _ConvBNHt(128, linear_cls, self.affine, name="convs3")(x, train)
        x = svl.Linear(self.num_classes, name="convs4")(x)
        return x, trans_feat


def BiPointNetLSREMax(num_classes: int = 40, **kw) -> BiPointNet_CLS:
    """ref bipointnet.py:386-388."""
    return BiPointNet_CLS(num_classes=num_classes, linear="BiLinearLSR", pool="ema-max", **kw)


def BiPointNetPartSegLSREMax(num_part: int = 50, **kw) -> BiPointNet_PSEG:
    """ref bipointnet.py:390-392."""
    return BiPointNet_PSEG(num_part=num_part, linear="BiLinearLSR", pool="ema-max", **kw)
