"""SVNet-DGCNN classification and part-segmentation models (the flagship).

Capability parity with reference models/sv_dgcnn_cls.py:22-82 and
models/sv_dgcnn_partseg.py:40-128, rebuilt channels-last for TPU.

Inputs are channels-last: points (B, N, 3); partseg additionally takes a
(B, 16) one-hot category label. (The reference mains permute to (B, 3, N)
before the model; our CLI keeps the loader's natural (B, N, 3).)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu import config, ops
from svnet_tpu.nn import sv_layers as svl


def _knob_state(binary: bool, k: int):
    """Trace-time resolution of config.train_knobs for the flax paths.

    Returns None when knob simulation is off (the default: every existing
    call site compiles the exact same graph as before), else
    (reuse, round_k, q8) with the inference engines' semantics — see
    config.set_train_knobs and train/fused.py::_train_knobs."""
    if not (config.train_knobs and binary):
        return None
    reuse = config.graph_reuse
    rk = config.reuse_k
    q8 = config.approx_gather_bits == 8

    def round_k(name: str) -> int:
        is_reuse = reuse == "spatial" or (reuse == "conv2" and name != "conv2")
        return rk if (is_reuse and 0 < rk < k) else k

    return reuse, round_k, q8


def _knob_graph(x, k, idx0, wins, name, knobs):
    """One DGCNN round's edge features under serving-knob simulation.

    Applies graph reuse ('spatial': the first round's xyz winners; 'conv2':
    conv2's own feature-space winners cached for conv3/conv4), reuse_k rank
    slicing (winner ids are rank-major, rank 0 = nearest), and the 8-bit
    gather fake-quantization (STE; kNN selection itself runs on the exact
    features, as the engines' selection path is certified separately).
    Returns (edge SVPair, wins')."""
    reuse, round_k, q8 = knobs
    s, v = x
    B, N = s.shape[0], s.shape[1]
    if reuse == "spatial":
        cached = idx0
    elif reuse == "conv2" and name != "conv2":
        cached = wins
    else:
        cached = None
    if cached is not None:
        idx = cached[:, :, : round_k(name)]
    else:
        joint = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
        idx = ops.knn(joint, k)
        if reuse == "conv2" and name == "conv2":
            wins = idx
    if q8:
        s = svl.ste_quant8(s)
        v = svl.ste_quant8(v)
    return ops.get_graph_feature_sv((s, v), k=idx.shape[-1], idx=idx), wins


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel widths to a multiple of 8 (ref sv_dgcnn_partseg.py:18-37)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_V = make_divisible


class SV_DGCNN_CLS(nn.Module):
    """SVNet-DGCNN classifier. ref sv_dgcnn_cls.py:22-82.

    4 dynamic-graph rounds (kNN in joint SV feature space -> SVBlock ->
    pool over k), skip-concat, embed to (512, 170), SVFuse invariant
    read-out, global max+avg pool, binarizable MLP head. The first SVBlock
    and the final classifier layer are always full-precision (ref :30,:44).
    """

    num_classes: int = 40
    k: int = 20
    binary: bool = False
    dropout: float = 0.5  # head dropout for the FP model (ref :45,:49)

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False) -> jax.Array:
        B = points.shape[0]
        p_drop = 0.0 if self.binary else self.dropout
        knobs = _knob_state(self.binary, self.k)  # None unless --train-knobs

        idx0 = ops.knn(points, self.k) if knobs is not None else None
        v = ops.get_graph_feature(points, k=self.k, idx=idx0)  # (B,N,k,3,2)
        s = svl.Vector2Scalar(3, name="init_scalar")(v, train)  # (B, N, k, 6)
        x = (s, v)
        x = svl.SVBlock(64 // 2, 64 // 6, name="conv1")(x, train)  # always FP
        x1 = ops.svpool(x)

        wins = None
        if knobs is None:
            x = ops.get_graph_feature_sv(x1, k=self.k)
        else:
            x, wins = _knob_graph(x1, self.k, idx0, wins, "conv2", knobs)
        x = svl.SVBlock(64 // 2, 64 // 6, self.binary, name="conv2")(x, train)
        x2 = ops.svpool(x)

        if knobs is None:
            x = ops.get_graph_feature_sv(x2, k=self.k)
        else:
            x, wins = _knob_graph(x2, self.k, idx0, wins, "conv3", knobs)
        x = svl.SVBlock(128 // 2, 128 // 6, self.binary, name="conv3")(x, train)
        x3 = ops.svpool(x)

        if knobs is None:
            x = ops.get_graph_feature_sv(x3, k=self.k)
        else:
            x, wins = _knob_graph(x3, self.k, idx0, wins, "conv4", knobs)
        x = svl.SVBlock(256 // 2, 256 // 6, self.binary, name="conv4")(x, train)
        x4 = ops.svpool(x)

        x = ops.svcat([x1, x2, x3, x4])
        x = svl.SVBlock(1024 // 2, 1024 // 6, self.binary, name="conv5")(x, train)
        x = svl.SVFuse(3, self.binary, name="svfuse")(x, train)  # (B, N, 1022)

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)

        x = svl.Linear(
            512, use_bias=False, bw=self.binary, ba=self.binary, name="linear1"
        )(x, train)
        x = svl.BatchNorm(name="bn1")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=p_drop, deterministic=not train)(x)
        x = svl.Linear(
            256, use_bias=False, bw=self.binary, ba=self.binary, name="linear2"
        )(x, train)
        x = svl.BatchNorm(name="bn2")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(rate=p_drop, deterministic=not train)(x)
        x = svl.Linear(self.num_classes, use_bias=True, name="linear3")(x)
        return x


class _ConvBNLReLU(nn.Module):
    """Binarizable pointwise conv (= Linear on channels-last) + BN + LeakyReLU."""

    features: int
    binary: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.binary:
            x = svl.Linear(
                self.features, use_bias=False, bw=True, ba=True, name="conv"
            )(x, train)
        else:
            x = svl.Linear(self.features, use_bias=False, name="conv")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.leaky_relu(x, negative_slope=self.negative_slope)


class SV_DGCNN_PSEG(nn.Module):
    """SVNet-DGCNN part segmentation. ref sv_dgcnn_partseg.py:40-128.

    Same 4-round trunk with make_divisible(8)-rounded widths; three SVFuse
    taps (per-point fine features, pooled global, per-point embedding max),
    a 16->64 label branch, then a binarizable pointwise-conv head stack
    256 -> 256 -> 128 -> num_part.
    """

    num_part: int = 50
    k: int = 40
    binary: bool = False
    dropout: float = 0.5
    emb: int = 1024

    @nn.compact
    def __call__(
        self, points: jax.Array, label: jax.Array, train: bool = False
    ) -> jax.Array:
        B, N = points.shape[0], points.shape[1]
        p_drop = 0.0 if self.binary else self.dropout
        emb = self.emb
        knobs = _knob_state(self.binary, self.k)  # None unless --train-knobs

        idx0 = ops.knn(points, self.k) if knobs is not None else None
        v = ops.get_graph_feature(points, k=self.k, idx=idx0)
        s = svl.Vector2Scalar(3, name="init_scalar")(v, train)
        x = (s, v)
        x = svl.SVBlock(_V(64 // 2), _V(64 // 6), name="conv1")(x, train)
        x1 = ops.svpool(x)

        wins = None
        if knobs is None:
            x = ops.get_graph_feature_sv(x1, k=self.k)
        else:
            x, wins = _knob_graph(x1, self.k, idx0, wins, "conv2", knobs)
        x = svl.SVBlock(_V(64 // 2), _V(64 // 6), self.binary, name="conv2")(x, train)
        x2 = ops.svpool(x)

        if knobs is None:
            x = ops.get_graph_feature_sv(x2, k=self.k)
        else:
            x, wins = _knob_graph(x2, self.k, idx0, wins, "conv3", knobs)
        x = svl.SVBlock(_V(128 // 2), _V(128 // 6), self.binary, name="conv3")(x, train)
        x3 = ops.svpool(x)

        if knobs is None:
            x = ops.get_graph_feature_sv(x3, k=self.k)
        else:
            x, wins = _knob_graph(x3, self.k, idx0, wins, "conv4", knobs)
        x = svl.SVBlock(_V(256 // 2), _V(256 // 6), self.binary, name="conv4")(x, train)
        x4 = ops.svpool(x)

        x = ops.svcat([x1, x2, x3, x4])  # (B, N, [3,] ·)
        x_fine = svl.SVFuse(3, self.binary, name="svfuse1")(x, train)  # (B, N, ·)

        x = svl.SVBlock(_V(emb // 2), _V(emb // 6), self.binary, name="conv5")(x, train)
        x_pool = ops.svpool(x, axis=1, keepdims=True)  # (B, 1, [3,] emb·)
        x_pool = svl.SVBlock(
            _V(emb // 4), _V(emb // 12), self.binary, name="conv6"
        )(x_pool, train)
        x_pool = svl.SVFuse(3, self.binary, name="svfuse2")(x_pool, train)  # (B, 1, ·)

        x = svl.SVFuse(3, self.binary, name="svfuse3")(x, train)  # (B, N, ·)
        x_max = jnp.max(x, axis=1, keepdims=True)  # (B, 1, ·)

        l = svl.Linear(64, use_bias=False, name="conv7")(label)  # (B, 64)
        l = svl.BatchNorm(name="bn7")(l, train)
        l = nn.leaky_relu(l, negative_slope=0.2)[:, None, :]  # (B, 1, 64)

        g = jnp.concatenate([x_max, x_pool, l], axis=-1)  # (B, 1, ·)
        g = jnp.broadcast_to(g, (B, N, g.shape[-1]))

        x = jnp.concatenate([g, x_fine], axis=-1)  # (B, N, ·)
        x = _ConvBNLReLU(256, self.binary, name="conv8")(x, train)
        x = nn.Dropout(rate=p_drop, deterministic=not train)(x)
        x = _ConvBNLReLU(256, self.binary, name="conv9")(x, train)
        x = nn.Dropout(rate=p_drop, deterministic=not train)(x)
        x = _ConvBNLReLU(128, self.binary, name="conv10")(x, train)
        x = svl.Linear(self.num_part, use_bias=False, name="conv11")(x)
        return x  # (B, N, num_part)
