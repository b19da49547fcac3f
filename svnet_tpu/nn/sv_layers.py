"""SV (scalar/vector) layer library — the heart of SVNet, rebuilt TPU-native.

Capability parity with reference models/sv_layers.py (cited per class below):
two parallel streams per point — rotation-invariant scalars ``s`` and
rotation-equivariant 3-vectors ``v`` — with the scalar stream binarizable to
1-bit weights/activations.

Layouts (channels-last, TPU-friendly):
  s: (B, N, [k,] S)      v: (B, N, [k,] 3, V)

Binarization semantics (must match the reference exactly for checkpoint
parity):
  * train: activations get a learned per-input-channel bias ``beta``, then a
    straight-through sign with a ±1.2 clip window (gradient of clamp);
    weights the same without beta. ref sv_layers.py:29-53.
  * eval: plain ``sign`` (0 -> 0, same as torch.sign). This is the pure
    ±1 × ±1 matmul; on TPU it lowers to the int8 MXU path
    (_binary_matmul_eval below). A bit-packed XNOR-popcount kernel exists
    at svnet_tpu/ops/pallas/binary_matmul.py as the measured-and-rejected
    alternative (~8x slower on the VPU; numbers in PERF.md).
  * output scaled by a learned per-output-channel ``scale`` initialized
    1/sqrt(in_features).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-6
_CLIP = 1.2

SVPair = Tuple[jax.Array, jax.Array]


# ---------------------------------------------------------------------------
# binarization primitives
# ---------------------------------------------------------------------------


def ste_sign(x: jax.Array) -> jax.Array:
    """Straight-through sign for training: fwd sign(x), bwd grad of clip(±1.2).

    ref sv_layers.py:41-42/47-48: ``clamp(x, ±1.2); sign(x).detach() + x -
    x.detach()`` — sign is unchanged by the clamp, the gradient is the clamp's.
    """
    clipped = jnp.clip(x, -_CLIP, _CLIP)
    return clipped + jax.lax.stop_gradient(jnp.sign(x) - clipped)


def binarize(x: jax.Array, train: bool) -> jax.Array:
    """sign with STE in training, plain sign in eval (sign(0) = 0, as torch)."""
    return ste_sign(x) if train else jnp.sign(x)


def ste_quant8(x: jax.Array) -> jax.Array:
    """Symmetric per-channel int8 fake-quantization, straight-through grad.

    The training twin of the serving engines' 8-bit gather plane
    (ops/pallas/sv_round3.py::pack_planes_q8_t): per trailing-structure
    channel, scale = 127/amax with amax over batch AND points (axes 0, 1),
    round, clip to ±127, dequantize. Works on scalars (B, N, S) and
    vectors (B, N, 3, V) alike — for vectors every (axis, channel) row
    quantizes independently, matching the engine's flattened-joint channel
    grid. Used by the knob-aware train paths (config.train_knobs)."""
    amax = jnp.max(jnp.abs(jax.lax.stop_gradient(x)), axis=(0, 1),
                   keepdims=True)
    scale = jnp.float32(127.0) / jnp.maximum(amax, 1e-30)
    q = jnp.clip(jnp.round(x * scale), -127, 127) / scale
    return x + jax.lax.stop_gradient(q - x)


def _binary_matmul_eval(x: jax.Array, w: jax.Array) -> jax.Array:
    """Eval-path matmul of ±1 (or 0) operands.

    This is the pure XNOR-popcount-mappable matmul (SURVEY.md §2.2): on TPU
    the native equivalent is the MXU's int8×int8→int32 path — bit-exact
    (values in {-1,0,1}; accumulations bounded by d_in << 2^31) and ~2x the
    bf16 rate on v5e. Selected via svnet_tpu.config.binary_matmul.
    """
    from svnet_tpu import config

    if config.binary_matmul == "int8":
        y = jax.lax.dot_general(
            x.astype(jnp.int8),
            w.astype(jnp.int8),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(x.dtype)
    return x @ w


# ---------------------------------------------------------------------------
# torch-compatible initializers (training-behaviour parity)
# ---------------------------------------------------------------------------


def torch_linear_init(in_features: int):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(in))."""
    bound = 1.0 / math.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# batchnorm wrapper (torch BatchNorm1d semantics)
# ---------------------------------------------------------------------------


class BatchNorm(nn.Module):
    """BatchNorm over the last (feature) axis with torch BN1d semantics.

    Stats are computed over all leading axes (torch flattens to (-1, C):
    e.g. ref sv_layers.py:189). momentum/eps match torch defaults (0.1/1e-5;
    flax momentum = 1 - torch momentum).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            name="bn",
        )(x)


# ---------------------------------------------------------------------------
# core layers
# ---------------------------------------------------------------------------


class Linear(nn.Module):
    """Binarizable dense layer. ref sv_layers.py:20-53 (class Linear).

    ``bw`` binarizes weights, ``ba`` binarizes activations (with a learned
    per-input-channel bias ``beta`` added first). When binarized, the output
    is scaled by a learned per-output-channel ``scale`` (init 1/sqrt(in)).

    Also covers the reference's 1x1 ``Conv1d`` (sv_layers.py:55-78): in
    channels-last layout a kernel-size-1 conv over (B, C, N) is exactly a
    dense layer over (B, N, C); the checkpoint converter squeezes the conv's
    trailing kernel dim.
    """

    features: int
    use_bias: bool = True
    bw: bool = False
    ba: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init(d_in), (d_in, self.features)
        )
        if not self.bw and not self.ba:
            y = x @ kernel
        else:
            if self.ba:
                beta = self.param(
                    "beta", nn.initializers.zeros, (d_in,)
                )
                x = binarize(x + beta, train)
            w = binarize(kernel, train) if self.bw else kernel
            scale = self.param(
                "scale",
                lambda _, shape: jnp.full(shape, 1.0 / math.sqrt(d_in)),
                (self.features,),
            )
            if not train and self.ba and self.bw:
                y = _binary_matmul_eval(x, w) * scale
            else:
                y = (x @ w) * scale
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_init(d_in), (self.features,)
            )
            y = y + bias
        return y


class VectorBN(nn.Module):
    """Equivariant batchnorm: BN the vector norms, rescale the vectors.

    ref sv_layers.py:81-102: ``v / (||v|| + EPS) * BN(||v|| + EPS)`` — the
    direction is untouched (equivariance preserved), only the magnitude is
    normalized.
    """

    @nn.compact
    def __call__(self, v: jax.Array, train: bool = False) -> jax.Array:
        # v: (..., 3, V). The squared norm is floored before sqrt: once a
        # channel's magnitude underflows f32 (seen after ~10 epochs of
        # binary training — weight decay + gating shrink channels), the
        # sqrt gradient at exactly 0 is inf and the whole run NaNs. The
        # floor (1e-12 -> norms >= 1e-6, i.e. == EPS) is far below any
        # parity tolerance and gives a clean zero gradient there.
        nsq = jnp.maximum(jnp.sum(v * v, axis=-2), 1e-12)
        norm = jnp.sqrt(nsq) + EPS  # (..., V)
        norm_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(norm)
        return v / norm[..., None, :] * norm_bn[..., None, :]


class Vector2Scalar(nn.Module):
    """Invariant read-out: learn a direction frame z from v, emit s = v^T z.

    ref sv_layers.py:104-129. z = Linear(v) over the channel axis gives
    ``multi`` learned directions (each a linear combination of equivariant
    vectors, hence equivariant); the dot products v^T z are SO(3)-invariant.
    Output flattened channel-major: (..., V, multi) -> (..., V * multi),
    matching torch's row-major view. Optionally returns the frame z
    (``trans_back``) for un-projecting skip vectors later.
    """

    multi: int
    bw: bool = False
    trans_back: bool = False

    @nn.compact
    def __call__(self, v: jax.Array, train: bool = False):
        # v: (..., 3, V)
        z = Linear(self.multi, use_bias=False, bw=self.bw, name="linear")(
            v, train
        )  # (..., 3, multi)
        # s[..., c, j] = sum_i v[..., i, c] * z[..., i, j] — written as an
        # unrolled outer-product accumulate: the 3-length contraction would
        # otherwise lower to a tiny batched matmul the MXU handles poorly
        s = sum(
            v[..., i, :, None] * z[..., i, None, :] for i in range(3)
        )  # (..., C, multi)
        s = s.reshape(s.shape[:-2] + (-1,))
        if self.trans_back:
            return s, z
        return s


class VectorReLU(nn.Module):
    """Top-k-norm gating: zero out vectors below the (n/div)-th norm.

    ref sv_layers.py:131-149 (defined but unused by any exported model; kept
    for capability parity).
    """

    div: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, ..., 3, V) -> flatten middle to (B, M, 3, V)
        shape = x.shape
        B, V = shape[0], shape[-1]
        xf = x.reshape(B, -1, 3, V)
        m = xf.shape[1]
        kth = max(m // self.div, 1)
        norm = jax.lax.stop_gradient(
            jnp.sqrt(jnp.sum(xf * xf, axis=2, keepdims=True))
        )  # (B, M, 1, V)
        # torch kthvalue(k) = k-th smallest
        sorted_norm = jnp.sort(norm, axis=1)
        kx = sorted_norm[:, kth - 1 : kth]  # (B, 1, 1, V)
        xf = jnp.where(norm > kx, xf, jnp.zeros_like(xf))
        return xf.reshape(shape)


class SVBlock(nn.Module):
    """The core SV mixing block. ref sv_layers.py:151-196.

    1. gate: full-precision sigmoid-MLP on globally mean-pooled scalars
       -> per-channel vector scale (keeps the vector stream conditioned on
       global scalar context without breaking equivariance: a per-channel
       scalar multiple of an equivariant vector is equivariant).
    2. scalar path: Vector2Scalar(v, 3) invariants concat'd onto s, then a
       (binarizable) Linear + BN + LeakyReLU(0.2).
    3. vector path: (weight-binarizable) Linear channel mix + VectorBN,
       scaled by the gate.
    """

    out_s: int
    out_v: int
    binary: bool = False

    @nn.compact
    def __call__(self, x: SVPair, train: bool = False) -> SVPair:
        s, v = x

        # (1) gate from mean of input scalars over all points/neighbours
        B = s.shape[0]
        s_mean = jnp.mean(s.reshape(B, -1, s.shape[-1]), axis=1)  # (B, S)
        g = Linear(self.out_v // 2, use_bias=False, name="gate_fc1")(s_mean)
        g = nn.relu(g)
        g = Linear(self.out_v, use_bias=False, name="gate_fc2")(g)
        v_scale = nn.sigmoid(g)  # (B, out_v)
        v_scale = v_scale.reshape((B,) + (1,) * (v.ndim - 2) + (self.out_v,))

        # (2) scalar path
        s_v = Vector2Scalar(3, bw=self.binary, name="v2s")(v, train)
        s = jnp.concatenate([s, s_v], axis=-1)
        s = Linear(
            self.out_s,
            use_bias=False,
            bw=self.binary,
            ba=self.binary,
            name="linear1",
        )(s, train)
        s = BatchNorm(name="bn1")(s, train)
        s = nn.leaky_relu(s, negative_slope=0.2)

        # (3) vector path
        v = Linear(self.out_v, use_bias=False, bw=self.binary, name="linear2")(
            v, train
        )
        v = VectorBN(name="bn2")(v, train)
        v = v * v_scale

        return s, v


class SVFuse(nn.Module):
    """Terminal fusion: concat Vector2Scalar invariants of v onto s.

    ref sv_layers.py:198-220. Output dim = S + 3 * V (multi=3 everywhere in
    the reference). ``trans_back`` also returns the learned frame.
    """

    multi: int = 3
    binary: bool = False
    trans_back: bool = False

    @nn.compact
    def __call__(self, x: SVPair, train: bool = False):
        s, v = x
        v2s = Vector2Scalar(
            self.multi, bw=self.binary, trans_back=self.trans_back, name="v2s"
        )
        if self.trans_back:
            s_v, trans = v2s(v, train)
            return jnp.concatenate([s, s_v], axis=-1), trans
        s_v = v2s(v, train)
        return jnp.concatenate([s, s_v], axis=-1)


class SV_STNkd(nn.Module):
    """SV-flavoured spatial transformer: 3 SVBlocks -> pool over N -> 3 more.

    ref sv_layers.py:222-244. Returns a global (s, v) token with the same
    dims as the input pair.
    """

    dim_s: int
    dim_v: int
    binary: bool = False

    @nn.compact
    def __call__(self, x: SVPair, train: bool = False) -> SVPair:
        from svnet_tpu.ops import svpool  # local import to avoid cycle

        x = SVBlock(64 // 2, 64 // 6, self.binary, name="conv1")(x, train)
        x = SVBlock(128 // 2, 128 // 6, self.binary, name="conv2")(x, train)
        x = SVBlock(1024 // 2, 1024 // 6, self.binary, name="conv3")(x, train)
        x = svpool(x, axis=1)
        x = SVBlock(512 // 2, 512 // 6, self.binary, name="fc1")(x, train)
        x = SVBlock(256 // 2, 256 // 6, self.binary, name="fc2")(x, train)
        x = SVBlock(self.dim_s, self.dim_v, self.binary, name="fc3")(x, train)
        return x
