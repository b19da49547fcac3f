"""BiPointNet binarization primitives (third-party baseline, ``--model bipointnet``).

Capability parity with reference models/bipointnet_basic.py: the
BinaryQuantize STE family and the BiLinear variants (plain / XNOR / LSR /
BiReal / IRNet). Channels-last: the reference's Conv1d wrappers around
Linears (bipointnet.py:48-57) are unnecessary here — a pointwise conv over
(B, C, N) is a dense over (B, N, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from svnet_tpu.nn.sv_layers import torch_linear_init


def bi_quantize(x: jax.Array, train: bool) -> jax.Array:
    """sign forward; straight-through gradient inside |x| <= 1.

    ref bipointnet_basic.py:42-55 (BinaryQuantize). Eval forward is
    identical to train forward (pure sign), unlike SVNet's Linear.
    """
    if not train:
        return jnp.sign(x)
    clipped = jnp.clip(x, -1.0, 1.0)
    return clipped + jax.lax.stop_gradient(jnp.sign(x) - clipped)


def bi_quantize_identity(x: jax.Array, train: bool) -> jax.Array:
    """sign forward; identity gradient. ref bipointnet_basic.py:58-69."""
    if not train:
        return jnp.sign(x)
    return x + jax.lax.stop_gradient(jnp.sign(x) - x)


def bi_quantize_irnet(x: jax.Array, k: float, t: float, train: bool) -> jax.Array:
    """sign forward; k·t·(1 - tanh²(x·t)) surrogate gradient.

    ref bipointnet_basic.py:72-83.
    """
    if not train:
        return jnp.sign(x)
    surrogate = k * jnp.tanh(x * t)
    return surrogate + jax.lax.stop_gradient(jnp.sign(x) - surrogate)


class BiLinear(nn.Module):
    """Plain binary linear: sign(w), sign(a), real bias.

    ref bipointnet_basic.py:193-207.
    """

    features: int
    binary_act: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(d_in), (d_in, self.features))
        w = bi_quantize(kernel, train)
        a = bi_quantize(x, train) if self.binary_act else x
        y = a @ w
        if self.use_bias:
            y = y + self.param("bias", torch_linear_init(d_in), (self.features,))
        return y


class BiLinearXNOR(nn.Module):
    """XNOR-Net linear: per-output-row mean-centering + |·|-mean scales.

    ref bipointnet_basic.py:124-141. Scales are detached (stop_gradient).
    """

    features: int
    binary_act: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(d_in), (d_in, self.features))
        # torch weight rows are output channels; our kernel is (in, out), so
        # the row mean/abs-mean are per-column here.
        w = kernel - kernel.mean(axis=0, keepdims=True)
        sw = jax.lax.stop_gradient(jnp.abs(w).mean(axis=0, keepdims=True))
        w = bi_quantize(w, train) * sw
        a = x
        if self.binary_act:
            sa = jax.lax.stop_gradient(
                jnp.abs(a).mean(axis=-1, keepdims=True)
            )
            a = bi_quantize(a, train) * sa
        y = a @ w
        if self.use_bias:
            y = y + self.param("bias", torch_linear_init(d_in), (self.features,))
        return y


class BiLinearLSR(nn.Module):
    """Learned-scale binary linear (the exported BiPointNet config).

    ref bipointnet_basic.py:86-121: weights mean-centered then signed and
    multiplied by a scalar ``scale`` initialized on first forward to
    std(x @ w) / std(sign(x) @ sign(w)) — we compute that at flax init time
    (the init pass sees real data), which matches torch's lazy first-forward
    init when training from scratch; converted checkpoints override it.
    """

    features: int
    binary_act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(d_in), (d_in, self.features))
        scale = self.variable("params", "scale", lambda: jnp.zeros(()))
        w0 = kernel - kernel.mean()
        if self.is_initializing():
            xf = x.reshape(-1, d_in)
            num = jnp.std(xf @ w0)
            den = jnp.std(jnp.sign(xf) @ jnp.sign(w0))
            s = num / den
            fallback = jnp.std(w0) / jnp.std(jnp.sign(w0))
            scale.value = jnp.where(jnp.isnan(s), fallback, s)
        w = bi_quantize(w0, train) * scale.value
        a = bi_quantize(x, train) if self.binary_act else x
        return a @ w


class BiLinearBiReal(nn.Module):
    """Bi-Real-Net linear: piecewise-poly activation STE, |w|-mean scaling.

    ref bipointnet_basic.py:144-168.
    """

    features: int
    binary_act: bool = True  # the reference always binarizes activations here

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(d_in), (d_in, self.features))

        # activation: sign forward, piecewise-polynomial backward
        m1 = (x < -1).astype(x.dtype)
        m2 = (x < 0).astype(x.dtype)
        m3 = (x < 1).astype(x.dtype)
        out1 = -1 * m1 + (x * x + 2 * x) * (1 - m1)
        out2 = out1 * m2 + (-x * x + 2 * x) * (1 - m2)
        out3 = out2 * m3 + 1 * (1 - m3)
        a = out3 + jax.lax.stop_gradient(jnp.sign(x) - out3)

        sw = jax.lax.stop_gradient(jnp.abs(kernel).mean(axis=0, keepdims=True))
        clipped = jnp.clip(kernel, -1.0, 1.0)
        w = clipped + jax.lax.stop_gradient(sw * jnp.sign(kernel) - clipped)
        return a @ w


class BiLinearIRNet(nn.Module):
    """IR-Net linear: standardized weights, power-of-two scale, tanh STE.

    ref bipointnet_basic.py:171-190 (the reference hard-codes .cuda(); we
    don't — device placement is the caller's concern in JAX).
    """

    features: int
    binary_act: bool = True
    use_bias: bool = True
    k: float = 10.0
    t: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(d_in), (d_in, self.features))
        w = kernel - kernel.mean(axis=0, keepdims=True)
        w = w / jnp.std(w, axis=0, keepdims=True)
        sw = jax.lax.stop_gradient(
            jnp.exp2(jnp.round(jnp.log2(jnp.abs(w).mean(axis=0, keepdims=True))))
        )
        w = bi_quantize_irnet(w, self.k, self.t, train) * sw
        a = bi_quantize_irnet(x, self.k, self.t, train) if self.binary_act else x
        y = a @ w
        if self.use_bias:
            y = y + self.param("bias", torch_linear_init(d_in), (self.features,))
        return y


class MeanShift(nn.Module):
    """Running-median activation centering. ref bipointnet_basic.py:20-39
    (unused by exported models; kept for capability parity).

    The reference tracks a cumulative mean of per-batch medians; we keep the
    same statistic in a batch_stats collection (updated in train mode).
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        median = self.variable(
            "batch_stats", "median",
            lambda: jnp.zeros((1, x.shape[-1]), x.dtype),
        )
        num = self.variable(
            "batch_stats", "num_track", lambda: jnp.zeros((), jnp.int32)
        )
        if train and not self.is_initializing():
            batch_median = jnp.median(x.reshape(-1, x.shape[-1]), axis=0)
            n = num.value.astype(x.dtype)
            median.value = (median.value * n + batch_median[None]) / (n + 1)
            num.value = num.value + 1
        return x - median.value


class BiConv1d(nn.Module):
    """Binary 1-D convolution (mean-centered sign weights, sign activations).

    ref bipointnet_basic.py:250-272 (unused by exported models). Channels-
    last: x (B, L, C) -> (B, L', C'). kernel_size 1 degenerates to BiLinear
    semantics without bias centering differences.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: str = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_linear_init(d_in * self.kernel_size),
            (self.kernel_size, d_in, self.features),
        )
        w = kernel - kernel.mean()
        w = bi_quantize(w, train)
        a = bi_quantize(x, train)
        y = jax.lax.conv_general_dilated(
            a,
            w,
            window_strides=(self.stride,),
            padding=self.padding,
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + self.param(
                "bias", torch_linear_init(d_in), (self.features,)
            )
        return y


BI_LINEARS = {
    "BiLinear": BiLinear,
    "BiLinearXNOR": BiLinearXNOR,
    "BiLinearABC": BiLinearXNOR,
    "BiLinearLSR": BiLinearLSR,
    "BiLinearBiReal": BiLinearBiReal,
    "BiLinearIRNet": BiLinearIRNet,
}
