"""Fused TPU inference engine for SVNet-DGCNN classification.

Runs the flagship model's eval path over a standard flax checkpoint
(params + batch_stats) with the Pallas kernels on the hot path:

  * kNN graph build: svnet_tpu.ops.pallas.knn (tiled distance + masked
    argmax top-k) — no XLA sort, no (N, N) HBM matrix;
  * DGCNN rounds 2-4: svnet_tpu.ops.pallas.sv_edge (one fused kernel per
    round; no (B, N, k, C) HBM tensors), with per-block weights folded once
    at engine construction;
  * binary head matmuls: int8 MXU path (exact for ±1 operands).

The first round (always full-precision, tiny channel counts) and the
per-point tail (conv5, SVFuse, head) run as plain XLA ops reading the same
param tree — functional eval twins of the flax layers, verified against
``model.apply`` in tests/test_infer_engine.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from svnet_tpu import ops
from svnet_tpu.nn.sv_layers import _binary_matmul_eval
from svnet_tpu.ops.pallas.knn import knn_pallas
from svnet_tpu.ops.pallas.sv_edge import (
    fold_svblock_params,
    sv_edge_block,
    svblock_gate,
)

EPS = 1e-6
BN_EPS = 1e-5

# (S_in, V_in, S_out, V_out) per fused round of SV_DGCNN_CLS
_ROUNDS = {
    "conv2": (64 // 2, 64 // 6, 64 // 2, 64 // 6),
    "conv3": (64 // 2, 64 // 6, 128 // 2, 128 // 6),
    "conv4": (128 // 2, 128 // 6, 256 // 2, 256 // 6),
}


def _bn_eval(p: dict, st: dict, x: jax.Array) -> jax.Array:
    inv = p["scale"] / jnp.sqrt(st["var"] + BN_EPS)
    return x * inv + (p["bias"] - st["mean"] * inv)


def _linear_eval(p: dict, x: jax.Array, bw: bool, ba: bool) -> jax.Array:
    kernel = p["kernel"]
    if not bw and not ba:
        y = x @ kernel
        if "bias" in p:
            y = y + p["bias"]
        return y
    if ba:
        x = jnp.sign(x + p["beta"])
    w = jnp.sign(kernel) if bw else kernel
    if bw and ba:
        y = _binary_matmul_eval(x, w)
    else:
        y = x @ w
    y = y * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _v2s_eval(p: dict, v: jax.Array, bw: bool) -> jax.Array:
    z = _linear_eval(p["linear"], v, bw, False)
    s = jnp.einsum("...ic,...ij->...cj", v, z)
    return s.reshape(s.shape[:-2] + (-1,))


def _vector_bn_eval(p: dict, st: dict, v: jax.Array) -> jax.Array:
    n = jnp.sqrt(jnp.sum(v * v, axis=-2)) + EPS
    nbn = _bn_eval(p["bn"], st["bn"], n)
    return v / n[..., None, :] * nbn[..., None, :]


def _svblock_eval(p, st, s, v, binary: bool):
    """Eval twin of svl.SVBlock.__call__ (any layout with/without k axis)."""
    B = s.shape[0]
    s_mean = jnp.mean(s.reshape(B, -1, s.shape[-1]), axis=1)
    g = jax.nn.relu(s_mean @ p["gate_fc1"]["kernel"]) @ p["gate_fc2"]["kernel"]
    g = jax.nn.sigmoid(g)
    g = g.reshape((B,) + (1,) * (v.ndim - 2) + (g.shape[-1],))

    sv = _v2s_eval(p["v2s"], v, binary)
    s = jnp.concatenate([s, sv], axis=-1)
    s = _linear_eval(p["linear1"], s, binary, binary)
    s = _bn_eval(p["bn1"]["bn"], st["bn1"]["bn"], s)
    s = jax.nn.leaky_relu(s, negative_slope=0.2)

    v = _linear_eval(p["linear2"], v, binary, False)
    v = _vector_bn_eval(p["bn2"], st["bn2"], v)
    return s, v * g


class SVDGCNNClsEngine:
    """Fused eval engine. Construct from flax variables, call on (B, N, 3)."""

    def __init__(
        self,
        variables: dict,
        num_classes: int = 40,
        k: int = 20,
        binary: bool = True,
        tile: int = 64,
        knn_impl: str = "pallas",
        exact: bool = True,
        interpret: bool = False,
    ):
        self.p = variables["params"]
        self.bs = variables["batch_stats"]
        self.k = k
        self.binary = binary
        self.tile = tile
        self.knn_impl = knn_impl
        self.exact = exact
        self.interpret = interpret
        # fold fused-round weights once
        self.folded: Dict[str, dict] = {
            name: jax.tree.map(
                jnp.asarray,
                fold_svblock_params(
                    self.p[name], self.bs[name], S, V, binary
                ),
            )
            for name, (S, V, _, _) in _ROUNDS.items()
        }
        self._jit_forward = jax.jit(self._forward)

    def _knn(self, x: jax.Array) -> jax.Array:
        if self.knn_impl == "pallas" and not self.interpret:
            return knn_pallas(x, self.k, tile=128)
        if self.knn_impl == "approx":
            return jax.lax.approx_max_k(ops.pairwise_neg_sqdist(x), self.k)[
                1
            ].astype(jnp.int32)
        return ops.knn(x, self.k)

    def _forward(self, points: jax.Array) -> jax.Array:
        p, bs, k = self.p, self.bs, self.k
        B, N = points.shape[0], points.shape[1]

        # round 1 (always FP): coords graph + conv1, plain XLA
        idx0 = self._knn(points)
        v = ops.get_graph_feature(points, k, idx0)  # (B, N, k, 3, 2)
        s = _v2s_eval(p["init_scalar"], v, False)  # (B, N, k, 6)
        s, v = _svblock_eval(p["conv1"], bs["conv1"], s, v, False)
        s1, v1 = ops.svpool((s, v))  # (B, N, 32), (B, N, 3, 10)

        outs = [(s1, v1)]
        for name, (S, V, S_out, V_out) in _ROUNDS.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate(
                [s_in, v_in.reshape(B, N, -1)], axis=-1
            )
            idx = self._knn(joint)
            gate = svblock_gate(p[name], s_in, idx)
            so, vo = sv_edge_block(
                joint, idx, gate, self.folded[name],
                S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=self.tile,
                binary=self.binary, exact=self.exact, interpret=self.interpret,
            )
            outs.append((so, vo.reshape(B, N, 3, V_out)))

        s_c = jnp.concatenate([o[0] for o in outs], axis=-1)
        v_c = jnp.concatenate([o[1] for o in outs], axis=-1)

        s5, v5 = _svblock_eval(p["conv5"], bs["conv5"], s_c, v_c, self.binary)
        x = jnp.concatenate(
            [s5, _v2s_eval(p["svfuse"]["v2s"], v5, self.binary)], axis=-1
        )  # (B, N, 1022)

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)
        x = _linear_eval(p["linear1"], x, self.binary, self.binary)
        x = jax.nn.leaky_relu(
            _bn_eval(p["bn1"]["bn"], bs["bn1"]["bn"], x), negative_slope=0.2
        )
        x = _linear_eval(p["linear2"], x, self.binary, self.binary)
        x = jax.nn.leaky_relu(
            _bn_eval(p["bn2"]["bn"], bs["bn2"]["bn"], x), negative_slope=0.2
        )
        return _linear_eval(p["linear3"], x, False, False)

    def __call__(self, points: jax.Array) -> jax.Array:
        return self._jit_forward(points)
