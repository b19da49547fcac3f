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

from typing import Dict

import jax
import jax.numpy as jnp

from svnet_tpu import config, ops
from svnet_tpu.nn.sv_layers import _binary_matmul_eval
from svnet_tpu.ops.pallas.knn import knn_pallas
from svnet_tpu.ops.pallas.sv_edge import (
    fold_svblock_params,
    sv_edge_block,
    svblock_gate,
)
from svnet_tpu.ops.pallas.sv_edge_first import (
    fold_first_params,
    sv_edge_first_block,
)
from svnet_tpu.ops.pallas.sv_point import (
    fold_point_params,
    head_perm,
    sv_point_block,
    sv_point_block_cm,
)
from svnet_tpu.ops.pallas.sv_round import sv_round, sv_round_first
from svnet_tpu.ops.pallas.sv_round2 import sv_round2, sv_round2_first
from svnet_tpu.ops.pallas.sv_round3 import (
    morton_order,
    sv_round3,
    sv_round3_first,
)

EPS = 1e-6
BN_EPS = 1e-5


def _maybe_morton(points: jax.Array, mode: str | None = None):
    """Morton-sort the cloud when the active configuration's accuracy
    story depends on spatial locality.

    Sorting triggers when (a) gather compaction is on — the winner-block
    locality must come from the cloud's GEOMETRY, not the caller's point
    order; (b) approx mode is active (r4, VERDICT r3 weak #7): the
    certified approx recall (~0.997, ACCURACY.md) is measured on
    Morton-sorted clouds, and an unsorted caller would silently sit in
    the ~0.96-recall fold-collision regime under the serving composition;
    or (c) config.morton_entry forces it. Sorting is exact — cls pooling
    is permutation-invariant and the partseg engine un-permutes its
    per-point logits with the returned order. Returns (points, order|None).
    """
    if not (
        config.morton_entry
        or (config.reuse_gather_window and config.graph_reuse != "none")
        or mode == "approx"
    ):
        return points, None
    order = morton_order(points)
    return jnp.take_along_axis(points, order[:, :, None], axis=1), order


def _auto_round_tile(
    N: int, tile: int, k: int = 20, C: int = 64, mode: str = "fast"
) -> int:
    """Point-tile for the sv_round kernels within the ~16 MB VMEM budget.

    Live per-program state: ~3 (T, N) f32/int32 selection buffers (exact
    mode holds ~5 — HIGHEST-precision distance temporaries + the key and
    candidate arrays), plus in exact mode the 4-byte-plane gather tiles
    and f32 block intermediates over the (k*T, C) scratch. Rounded down to
    a power of two so any pow2 N divides evenly.
    """
    sel_div = 20 if mode == "exact" else 12
    t = min(max(tile * 4, 64), N, max(9_000_000 // (sel_div * N), 32))
    if mode == "exact":
        t = min(t, max(4_500_000 // max(16 * k * C, 1), 32))
    p2 = 1
    while p2 * 2 <= t:
        p2 *= 2
    t = p2
    while N % t:
        t //= 2
    return max(int(t), 8)


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


def _linear_eval_cm(p: dict, x: jax.Array, bw: bool, ba: bool) -> jax.Array:
    """Channel-major twin of _linear_eval: x (B, C, N), contraction over
    the channel axis, per-channel affines broadcast along lanes. The
    binary×binary case rides the same int8 MXU path."""
    kernel = p["kernel"]  # (C, O)
    if not bw and not ba:
        y = jnp.einsum("co,bcn->bon", kernel, x)
        if "bias" in p:
            y = y + p["bias"][:, None]
        return y
    if ba:
        x = jnp.sign(x + p["beta"][:, None])
    w = jnp.sign(kernel) if bw else kernel
    if bw and ba and config.binary_matmul == "int8":
        y = jnp.einsum(
            "co,bcn->bon", w.astype(jnp.int8), x.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        ).astype(x.dtype)
    else:
        y = jnp.einsum("co,bcn->bon", w, x)
    y = y * p["scale"][:, None]
    if "bias" in p:
        y = y + p["bias"][:, None]
    return y


def _bn_eval_cm(p: dict, st: dict, x: jax.Array) -> jax.Array:
    inv = p["scale"] / jnp.sqrt(st["var"] + BN_EPS)
    return x * inv[:, None] + (p["bias"] - st["mean"] * inv)[:, None]


def _v2s_eval_cm(p: dict, v_cm: jax.Array, v_off, bw: bool) -> jax.Array:
    """Channel-major Vector2Scalar over a per-round j-major (B, 3ΣV, N)
    block stack: returns (B, 3ΣV, N) invariants in j-OUTER order
    (j*V_c + c, c in reference round-concatenated order) — consumers fold
    the (c*3+j)->(j*V_c+c) reorder into their weight rows."""
    kernel = p["linear"]["kernel"]  # (V_c, 3)
    w = jnp.sign(kernel) if bw else kernel
    v = [
        jnp.concatenate(
            [v_cm[:, o + i * Vr : o + (i + 1) * Vr, :] for (o, Vr) in v_off],
            axis=1,
        )
        for i in range(3)
    ]  # (B, V_c, N) x3, c in reference order
    z = [jnp.einsum("cj,bcn->bjn", w, v[i]) for i in range(3)]  # (B, 3, N)
    if bw:
        sc = p["linear"]["scale"]
        z = [zi * sc[:, None] for zi in z]
    return jnp.concatenate(
        [
            v[0] * z[0][:, j : j + 1] + v[1] * z[1][:, j : j + 1]
            + v[2] * z[2][:, j : j + 1]
            for j in range(3)
        ],
        axis=1,
    )


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
        rounds_impl: str = "round3",
        interpret: bool | None = None,
        mode: str | None = None,
        window: int = 0,
    ):
        """``window`` (round3 only): Morton candidate-window width for
        sorted surface clouds — certified block-skipping with exact
        fallback (sv_round3 docstring).
        ``rounds_impl``: 'round3' = v3 transposed (edges-along-lanes)
        fused kernel — the fastest; 'round2' = v2 fused kNN+block kernel
        (int8-plane gather, fused selection); 'round' = round-1 kernel;
        'edge' = separate kNN + idx-consuming sv_edge.
        ``mode``: 'exact' (bit-exact f32 gather, f32-exact neighbour
        ordering), 'fast' (16-bit fixed-point gather, 18-bit quantized
        selection), 'approx' (fast + folded-bin selection, recall ~0.96 at
        N=1024/k=20 — see PERF.md). Defaults from the legacy ``exact`` flag.
        ``interpret=None`` auto-enables Pallas interpret mode off-TPU."""
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.p = variables["params"]
        self.bs = variables["batch_stats"]
        self.k = k
        self.binary = binary
        self.tile = tile
        self.knn_impl = knn_impl
        self.mode = mode if mode is not None else ("exact" if exact else "fast")
        self.exact = self.mode == "exact"
        self.rounds_impl = rounds_impl
        self.interpret = interpret
        self.window = window
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
        self.folded_first = jax.tree.map(
            jnp.asarray,
            fold_first_params(
                self.p["init_scalar"], self.p["conv1"], self.bs["conv1"]
            ),
        )
        # conv5 + svfuse tail: S_c = 256, V_c = 83 -> (512, 170)
        self.folded_point = jax.tree.map(
            jnp.asarray,
            fold_point_params(
                self.p["conv5"], self.bs["conv5"], self.p["svfuse"],
                S=256, V=83, binary=binary,
            ),
        )
        # the tail emits SVFuse channels j-major; permute the head's first
        # linear (and its beta) to consume that layout
        perm = head_perm(1024 // 2, 1024 // 6)
        h1 = dict(self.p["linear1"])
        h1["kernel"] = h1["kernel"][perm, :]
        if "beta" in h1:
            h1["beta"] = h1["beta"][perm]
        self.head1 = h1
        self._jit_forward = jax.jit(self._forward)

    def _knn(self, x: jax.Array) -> jax.Array:
        if self.knn_impl == "pallas" and not self.interpret:
            return knn_pallas(x, self.k, tile=128)
        if self.knn_impl == "approx":
            return jax.lax.approx_max_k(ops.pairwise_neg_sqdist(x), self.k)[
                1
            ].astype(jnp.int32)
        return ops.knn(x, self.k)

    def _trunk_round3(self, points: jax.Array):
        """Channel-major trunk: activations stay (B, C, N) BETWEEN rounds
        (sv_round3 cm contract), cutting the per-round XLA transpose
        sandwich to the kernel's single row-major distance operand.
        Returns (s_cm (B, ΣS, N), v_cm (B, 3ΣV, N) per-round j-major) —
        consumed relayout-free by the cm point block in _tail_cm."""
        p, k = self.p, self.k
        B, N = points.shape[0], points.shape[1]
        reuse = config.graph_reuse
        assert reuse == "none" or not self.window, \
            "config.graph_reuse excludes Morton windowing"
        wins = None
        out1 = sv_round3_first(
            points, self.folded_first,
            S_out=64 // 2, V_out=64 // 6, k=k,
            mode=self.mode, interpret=self.interpret,
            window=self.window, emit_wins=reuse == "spatial", cm=True,
        )
        s1, v1, s_mean = out1[:3]  # (B, 32, N), (B, 3*10, N)
        if reuse == "spatial":
            wins = out1[3]
        g = jax.nn.relu(s_mean @ p["conv1"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ p["conv1"]["gate_fc2"]["kernel"])  # (B, 10)
        v1 = v1 * jnp.tile(g, (1, 3))[:, :, None]

        rk = config.reuse_k  # reuse rounds consume the nearest rk ranks
        outs = [(s1, v1)]
        for name, (S, V, S_out, V_out) in _ROUNDS.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate([s_in, v_in], axis=1)  # (B, C, N)
            emit = reuse == "conv2" and name == "conv2"
            w_in = wins
            kk = k
            if wins is not None and 0 < rk < k:
                w_in = wins[:, :rk]  # rank-major: ranks [0, rk) = nearest
                kk = rk
            res = sv_round3(
                joint, self.folded[name],
                S=S, V=V, S_out=S_out, V_out=V_out, k=kk,
                binary=self.binary, mode=self.mode,
                interpret=self.interpret, window=self.window,
                wins_in=w_in, emit_wins=emit, cm=True,
                gather_window=(config.reuse_gather_window
                               if wins is not None else 0),
            )
            so, vo, se_mean = res[:3]
            if emit:
                wins = res[3]
            gg = jax.nn.relu(se_mean @ p[name]["gate_fc1"]["kernel"])
            gg = jax.nn.sigmoid(gg @ p[name]["gate_fc2"]["kernel"])
            vo = vo * jnp.tile(gg, (1, 3))[:, :, None]
            outs.append((so, vo))

        s_cm = jnp.concatenate([o[0] for o in outs], axis=1)  # (B, 256, N)
        v_cm = jnp.concatenate([o[1] for o in outs], axis=1)  # (B, 249, N)
        return s_cm, v_cm

    def _tail_cm(self, s_cm: jax.Array, v_cm: jax.Array) -> jax.Array:
        """conv5 + SVFuse + head on channel-major activations: the cm
        point block consumes the trunk's (B, C, N) directly and pooling
        reduces the lane axis — zero relayouts after the trunk."""
        p, bs = self.p, self.bs
        B = s_cm.shape[0]
        N = s_cm.shape[2]

        gm = jnp.mean(s_cm, axis=2)  # (B, 256)
        g5 = jax.nn.relu(gm @ p["conv5"]["gate_fc1"]["kernel"])
        g5 = jax.nn.sigmoid(g5 @ p["conv5"]["gate_fc2"]["kernel"])  # (B, 170)

        src5 = jnp.concatenate([s_cm, v_cm], axis=1)  # (B, 505, N)
        vdims = (64 // 6, 64 // 6, 128 // 6, 256 // 6)
        v_off, o = [], 256
        for Vr in vdims:
            v_off.append((o, Vr))
            o += 3 * Vr
        x, _, _ = sv_point_block_cm(
            src5, g5, self.folded_point,
            S=256, V=83, S_out=512, V_out=170, v_off=tuple(v_off),
            T=min(self.tile * 2, N),
            binary=self.binary, exact=self.exact, interpret=self.interpret,
        )  # (B, 1022, N), SVFuse channels j-major

        x = jnp.concatenate([jnp.max(x, axis=2), jnp.mean(x, axis=2)], axis=-1)
        x = _linear_eval(self.head1, x, self.binary, self.binary)
        x = jax.nn.leaky_relu(
            _bn_eval(p["bn1"]["bn"], bs["bn1"]["bn"], x), negative_slope=0.2
        )
        x = _linear_eval(p["linear2"], x, self.binary, self.binary)
        x = jax.nn.leaky_relu(
            _bn_eval(p["bn2"]["bn"], bs["bn2"]["bn"], x), negative_slope=0.2
        )
        return _linear_eval(p["linear3"], x, False, False)

    def _forward(self, points: jax.Array) -> jax.Array:
        p, bs, k = self.p, self.bs, self.k
        B, N = points.shape[0], points.shape[1]

        if self.rounds_impl == "round3":
            points, _ = _maybe_morton(points, self.mode)  # cls: perm-invariant
            s_cm, v_cm = self._trunk_round3(points)
            return self._tail_cm(s_cm, v_cm)

        # round 1 (always FP): fused first-layer kernel; gate applied here
        # (per-(batch, channel), commutes with the kernel's mean-pool)
        if self.rounds_impl == "round2":
            s1, v1_flat, s_mean = sv_round2_first(
                points, self.folded_first,
                S_out=64 // 2, V_out=64 // 6, k=k,
                T=_auto_round_tile(N, self.tile, k, 3, self.mode),
                mode=self.mode, interpret=self.interpret,
            )
        elif self.rounds_impl == "round":
            s1, v1_flat, s_mean = sv_round_first(
                points, self.folded_first,
                S_out=64 // 2, V_out=64 // 6, k=k,
                T=_auto_round_tile(N, self.tile),
                exact=self.exact, interpret=self.interpret,
            )
        else:
            idx0 = self._knn(points)
            # exact mode keeps the one-hot gather in f32 — halve the tile to
            # fit the (N, k*T) one-hot in VMEM
            t_first = self.tile // 2 if self.exact else self.tile
            s1, v1_flat, s_mean = sv_edge_first_block(
                points, idx0, self.folded_first,
                S_out=64 // 2, V_out=64 // 6, k=k, T=max(t_first, 8),
                exact=self.exact, interpret=self.interpret,
            )
        g = jax.nn.relu(s_mean @ p["conv1"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ p["conv1"]["gate_fc2"]["kernel"])  # (B, 10)
        v1 = v1_flat.reshape(B, N, 3, 64 // 6) * g[:, None, None, :]

        outs = [(s1, v1)]
        for name, (S, V, S_out, V_out) in _ROUNDS.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate(
                [s_in, v_in.reshape(B, N, -1)], axis=-1
            )
            if self.rounds_impl in ("round", "round2"):
                if self.rounds_impl == "round2":
                    t_round = _auto_round_tile(
                        N, self.tile, k, S + 3 * V, self.mode
                    )
                    so, vo, se_mean = sv_round2(
                        joint, self.folded[name],
                        S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=t_round,
                        binary=self.binary, mode=self.mode,
                        interpret=self.interpret,
                    )
                else:
                    t_round = _auto_round_tile(
                        N, self.tile, k, S + 3 * V, self.mode
                    )
                    so, vo, se_mean = sv_round(
                        joint, self.folded[name],
                        S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=t_round,
                        binary=self.binary, exact=self.exact,
                        interpret=self.interpret,
                    )
                g = jax.nn.relu(se_mean @ p[name]["gate_fc1"]["kernel"])
                g = jax.nn.sigmoid(g @ p[name]["gate_fc2"]["kernel"])
                vo = vo * jnp.tile(g, (1, 3))[:, None, :]
            else:
                idx = self._knn(joint)
                gate = svblock_gate(p[name], s_in, idx)
                so, vo = sv_edge_block(
                    joint, idx, gate, self.folded[name],
                    S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=self.tile,
                    binary=self.binary, exact=self.exact,
                    interpret=self.interpret,
                )
            outs.append((so, vo.reshape(B, N, 3, V_out)))

        s_c = jnp.concatenate([o[0] for o in outs], axis=-1)  # (B, N, 256)
        v_c = jnp.concatenate([o[1] for o in outs], axis=-1)  # (B, N, 3, 83)
        return self._tail(points, s_c, v_c)

    def _tail(self, points: jax.Array, s_c: jax.Array,
              v_c: jax.Array) -> jax.Array:
        """conv5 + SVFuse point block and the MLP head, shared by the
        channel-major round3 trunk and the legacy row-major trunks."""
        p, bs = self.p, self.bs
        B, N = points.shape[0], points.shape[1]

        # conv5 gate from the materialized skip scalars
        gm = jnp.mean(s_c, axis=1)
        g5 = jax.nn.relu(gm @ p["conv5"]["gate_fc1"]["kernel"])
        g5 = jax.nn.sigmoid(g5 @ p["conv5"]["gate_fc2"]["kernel"])  # (B, 170)

        src5 = jnp.concatenate([s_c, v_c.reshape(B, N, -1)], axis=-1)
        x, _, _ = sv_point_block(
            src5, g5, self.folded_point,
            S=256, V=83, S_out=512, V_out=170, T=min(self.tile * 2, N),
            binary=self.binary, exact=self.exact, interpret=self.interpret,
        )  # (B, N, 1022), SVFuse channels j-major

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)
        x = _linear_eval(self.head1, x, self.binary, self.binary)
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


def _make_div(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_V = _make_div


class SVDGCNNPsegEngine:
    """Fused eval engine for SV-DGCNN part segmentation.

    Same kernel stack as the classifier engine (sv_round_first, sv_round,
    sv_point for conv5+svfuse3) with the partseg head (three SVFuse taps,
    label branch, pointwise conv stack) in XLA. The sv_point output's
    j-major SVFuse channels are permuted back to the reference's c-major
    order with one channel gather, so the stock head params apply unchanged.
    """

    def __init__(
        self,
        variables: dict,
        num_part: int = 50,
        k: int = 40,
        binary: bool = True,
        tile: int = 64,
        exact: bool = True,
        interpret: bool | None = None,
        mode: str | None = None,
        rounds_impl: str = "round3",
        window: int = 0,
    ):
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.p = variables["params"]
        self.bs = variables["batch_stats"]
        self.k = k
        self.binary = binary
        self.tile = tile
        self.mode = mode if mode is not None else ("exact" if exact else "fast")
        self.exact = self.mode == "exact"
        self.interpret = interpret
        self.rounds_impl = rounds_impl
        self.window = window

        self.dims = {
            "conv1": (_V(32), _V(10)),
            "conv2": (_V(32), _V(10)),
            "conv3": (_V(64), _V(21)),
            "conv4": (_V(128), _V(42)),
        }
        s1, v1 = self.dims["conv1"]
        rounds = {
            "conv2": (s1, v1, *self.dims["conv2"]),
            "conv3": (self.dims["conv2"][0], self.dims["conv2"][1], *self.dims["conv3"]),
            "conv4": (self.dims["conv3"][0], self.dims["conv3"][1], *self.dims["conv4"]),
        }
        self.rounds = rounds
        self.folded = {
            name: jax.tree.map(
                jnp.asarray,
                fold_svblock_params(self.p[name], self.bs[name], S, V, binary),
            )
            for name, (S, V, _, _) in rounds.items()
        }
        self.folded_first = jax.tree.map(
            jnp.asarray,
            fold_first_params(
                self.p["init_scalar"], self.p["conv1"], self.bs["conv1"]
            ),
        )
        # conv5 + svfuse3 fusion dims
        self.S_c = s1 + self.dims["conv2"][0] + self.dims["conv3"][0] + self.dims["conv4"][0]
        self.V_c = v1 + self.dims["conv2"][1] + self.dims["conv3"][1] + self.dims["conv4"][1]
        self.S5, self.V5 = _V(512), _V(1024 // 6)
        self.folded_point = jax.tree.map(
            jnp.asarray,
            fold_point_params(
                self.p["conv5"], self.bs["conv5"], self.p["svfuse3"],
                S=self.S_c, V=self.V_c, binary=binary,
            ),
        )
        # j-major -> c-major channel permutation of the sv_point output
        inv = [0] * (3 * self.V5)
        for j in range(3):
            for c in range(self.V5):
                inv[c * 3 + j] = j * self.V5 + c
        self.fuse3_perm = jnp.asarray(
            list(range(self.S5)) + [self.S5 + i for i in inv], dtype=jnp.int32
        )
        # cm tail: fold the j-major/j-outer emitted layouts of x_max and
        # x_fine's v2s block into conv8's rows (x_pool/label stay c-major)
        S6 = self.p["conv6"]["linear1"]["kernel"].shape[1]
        V6 = self.p["conv6"]["linear2"]["kernel"].shape[1]
        Wl = self.p["conv7"]["kernel"].shape[1]
        jmaj = lambda S, V, off: (
            [off + i for i in range(S)]
            + [off + S + c * 3 + j for j in range(3) for c in range(V)]
        )
        rows = jmaj(self.S5, self.V5, 0)
        off = self.S5 + 3 * self.V5
        rows += [off + i for i in range(S6 + 3 * V6 + Wl)]
        off += S6 + 3 * V6 + Wl
        rows += jmaj(self.S_c, self.V_c, off)
        h8 = dict(self.p["conv8"]["conv"])
        h8["kernel"] = h8["kernel"][jnp.asarray(rows, jnp.int32), :]
        if "beta" in h8:
            h8["beta"] = h8["beta"][jnp.asarray(rows, jnp.int32)]
        self.head8 = h8
        self._jit_forward = jax.jit(self._forward)

    def _trunk_round3(self, points: jax.Array):
        """Channel-major trunk (see SVDGCNNClsEngine._trunk_round3):
        activations stay (B, C, N) between rounds, one relayout per round
        instead of three. Returns (s_cm (B, S_c, N), v_cm (B, 3V_c, N)
        per-round j-major) for the relayout-free _tail_cm. At partseg
        shapes (N=2048) the relayouts this removes are 16x bigger than
        cls."""
        p, k = self.p, self.k
        B, N = points.shape[0], points.shape[1]
        s1_dim, v1_dim = self.dims["conv1"]
        reuse = config.graph_reuse
        assert reuse == "none" or not self.window, \
            "config.graph_reuse excludes Morton windowing"
        wins = None
        out1 = sv_round3_first(
            points, self.folded_first,
            S_out=s1_dim, V_out=v1_dim, k=k,
            mode=self.mode, interpret=self.interpret,
            window=self.window, emit_wins=reuse == "spatial", cm=True,
        )
        s1, v1, s_mean = out1[:3]  # (B, s1_dim, N), (B, 3*v1_dim, N)
        if reuse == "spatial":
            wins = out1[3]
        g = jax.nn.relu(s_mean @ p["conv1"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ p["conv1"]["gate_fc2"]["kernel"])
        v1 = v1 * jnp.tile(g, (1, 3))[:, :, None]

        rk = config.reuse_k  # reuse rounds consume the nearest rk ranks
        outs = [(s1, v1)]
        for name, (S, V, S_out, V_out) in self.rounds.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate([s_in, v_in], axis=1)  # (B, C, N)
            emit = reuse == "conv2" and name == "conv2"
            w_in = wins
            kk = k
            if wins is not None and 0 < rk < k:
                w_in = wins[:, :rk]  # rank-major: ranks [0, rk) = nearest
                kk = rk
            res = sv_round3(
                joint, self.folded[name],
                S=S, V=V, S_out=S_out, V_out=V_out, k=kk,
                binary=self.binary, mode=self.mode,
                interpret=self.interpret, window=self.window,
                wins_in=w_in, emit_wins=emit, cm=True,
                gather_window=(config.reuse_gather_window
                               if wins is not None else 0),
            )
            so, vo, se_mean = res[:3]
            if emit:
                wins = res[3]
            gg = jax.nn.relu(se_mean @ p[name]["gate_fc1"]["kernel"])
            gg = jax.nn.sigmoid(gg @ p[name]["gate_fc2"]["kernel"])
            vo = vo * jnp.tile(gg, (1, 3))[:, :, None]
            outs.append((so, vo))

        s_cm = jnp.concatenate([o[0] for o in outs], axis=1)  # (B, S_c, N)
        v_cm = jnp.concatenate([o[1] for o in outs], axis=1)  # (B, 3V_c, N)
        return s_cm, v_cm

    def _tail_cm(self, label: jax.Array, s_cm: jax.Array,
                 v_cm: jax.Array) -> jax.Array:
        """Channel-major partseg tail: svfuse1, the cm point block, and
        the pointwise head all consume (B, C, N) directly — the emitted
        j-major/j-outer vector layouts are folded into conv8's rows
        (self.head8), so the whole forward runs relayout-free until the
        final (B, 50, N) -> (B, N, 50) output swap."""
        p, bs = self.p, self.bs
        B, N = s_cm.shape[0], s_cm.shape[2]
        binary = self.binary
        vdims = [V for (_, V) in self.dims.values()]
        v_off0, o = [], 0
        for Vr in vdims:
            v_off0.append((o, Vr))
            o += 3 * Vr

        # svfuse1 -> per-point fine features (j-outer vector block)
        x_fine = jnp.concatenate(
            [s_cm, _v2s_eval_cm(p["svfuse1"]["v2s"], v_cm, v_off0, binary)],
            axis=1,
        )  # (B, S_c + 3V_c, N)

        # conv5 + svfuse3 fused per point
        gm = jnp.mean(s_cm, axis=2)
        g5 = jax.nn.relu(gm @ p["conv5"]["gate_fc1"]["kernel"])
        g5 = jax.nn.sigmoid(g5 @ p["conv5"]["gate_fc2"]["kernel"])
        src5 = jnp.concatenate([s_cm, v_cm], axis=1)
        v_off5 = tuple((self.S_c + o, Vr) for (o, Vr) in v_off0)
        x, s5_max, v5_mean = sv_point_block_cm(
            src5, g5, self.folded_point,
            S=self.S_c, V=self.V_c, S_out=self.S5, V_out=self.V5,
            v_off=v_off5, T=min(self.tile * 2, N),
            binary=binary, exact=self.exact, interpret=self.interpret,
        )  # (B, S5 + 3*V5, N), SVFuse channels j-major

        # pooled token path (B, 1, ·): conv6 SVBlock + svfuse2 in XLA — tiny
        sp = s5_max[:, None, :]
        vp = v5_mean.reshape(B, 1, 3, self.V5)
        sp, vp = _svblock_eval(p["conv6"], bs["conv6"], sp, vp, binary)
        x_pool = jnp.concatenate(
            [sp, _v2s_eval(p["svfuse2"]["v2s"], vp, binary)], axis=-1
        )  # (B, 1, ·) reference c-major

        x_max = jnp.max(x, axis=2)[:, :, None]  # (B, S5 + 3*V5, 1)

        l = _linear_eval(p["conv7"], label, False, False)
        l = _bn_eval(p["bn7"]["bn"], bs["bn7"]["bn"], l)
        l = jax.nn.leaky_relu(l, negative_slope=0.2)[:, :, None]

        gcat = jnp.concatenate(
            [x_max, jnp.swapaxes(x_pool, 1, 2), l], axis=1
        )  # (B, Wg, 1)
        gcat = jnp.broadcast_to(gcat, (B, gcat.shape[1], N))
        net = jnp.concatenate([gcat, x_fine], axis=1)

        net = _linear_eval_cm(self.head8, net, binary, binary)
        net = _bn_eval_cm(p["conv8"]["bn"], bs["conv8"]["bn"], net)
        net = jax.nn.leaky_relu(net, negative_slope=0.2)
        for name in ("conv9", "conv10"):
            net = _linear_eval_cm(p[name]["conv"], net, binary, binary)
            net = _bn_eval_cm(p[name]["bn"], bs[name]["bn"], net)
            net = jax.nn.leaky_relu(net, negative_slope=0.2)
        out = _linear_eval_cm(p["conv11"], net, False, False)
        return jnp.swapaxes(out, 1, 2)

    def _forward(self, points: jax.Array, label: jax.Array) -> jax.Array:
        p, bs, k = self.p, self.bs, self.k
        B, N = points.shape[0], points.shape[1]
        binary = self.binary

        if self.rounds_impl == "round3":
            points, order = _maybe_morton(points, self.mode)
            s_cm, v_cm = self._trunk_round3(points)
            out = self._tail_cm(label, s_cm, v_cm)  # (B, N, 50)
            if order is not None:  # undo the sort on the per-point logits
                inv = jnp.argsort(order, axis=1)
                out = jnp.take_along_axis(out, inv[:, :, None], axis=1)
            return out

        s1_dim, v1_dim = self.dims["conv1"]
        s1, v1_flat, s_mean = sv_round2_first(
            points, self.folded_first,
            S_out=s1_dim, V_out=v1_dim, k=k,
            T=_auto_round_tile(N, self.tile, k, 3, self.mode),
            mode=self.mode, interpret=self.interpret,
        )
        g = jax.nn.relu(s_mean @ p["conv1"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ p["conv1"]["gate_fc2"]["kernel"])
        v1 = v1_flat.reshape(B, N, 3, v1_dim) * g[:, None, None, :]

        outs = [(s1, v1)]
        for name, (S, V, S_out, V_out) in self.rounds.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate([s_in, v_in.reshape(B, N, -1)], axis=-1)
            so, vo, se_mean = sv_round2(
                joint, self.folded[name],
                S=S, V=V, S_out=S_out, V_out=V_out, k=k,
                T=_auto_round_tile(N, self.tile, k, S + 3 * V, self.mode),
                binary=binary, mode=self.mode, interpret=self.interpret,
            )
            gg = jax.nn.relu(se_mean @ p[name]["gate_fc1"]["kernel"])
            gg = jax.nn.sigmoid(gg @ p[name]["gate_fc2"]["kernel"])
            vo = vo * jnp.tile(gg, (1, 3))[:, None, :]
            outs.append((so, vo.reshape(B, N, 3, V_out)))

        s_c = jnp.concatenate([o[0] for o in outs], axis=-1)  # (B, N, S_c)
        v_c = jnp.concatenate([o[1] for o in outs], axis=-1)  # (B, N, 3, V_c)
        return self._tail(points, label, s_c, v_c)

    def _tail(self, points: jax.Array, label: jax.Array, s_c: jax.Array,
              v_c: jax.Array) -> jax.Array:
        """svfuse1 + conv5/svfuse3 point block + partseg head, shared by
        the channel-major round3 trunk and the legacy row-major trunk."""
        p, bs = self.p, self.bs
        B, N = points.shape[0], points.shape[1]
        binary = self.binary

        # svfuse1 -> per-point fine features (reference channel order)
        x_fine = jnp.concatenate(
            [s_c, _v2s_eval(p["svfuse1"]["v2s"], v_c, binary)], axis=-1
        )

        # conv5 + svfuse3 fused per point
        gm = jnp.mean(s_c, axis=1)
        g5 = jax.nn.relu(gm @ p["conv5"]["gate_fc1"]["kernel"])
        g5 = jax.nn.sigmoid(g5 @ p["conv5"]["gate_fc2"]["kernel"])
        src5 = jnp.concatenate([s_c, v_c.reshape(B, N, -1)], axis=-1)
        x, s5_max, v5_mean = sv_point_block(
            src5, g5, self.folded_point,
            S=self.S_c, V=self.V_c, S_out=self.S5, V_out=self.V5,
            T=min(self.tile * 2, N),
            binary=binary, exact=self.exact, interpret=self.interpret,
        )
        x = jnp.take(x, self.fuse3_perm, axis=-1)  # back to c-major

        # pooled token path (B, 1, ·): conv6 SVBlock + svfuse2 in XLA — tiny
        sp = s5_max[:, None, :]
        vp = v5_mean.reshape(B, 1, 3, self.V5)
        sp, vp = _svblock_eval(p["conv6"], bs["conv6"], sp, vp, binary)
        x_pool = jnp.concatenate(
            [sp, _v2s_eval(p["svfuse2"]["v2s"], vp, binary)], axis=-1
        )  # (B, 1, ·)

        x_max = jnp.max(x, axis=1, keepdims=True)  # (B, 1, S5 + 3*V5)

        l = _linear_eval(p["conv7"], label, False, False)
        l = _bn_eval(p["bn7"]["bn"], bs["bn7"]["bn"], l)
        l = jax.nn.leaky_relu(l, negative_slope=0.2)[:, None, :]

        gcat = jnp.concatenate([x_max, x_pool, l], axis=-1)
        gcat = jnp.broadcast_to(gcat, (B, N, gcat.shape[-1]))
        net = jnp.concatenate([gcat, x_fine], axis=-1)

        for name in ("conv8", "conv9", "conv10"):
            net = _linear_eval(p[name]["conv"], net, binary, binary)
            net = _bn_eval(p[name]["bn"], bs[name]["bn"], net)
            net = jax.nn.leaky_relu(net, negative_slope=0.2)
        return _linear_eval(p["conv11"], net, False, False)

    def __call__(self, points: jax.Array, label: jax.Array) -> jax.Array:
        return self._jit_forward(points, label)


class SVPointNetClsEngine:
    """Fused eval engine for SV-PointNet classification.

    ref sv_pointnet_cls.py:12-81. One fused first round (cross-product edge
    features + conv_pos + pool over k via sv_round_first(cross=True)), then
    every per-point SVBlock (conv1, the SV_STNkd trunk, conv2/conv3/
    conv_fuse) through the sv_block_point kernel; the pooled token path
    (STN fc1-3, final SVFuse, MLP head) stays in XLA.
    """

    def __init__(
        self,
        variables: dict,
        num_classes: int = 40,
        k: int = 20,
        binary: bool = True,
        tile: int = 256,
        exact: bool = True,
        interpret: bool | None = None,
        mode: str | None = None,
    ):
        from svnet_tpu.ops.pallas.sv_block_point import (
            fold_point_like_params,
            sv_block_point,
        )

        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.p = variables["params"]
        self.bs = variables["batch_stats"]
        self.k = k
        self.binary = binary
        self.tile = tile
        self.mode = mode if mode is not None else ("exact" if exact else "fast")
        self.exact = self.mode == "exact"
        self.interpret = interpret
        self._block = sv_block_point

        enc = self.p["feat"]
        enc_bs = self.bs["feat"]
        self.enc = enc
        self.enc_bs = enc_bs
        self.folded_first = jax.tree.map(
            jnp.asarray,
            fold_first_params(
                enc["init_scalar"], enc["conv_pos"], enc_bs["conv_pos"], n_ch=3
            ),
        )
        # per-point blocks: name -> (S_in, V_in, S_out, V_out, param tree)
        self.blocks = {}
        specs = {
            "conv1": (32, 10, 32, 10),
            "fstn/conv1": (32, 10, 32, 10),
            "fstn/conv2": (32, 10, 64, 21),
            "fstn/conv3": (64, 21, 512, 170),
            "conv2": (64, 20, 64, 21),
            "conv3": (64, 21, 512, 170),
            "conv_fuse": (1024, 340, 512, 170),
        }
        for name, (S, V, So, Vo) in specs.items():
            node_p, node_bs = enc, enc_bs
            for seg in name.split("/"):
                node_p = node_p[seg]
                node_bs = node_bs[seg]
            self.blocks[name] = (
                (S, V, So, Vo),
                jax.tree.map(
                    jnp.asarray,
                    fold_point_like_params(node_p, node_bs, S, V, binary),
                ),
                node_p,
            )
        self._jit_forward = jax.jit(self._forward)

    def _run_block(self, name, s, v):
        """Per-point SVBlock via the Pallas kernel; gate computed host-side
        from the materialized input scalars."""
        (S, V, So, Vo), folded, node_p = self.blocks[name]
        B, N = s.shape[0], s.shape[1]
        g = jnp.mean(s, axis=1)
        g = jax.nn.relu(g @ node_p["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ node_p["gate_fc2"]["kernel"])
        src = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
        so, vo = self._block(
            src, g, folded, S=S, V=V, S_out=So, V_out=Vo,
            T=min(self.tile, N), binary=self.binary, exact=self.exact,
            interpret=self.interpret,
        )
        return so, vo.reshape(B, N, 3, Vo)

    def _forward(self, points: jax.Array) -> jax.Array:
        p, bs, k = self.p, self.bs, self.k
        enc, enc_bs = self.enc, self.enc_bs
        B, N = points.shape[0], points.shape[1]

        s0, v0_flat, s_mean = sv_round3_first(
            points, self.folded_first,
            S_out=32, V_out=10, k=k,
            mode=self.mode, cross=True, interpret=self.interpret,
        )
        g = jax.nn.relu(s_mean @ enc["conv_pos"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ enc["conv_pos"]["gate_fc2"]["kernel"])
        v0 = v0_flat.reshape(B, N, 3, 10) * g[:, None, None, :]

        s, v = self._run_block("conv1", s0, v0)

        # SV_STNkd: three per-point blocks, pool over N, token path in XLA
        ts, tv = self._run_block("fstn/conv1", s, v)
        ts, tv = self._run_block("fstn/conv2", ts, tv)
        ts, tv = self._run_block("fstn/conv3", ts, tv)
        tok = ops.svpool((ts, tv), axis=1)  # (B, 512), (B, 3, 170)
        fstn_p, fstn_bs = enc["fstn"], enc_bs["fstn"]
        tok = _svblock_eval(
            fstn_p["fc1"], fstn_bs["fc1"], tok[0][:, None], tok[1][:, None],
            self.binary,
        )
        tok = _svblock_eval(fstn_p["fc2"], fstn_bs["fc2"], tok[0], tok[1], self.binary)
        tok = _svblock_eval(fstn_p["fc3"], fstn_bs["fc3"], tok[0], tok[1], self.binary)
        g_s = jnp.broadcast_to(tok[0], s.shape)
        g_v = jnp.broadcast_to(tok[1], v.shape)
        s = jnp.concatenate([s, g_s], axis=-1)
        v = jnp.concatenate([v, g_v], axis=-1)

        s, v = self._run_block("conv2", s, v)
        s, v = self._run_block("conv3", s, v)

        sm, vm = ops.svpool((s, v), axis=1, keepdims=True)
        s = jnp.concatenate([s, jnp.broadcast_to(sm, s.shape)], axis=-1)
        v = jnp.concatenate([v, jnp.broadcast_to(vm, v.shape)], axis=-1)
        s, v = self._run_block("conv_fuse", s, v)

        s, v = ops.svpool((s, v), axis=1)  # (B, 512), (B, 3, 170)
        x = jnp.concatenate(
            [s, _v2s_eval(enc["svfuse"]["v2s"], v, self.binary)], axis=-1
        )

        x = _linear_eval(p["fc1"], x, self.binary, self.binary)
        x = _bn_eval(p["bn1"]["bn"], bs["bn1"]["bn"], x)
        x = jax.nn.relu(x)
        x = _linear_eval(p["fc2"], x, self.binary, self.binary)
        x = _bn_eval(p["bn2"]["bn"], bs["bn2"]["bn"], x)
        x = jax.nn.relu(x)
        return _linear_eval(p["fc3"], x, False, False)

    def __call__(self, points: jax.Array) -> jax.Array:
        return self._jit_forward(points)


class SVPointNetPsegEngine:
    """Fused eval engine for SV-PointNet part segmentation.

    ref sv_pointnet_partseg.py:12-97. One fused first round (cross-product
    edge features + conv_pos + pool over k via sv_round3_first(cross=True)),
    every per-point SVBlock (conv1-5, the SV_STNkd trunk/fc stack) through
    the sv_block_point kernel, and the SVFuse(trans_back) read-out, frame
    un-projection, conv_fuse bottleneck and pointwise head in XLA (binary
    matmuls ride the int8 MXU path).
    """

    def __init__(
        self,
        variables: dict,
        num_part: int = 50,
        k: int = 40,
        binary: bool = True,
        tile: int = 256,
        exact: bool = True,
        interpret: bool | None = None,
        mode: str | None = None,
    ):
        from svnet_tpu.ops.pallas.sv_block_point import (
            fold_point_like_params,
            sv_block_point,
        )

        if interpret is None:
            interpret = jax.default_backend() not in ("tpu",)
        self.p = variables["params"]
        self.bs = variables["batch_stats"]
        self.k = k
        self.binary = binary
        self.tile = tile
        self.mode = mode if mode is not None else ("exact" if exact else "fast")
        self.exact = self.mode == "exact"
        self.interpret = interpret
        self._block = sv_block_point

        p, bs = self.p, self.bs
        self.folded_first = jax.tree.map(
            jnp.asarray,
            fold_first_params(
                p["init_scalar"], p["conv_pos"], bs["conv_pos"], n_ch=3
            ),
        )
        # per-point blocks: name -> (S_in, V_in, S_out, V_out)
        specs = {
            "conv1": (32, 10, 32, 10),
            "conv2": (32, 10, 64, 21),
            "conv3": (64, 21, 64, 21),
            "fstn/conv1": (64, 21, 32, 10),
            "fstn/conv2": (32, 10, 64, 21),
            "fstn/conv3": (64, 21, 512, 170),
            "conv4": (128, 42, 256, 85),
            "conv5": (256, 85, 1024, 341),
        }
        self.blocks = {}
        for name, (S, V, So, Vo) in specs.items():
            node_p, node_bs = p, bs
            for seg in name.split("/"):
                node_p = node_p[seg]
                node_bs = node_bs[seg]
            self.blocks[name] = (
                (S, V, So, Vo),
                jax.tree.map(
                    jnp.asarray,
                    fold_point_like_params(node_p, node_bs, S, V, binary),
                ),
                node_p,
            )
        self._jit_forward = jax.jit(self._forward)

    def _run_block(self, name, s, v):
        (S, V, So, Vo), folded, node_p = self.blocks[name]
        B, N = s.shape[0], s.shape[1]
        g = jnp.mean(s, axis=1)
        g = jax.nn.relu(g @ node_p["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ node_p["gate_fc2"]["kernel"])
        src = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
        so, vo = self._block(
            src, g, folded, S=S, V=V, S_out=So, V_out=Vo,
            T=min(self.tile, N), binary=self.binary, exact=self.exact,
            interpret=self.interpret,
        )
        return so, vo.reshape(B, N, 3, Vo)

    def _conv_bn_relu(self, name, x):
        p, bs = self.p, self.bs
        x = _linear_eval(p[f"{name}_conv"], x, self.binary, self.binary)
        x = _bn_eval(p[f"{name}_bn"]["bn"], bs[f"{name}_bn"]["bn"], x)
        return jax.nn.relu(x)

    def _forward(self, points: jax.Array, label: jax.Array) -> jax.Array:
        from svnet_tpu.ops.pallas.sv_round3 import sv_round3_first

        p, bs, k = self.p, self.bs, self.k
        B, N = points.shape[0], points.shape[1]
        binary = self.binary

        s0, v0_flat, s_mean = sv_round3_first(
            points, self.folded_first,
            S_out=32, V_out=10, k=k,
            mode=self.mode, cross=True, interpret=self.interpret,
        )
        g = jax.nn.relu(s_mean @ p["conv_pos"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ p["conv_pos"]["gate_fc2"]["kernel"])
        v0 = v0_flat.reshape(B, N, 3, 10) * g[:, None, None, :]

        s1, v1 = self._run_block("conv1", s0, v0)
        s2, v2 = self._run_block("conv2", s1, v1)
        s3, v3 = self._run_block("conv3", s2, v2)

        # SV_STNkd global token
        ts, tv = self._run_block("fstn/conv1", s3, v3)
        ts, tv = self._run_block("fstn/conv2", ts, tv)
        ts, tv = self._run_block("fstn/conv3", ts, tv)
        tok_s, tok_v = ops.svpool((ts, tv), axis=1)  # (B, 512), (B, 3, 170)
        tok_s, tok_v = tok_s[:, None], tok_v[:, None]
        # (B, 1) token path stays in XLA — tiny
        fstn_p, fstn_bs = p["fstn"], bs["fstn"]
        for fc in ("fc1", "fc2", "fc3"):
            tok_s, tok_v = _svblock_eval(
                fstn_p[fc], fstn_bs[fc], tok_s, tok_v, binary
            )
        s = jnp.concatenate([s3, jnp.broadcast_to(tok_s, s3.shape)], axis=-1)
        v = jnp.concatenate([v3, jnp.broadcast_to(tok_v, v3.shape)], axis=-1)

        s4, v4 = self._run_block("conv4", s, v)
        s5, v5 = self._run_block("conv5", s4, v4)

        sm = jnp.mean(s5, axis=1, keepdims=True)
        vm = jnp.mean(v5, axis=1, keepdims=True)
        s = jnp.concatenate([s5, jnp.broadcast_to(sm, s5.shape)], axis=-1)
        v = jnp.concatenate([v5, jnp.broadcast_to(vm, v5.shape)], axis=-1)

        # SVFuse(trans_back): invariant read-out + learned frame
        lp = p["svfuse"]["v2s"]["linear"]
        w = jnp.sign(lp["kernel"]) if binary else lp["kernel"]
        trans = v @ w
        if "scale" in lp:
            trans = trans * lp["scale"]
        sv = jnp.einsum("bnic,bnij->bncj", v, trans)
        x = jnp.concatenate([s, sv.reshape(B, N, -1)], axis=-1)

        x = self._conv_bn_relu("conv_fuse1", x)
        x = self._conv_bn_relu("conv_fuse2", x)
        x = jnp.mean(x, axis=1) if binary else jnp.max(x, axis=1)

        x_l = jnp.concatenate([x, label], axis=-1)
        x_l = jnp.broadcast_to(x_l[:, None, :], (B, N, x_l.shape[-1]))

        cs = jnp.concatenate([s1, s2, s3, s4, s5], axis=-1)
        cv = jnp.concatenate([v1, v2, v3, v4, v5], axis=-1)
        concat_v = jnp.einsum("bnic,bnik->bnck", cv, trans).reshape(B, N, -1)
        net = jnp.concatenate([x_l, cs, concat_v], axis=-1)

        for name in ("convs1", "convs2", "convs3"):
            net = self._conv_bn_relu(name, net)
        return _linear_eval(p["convs4"], net, False, False)

    def __call__(self, points: jax.Array, label: jax.Array) -> jax.Array:
        return self._jit_forward(points, label)
