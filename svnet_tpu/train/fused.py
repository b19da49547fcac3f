"""Fused TRAIN-mode forward for SV-DGCNN classification and part seg.

Functional twins of ``SV_DGCNN_CLS.apply(..., train=True, mutable=
['batch_stats'])`` (and the partseg counterpart) that route the three
binary DGCNN rounds through the custom-VJP fused round
(ops/pallas/sv_round3_train) — kNN + gather + STE SVBlock + pool per
round stay in VMEM in forward AND backward, removing the (B, N, k, C)
HBM edge-tensor traffic that dominated the XLA train step. Everything
else (first FP round, conv5+, SVFuse taps, label branch, head, BN
running-stats bookkeeping) runs as XLA train twins of the flax layers.

Consumes/produces the EXACT flax trees (params, batch_stats), so
TrainState, checkpoints and the optimizer see no difference. One
documented semantic deviation: the k-max pool's subgradient routes to the
FIRST argmax rank (torch max semantics) instead of jnp.max's equal split
among exact ties — ties are common under binary sign quantization; both
are valid subgradients of the same loss.

Verified against the flax path in tests/test_fused_train.py (logits,
batch-stats updates, src + param gradients, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svnet_tpu import config, ops
from svnet_tpu.nn.sv_layers import EPS, ste_quant8, ste_sign
from svnet_tpu.ops.pallas.sv_first_train import make_fused_first_round
from svnet_tpu.ops.pallas.sv_round3_train import make_fused_round

BN_MOM = 0.9
BN_EPS = 1e-5


def _train_knobs(binary: bool, k: int):
    """Resolve config.train_knobs (knob-aware finetuning) at factory time.

    Returns (reuse, round_k, q8): ``reuse`` in {'none','conv2','spatial'},
    ``round_k(name)`` the effective neighbour count for a trunk round
    (reuse rounds run at config.reuse_k), ``q8`` whether each binary
    round's input is STE-fake-quantized to the serving gather's int8 grid.
    Semantics mirror the inference engines (infer.py::_trunk_round3):
    'spatial' reuses the FIRST round's xyz winners for conv2-4, 'conv2'
    runs conv2's own full-k feature-space selection and reuses it for
    conv3/conv4; reuse rounds consume the nearest reuse_k ranks."""
    on = config.train_knobs and binary
    reuse = config.graph_reuse if on else "none"
    rk = config.reuse_k if on else 0
    q8 = on and config.approx_gather_bits == 8

    def round_k(name: str) -> int:
        is_reuse = reuse == "spatial" or (reuse == "conv2" and name != "conv2")
        return rk if (is_reuse and 0 < rk < k) else k

    return reuse, round_k, q8


def _dropout(rng, x, rate):
    """flax nn.Dropout train twin (inverted dropout). The mask stream is
    this module's own (split from the step rng) — dropout is noise, so
    mask-level parity with the flax path is neither possible nor needed."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _bn_train(p, st, x):
    """torch-BN1d train twin: normalize with biased batch stats over all
    leading axes; returns (y, new running stats)."""
    red = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=red)
    var = jnp.maximum(jnp.mean(x * x, axis=red) - mu * mu, 0.0)
    inv = 1.0 / jnp.sqrt(var + BN_EPS)
    y = (x - mu) * inv * p["scale"] + p["bias"]
    sg = jax.lax.stop_gradient
    new = {
        "mean": BN_MOM * st["mean"] + (1 - BN_MOM) * sg(mu),
        "var": BN_MOM * st["var"] + (1 - BN_MOM) * sg(var),
    }
    return y, new


def _stats_update(st, mu, var):
    sg = jax.lax.stop_gradient
    return {
        "mean": BN_MOM * st["mean"] + (1 - BN_MOM) * sg(mu),
        "var": BN_MOM * st["var"] + (1 - BN_MOM) * sg(var),
    }


def _linear_train(p, x, bw, ba):
    kernel = p["kernel"]
    if not bw and not ba:
        y = x @ kernel
    else:
        if ba:
            x = ste_sign(x + p["beta"])
        w = ste_sign(kernel) if bw else kernel
        y = (x @ w) * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _v2s_train(p, v, bw):
    # Vector2Scalar: z = Linear(v) (bw-binarized iff the scale param
    # exists, i.e. the block is binary), s[..., c, j] = v.z
    lp = p["linear"]
    w = ste_sign(lp["kernel"]) if "scale" in lp else lp["kernel"]
    z = v @ w
    if "scale" in lp:
        z = z * lp["scale"]
    s = sum(v[..., i, :, None] * z[..., i, None, :] for i in range(3))
    return s.reshape(s.shape[:-2] + (-1,))


def _vector_bn_train(p, st, v):
    nsq = jnp.maximum(jnp.sum(v * v, axis=-2), 1e-12)
    norm = jnp.sqrt(nsq) + EPS
    nbn, new = _bn_train(p["bn"], st["bn"], norm)
    return v / norm[..., None, :] * nbn[..., None, :], {"bn": new}


def _svblock_train(p, st, x, binary):
    """XLA train twin of svl.SVBlock (used for conv1/conv5 where the edge
    axis is absent or full precision)."""
    s, v = x
    B = s.shape[0]
    s_mean = jnp.mean(s.reshape(B, -1, s.shape[-1]), axis=1)
    g = jax.nn.relu(s_mean @ p["gate_fc1"]["kernel"])
    g = jax.nn.sigmoid(g @ p["gate_fc2"]["kernel"])
    g = g.reshape((B,) + (1,) * (v.ndim - 2) + (g.shape[-1],))

    sv = _v2s_train(p["v2s"], v, binary)
    s = jnp.concatenate([s, sv], axis=-1)
    s = _linear_train(p["linear1"], s, binary, binary)
    s, new1 = _bn_train(p["bn1"]["bn"], st["bn1"]["bn"], s)
    s = jax.nn.leaky_relu(s, negative_slope=0.2)

    v = _linear_train(p["linear2"], v, binary, False)
    v, new2 = _vector_bn_train(p["bn2"], st["bn2"], v)
    return (s, v * g), {"bn1": {"bn": new1}, "bn2": new2}


def make_fused_train_apply(num_classes: int, k: int, binary: bool = True,
                           interpret: bool = False, dropout: float = 0.5):
    """Returns apply(params, batch_stats, points, dropout_rng) ->
    (logits, new_batch_stats), the fused twin of SV_DGCNN_CLS train mode.

    Dropout note: the reference uses p=0 for binary models (ref
    sv_dgcnn_cls.py:27); the FP model's p=0.5 head dropout (ref :45,:49)
    runs here from the step rng when one is passed (r4 — the FP fused
    path; rng=None skips dropout, which the parity tests use).
    """
    rounds = {
        "conv2": (64 // 2, 64 // 6, 64 // 2, 64 // 6),
        "conv3": (64 // 2, 64 // 6, 128 // 2, 128 // 6),
        "conv4": (128 // 2, 128 // 6, 256 // 2, 256 // 6),
    }
    reuse, round_k, q8 = _train_knobs(binary, k)
    fused = {
        name: make_fused_round(S, V, So, Vo, round_k(name), binary=binary,
                               interpret=interpret)
        for name, (S, V, So, Vo) in rounds.items()
    }
    S1, V1 = rounds["conv2"][0], rounds["conv2"][1]
    first = make_fused_first_round(S1, V1, k, interpret=interpret)
    SUB = ("v2s", "linear1", "bn1", "linear2", "bn2")

    def apply(params, batch_stats, points, rng=None):
        p, bs = params, batch_stats
        B, N = points.shape[0], points.shape[1]
        new_stats = {}

        # round 1 (FP): fused first-round kernel (kNN indices from the
        # same exact top-k as the flax path; points carry no gradient)
        idx0 = ops.knn(points, k)
        sub1 = {"init_scalar": p["init_scalar"],
                **{kk: p["conv1"][kk] for kk in SUB}}
        s1o, v1_ung, s_mean1, (mu1, var1, mun1, varn1) = first(
            points, idx0, sub1
        )
        g1 = jax.nn.relu(s_mean1 @ p["conv1"]["gate_fc1"]["kernel"])
        g1 = jax.nn.sigmoid(g1 @ p["conv1"]["gate_fc2"]["kernel"])
        x1 = (s1o, v1_ung.reshape(B, N, 3, V1) * g1[:, None, None, :])
        new_stats["conv1"] = {
            "bn1": {"bn": _stats_update(bs["conv1"]["bn1"]["bn"], mu1, var1)},
            "bn2": {"bn": _stats_update(bs["conv1"]["bn2"]["bn"], mun1, varn1)},
        }

        wins = idx0 if reuse == "spatial" else None  # (B, N, k) rank-major
        outs = [x1]
        for name, (S, V, So, Vo) in rounds.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate([s_in, v_in.reshape(B, N, -1)], axis=-1)
            if wins is not None:  # graph reuse: nearest round_k(name) ranks
                idx = wins[:, :, : round_k(name)]
            else:
                idx = ops.knn(joint, k)  # stop-gradient inside
                if reuse == "conv2" and name == "conv2":
                    wins = idx
            if q8:  # serving-gather int8 grid, STE (selection stays exact)
                joint = ste_quant8(joint)
            sub = {kk: p[name][kk] for kk in SUB}
            so, vo_ung, s_mean, (mu1, var1, mun, varn) = fused[name](
                joint, idx, sub
            )
            g = jax.nn.relu(s_mean @ p[name]["gate_fc1"]["kernel"])
            g = jax.nn.sigmoid(g @ p[name]["gate_fc2"]["kernel"])
            vo = vo_ung.reshape(B, N, 3, Vo) * g[:, None, None, :]
            new_stats[name] = {
                "bn1": {"bn": _stats_update(bs[name]["bn1"]["bn"], mu1, var1)},
                "bn2": {"bn": _stats_update(bs[name]["bn2"]["bn"], mun, varn)},
            }
            outs.append((so, vo))

        s_c = jnp.concatenate([o[0] for o in outs], axis=-1)
        v_c = jnp.concatenate([o[1] for o in outs], axis=-1)

        (s5, v5), upd5 = _svblock_train(
            p["conv5"], bs["conv5"], (s_c, v_c), binary=binary
        )
        new_stats["conv5"] = upd5
        x = jnp.concatenate(
            [s5, _v2s_train(p["svfuse"]["v2s"], v5, binary)], axis=-1
        )

        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)],
                            axis=-1)
        drop = (not binary) and rng is not None and dropout > 0.0
        if drop:
            d1, d2 = jax.random.split(rng)
        x = _linear_train(p["linear1"], x, binary, binary)
        x, n1 = _bn_train(p["bn1"]["bn"], bs["bn1"]["bn"], x)
        new_stats["bn1"] = {"bn": n1}
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        if drop:
            x = _dropout(d1, x, dropout)
        x = _linear_train(p["linear2"], x, binary, binary)
        x, n2 = _bn_train(p["bn2"]["bn"], bs["bn2"]["bn"], x)
        new_stats["bn2"] = {"bn": n2}
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        if drop:
            x = _dropout(d2, x, dropout)
        logits = _linear_train(p["linear3"], x, False, False)
        return logits, new_stats

    return apply


def make_fused_train_apply_pseg(num_part: int, k: int, binary: bool = True,
                                interpret: bool = False,
                                dropout: float = 0.5):
    """Returns apply(params, batch_stats, points, label, dropout_rng) ->
    (logits, new_batch_stats), the fused twin of SV_DGCNN_PSEG train mode
    (models/sv_dgcnn.py:111-179; ref sv_dgcnn_partseg.py:40-128).

    The three binary trunk rounds (conv2-4, make_divisible widths) run the
    custom-VJP fused round at N=2048/k=40 shapes; the partseg tail — conv5/
    conv6, the three SVFuse taps, the 16->64 label branch and the conv8-11
    pointwise head — runs as XLA train twins. Dropout is p=0 for binary
    models (ref sv_dgcnn_partseg.py:30); the FP head's p=0.5 dropout after
    conv8/conv9 runs from the step rng when one is passed (r4).
    """
    # make_divisible(8)-rounded partseg widths (models/sv_dgcnn.py:137-150)
    rounds = {
        "conv2": (32, 16, 32, 16),
        "conv3": (32, 16, 64, 24),
        "conv4": (64, 24, 128, 40),
    }
    reuse, round_k, q8 = _train_knobs(binary, k)
    fused = {
        name: make_fused_round(S, V, So, Vo, round_k(name), binary=binary,
                               interpret=interpret)
        for name, (S, V, So, Vo) in rounds.items()
    }
    S1, V1 = rounds["conv2"][0], rounds["conv2"][1]
    first = make_fused_first_round(S1, V1, k, interpret=interpret)
    SUB = ("v2s", "linear1", "bn1", "linear2", "bn2")

    def apply(params, batch_stats, points, label, rng=None):
        p, bs = params, batch_stats
        B, N = points.shape[0], points.shape[1]
        new_stats = {}

        # round 1 (FP): fused first-round kernel (see the cls twin above)
        idx0 = ops.knn(points, k)
        sub1 = {"init_scalar": p["init_scalar"],
                **{kk: p["conv1"][kk] for kk in SUB}}
        s1o, v1_ung, s_mean1, (mu1, var1, mun1, varn1) = first(
            points, idx0, sub1
        )
        g1 = jax.nn.relu(s_mean1 @ p["conv1"]["gate_fc1"]["kernel"])
        g1 = jax.nn.sigmoid(g1 @ p["conv1"]["gate_fc2"]["kernel"])
        x1 = (s1o, v1_ung.reshape(B, N, 3, V1) * g1[:, None, None, :])
        new_stats["conv1"] = {
            "bn1": {"bn": _stats_update(bs["conv1"]["bn1"]["bn"], mu1, var1)},
            "bn2": {"bn": _stats_update(bs["conv1"]["bn2"]["bn"], mun1, varn1)},
        }

        wins = idx0 if reuse == "spatial" else None  # (B, N, k) rank-major
        outs = [x1]
        for name, (S, V, So, Vo) in rounds.items():
            s_in, v_in = outs[-1]
            joint = jnp.concatenate([s_in, v_in.reshape(B, N, -1)], axis=-1)
            if wins is not None:  # graph reuse: nearest round_k(name) ranks
                idx = wins[:, :, : round_k(name)]
            else:
                idx = ops.knn(joint, k)
                if reuse == "conv2" and name == "conv2":
                    wins = idx
            if q8:  # serving-gather int8 grid, STE (selection stays exact)
                joint = ste_quant8(joint)
            sub = {kk: p[name][kk] for kk in SUB}
            so, vo_ung, s_mean, (mu1, var1, mun, varn) = fused[name](
                joint, idx, sub
            )
            g = jax.nn.relu(s_mean @ p[name]["gate_fc1"]["kernel"])
            g = jax.nn.sigmoid(g @ p[name]["gate_fc2"]["kernel"])
            vo = vo_ung.reshape(B, N, 3, Vo) * g[:, None, None, :]
            new_stats[name] = {
                "bn1": {"bn": _stats_update(bs[name]["bn1"]["bn"], mu1, var1)},
                "bn2": {"bn": _stats_update(bs[name]["bn2"]["bn"], mun, varn)},
            }
            outs.append((so, vo))

        s_c = jnp.concatenate([o[0] for o in outs], axis=-1)
        v_c = jnp.concatenate([o[1] for o in outs], axis=-1)

        # per-point fine features: svfuse1 tap on the skip-concat
        x_fine = jnp.concatenate(
            [s_c, _v2s_train(p["svfuse1"]["v2s"], v_c, binary)], axis=-1
        )

        # embedding: conv5 -> (pool over N -> conv6 -> svfuse2) global tap
        # and a per-point svfuse3 -> max-over-N tap
        (s5, v5), upd5 = _svblock_train(
            p["conv5"], bs["conv5"], (s_c, v_c), binary=binary
        )
        new_stats["conv5"] = upd5
        sp, vp = ops.svpool((s5, v5), axis=1, keepdims=True)
        (s6, v6), upd6 = _svblock_train(
            p["conv6"], bs["conv6"], (sp, vp), binary=binary
        )
        new_stats["conv6"] = upd6
        x_pool = jnp.concatenate(
            [s6, _v2s_train(p["svfuse2"]["v2s"], v6, binary)], axis=-1
        )  # (B, 1, ·)
        x_sf3 = jnp.concatenate(
            [s5, _v2s_train(p["svfuse3"]["v2s"], v5, binary)], axis=-1
        )
        x_max = jnp.max(x_sf3, axis=1, keepdims=True)  # (B, 1, ·)

        # label branch: FP 16 -> 64 linear + BN + lrelu
        l = _linear_train(p["conv7"], label, False, False)
        l, n7 = _bn_train(p["bn7"]["bn"], bs["bn7"]["bn"], l)
        new_stats["bn7"] = {"bn": n7}
        l = jax.nn.leaky_relu(l, negative_slope=0.2)[:, None, :]

        g = jnp.concatenate([x_max, x_pool, l], axis=-1)
        g = jnp.broadcast_to(g, (B, N, g.shape[-1]))
        x = jnp.concatenate([g, x_fine], axis=-1)

        # binarizable pointwise head (dropout p=0 in the binary config;
        # FP: p=0.5 after conv8 and conv9 — models/sv_dgcnn.py:174-177)
        drop = (not binary) and rng is not None and dropout > 0.0
        if drop:
            dkeys = jax.random.split(rng)
        for i, name in enumerate(("conv8", "conv9", "conv10")):
            x = _linear_train(p[name]["conv"], x, binary, binary)
            x, nc = _bn_train(p[name]["bn"], bs[name]["bn"], x)
            new_stats[name] = {"bn": nc}
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            if drop and i < 2:
                x = _dropout(dkeys[i], x, dropout)
        logits = _linear_train(p["conv11"], x, False, False)
        return logits, new_stats

    return apply
