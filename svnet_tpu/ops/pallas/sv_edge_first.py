"""Fused FIRST-layer round for SV-DGCNN: coords -> (s1, v1).

Covers reference sv_dgcnn_cls.py:49-53 (get_graph_feature -> init_scalar
Vector2Scalar -> conv1 SVBlock (always FP) -> svpool over k) in one Pallas
program per (batch, tile) — the same fusion idea as sv_edge.py but with the
first layer's special structure:

  * vectors come straight from coordinates: v_e has V=1 channel pairs
    [nbr - ctr, ctr] per spatial component;
  * the scalar stream is built in-kernel from TWO Vector2Scalar transforms
    (init_scalar and conv1's own v2s);
  * the gate needs a global mean of the init_scalar edge features, so the
    kernel additionally emits per-tile partial sums; the host computes the
    tiny sigmoid-MLP and applies the gate to the (ungated) vector output —
    gating is elementwise per (batch, channel) and commutes with pooling.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu.ops.pallas.sv_edge import arrange_idx

EPS = 1e-6


def _first_kernel(
    pts_ref, idx_ref,
    wz0_ref, wz1_ref, w1_ref, a1_ref, b1_ref,
    w2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref, ssum_ref,
    *, S_out: int, V_out: int, k: int, T: int, N: int, exact: bool,
):
    gdtype = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    pts = pts_ref[0].astype(gdtype)  # (N, 3)
    idxl = idx_ref[0, 0]  # (1, k*T)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, k * T), 0)
    oh = (iota_n == idxl).astype(gdtype)
    nbr = jax.lax.dot_general(
        oh, pts, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (k*T, 3)

    t = pl.program_id(1)
    ctr = (
        pts_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]
        .astype(gdtype)
        .astype(jnp.float32)
    )
    ctr_rep = jnp.broadcast_to(ctr[None], (k, T, 3)).reshape(k * T, 3)
    e = nbr - ctr_rep

    # v_e per spatial component i: (k*T, 2) = [diff_i, ctr_i]
    v_e = [
        jnp.concatenate([e[:, i : i + 1], ctr_rep[:, i : i + 1]], axis=1)
        for i in range(3)
    ]

    def v2s_pieces(wz):
        z = [
            jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32, precision=prec)
            for i in range(3)
        ]
        out = []
        for j in range(3):
            acc = v_e[0] * z[0][:, j : j + 1]
            acc = acc + v_e[1] * z[1][:, j : j + 1]
            acc = acc + v_e[2] * z[2][:, j : j + 1]
            out.append(acc)  # (k*T, 2)
        return out

    sva = v2s_pieces(wz0_ref[:])  # init_scalar, j-major pieces
    svb = v2s_pieces(wz1_ref[:])  # conv1's own v2s

    # partial sum of init_scalar features for the host-side gate MLP,
    # emitted in the reference's c-major/j-minor channel order [c*3 + j]
    sums = [jnp.sum(sva[j], axis=0, keepdims=True) for j in range(3)]  # (1,2)
    ssum_ref[0, 0] = jnp.concatenate(
        [sums[j][:, c : c + 1] for c in range(2) for j in range(3)], axis=1
    )  # (1, 6)

    x_cat = jnp.concatenate(sva + svb, axis=1)  # (k*T, 12), j-major layout
    h = jnp.dot(
        x_cat, w1_ref[:], preferred_element_type=jnp.float32, precision=prec
    )  # (k*T, S_out)
    y = h * a1_ref[:] + b1_ref[:]
    y = jnp.where(y >= 0, y, 0.2 * y)
    s_out_ref[0] = jnp.max(y.reshape(k, T, S_out), axis=0)

    w2 = w2_ref[:]
    wlin = [
        jnp.dot(v_e[i], w2, preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]  # (k*T, V_out)
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = a2_ref[:] + b2_ref[:] / nrm
    for i in range(3):
        vi = jnp.mean((wlin[i] * f).reshape(k, T, V_out), axis=0)
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = vi


@functools.partial(
    jax.jit, static_argnames=("S_out", "V_out", "k", "T", "exact", "interpret")
)
def sv_edge_first_block(
    points: jax.Array,  # (B, N, 3)
    idx: jax.Array,     # (B, N, k)
    folded: Dict[str, jax.Array],
    *, S_out: int, V_out: int, k: int, T: int = 64,
    exact: bool = True, interpret: bool = False,
):
    """Fused first round. Returns (s_out (B,N,S_out), v_out UNGATED
    (B,N,3*V_out), s_mean (B, 6) mean of init_scalar edge features)."""
    B, N, _ = points.shape
    assert N % T == 0
    idx_arr = arrange_idx(idx, T).reshape(B, N // T, 1, k * T)

    kern = functools.partial(
        _first_kernel, S_out=S_out, V_out=V_out, k=k, T=T, N=N, exact=exact
    )
    const = lambda b, t: (0, 0)
    s_out, v_out, ssum = pl.pallas_call(
        kern,
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 1, k * T), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((2, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((12, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, S_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3 * V_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 6), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 * V_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 1, 6), jnp.float32),
        ),
        interpret=interpret,
    )(
        points, idx_arr,
        folded["wz0"], folded["wz1"], folded["w1"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["a2"], folded["b2"],
    )
    s_mean = jnp.sum(ssum[:, :, 0, :], axis=1) / (N * k)  # (B, 6)
    return s_out, v_out, s_mean


def fold_first_params(
    init_scalar: dict, conv1: dict, stats_conv1: dict, n_ch: int = 2
) -> Dict[str, jax.Array]:
    """Fold init_scalar + conv1 (always FP) params into kernel constants.

    linear1's 12 input rows are [init_scalar flat (c*3+j) | v2s flat]; the
    kernel builds [init j-major | v2s j-major], so rows are permuted with
    c-major->j-major within each 6-row half. linear2's scale2 does not
    exist (FP), and VectorBN's affine is folded as in sv_edge.
    """
    eps_bn = 1e-5

    def perm_half(offset):
        return [offset + c * 3 + j for j in range(3) for c in range(n_ch)]

    perm = jnp.asarray(
        perm_half(0) + perm_half(3 * n_ch), dtype=jnp.int32
    )
    w1 = conv1["linear1"]["kernel"][perm, :]

    bn1 = conv1["bn1"]["bn"]
    bs1 = stats_conv1["bn1"]["bn"]
    inv1 = bn1["scale"] / jnp.sqrt(bs1["var"] + eps_bn)
    a1 = inv1[None, :]
    b1 = (bn1["bias"] - bs1["mean"] * inv1)[None, :]

    bn2 = conv1["bn2"]["bn"]
    bs2 = stats_conv1["bn2"]["bn"]
    inv2 = bn2["scale"] / jnp.sqrt(bs2["var"] + eps_bn)

    return {
        "wz0": init_scalar["linear"]["kernel"],
        "wz1": conv1["v2s"]["linear"]["kernel"],
        "w1": w1,
        "a1": a1,
        "b1": b1,
        "w2": conv1["linear2"]["kernel"],
        "a2": inv2[None, :],
        "b2": (bn2["bias"] - bs2["mean"] * inv2)[None, :],
    }
