"""Fused edge-SVBlock eval kernel — the core TPU-native op of this framework.

One Pallas program per (batch, point-tile) computes an entire DGCNN round
(reference: get_graph_feature_sv -> SVBlock -> svpool over k,
sv_dgcnn_cls.py:55-65) without materializing any (B, N, k, C) tensor in HBM:

  1. neighbour gather as a one-hot matmul on the MXU (idx comes in
     pre-arranged per tile; the (N, k*T) one-hot lives only in VMEM);
  2. edge features [nbr - ctr, ctr] for both streams in VMEM;
  3. Vector2Scalar invariants via three (k*T, 2V) x (2V, 3) matmuls and
     fused multiply-adds (the 3-axis contraction never hits a tiny batched
     matmul);
  4. scalar path: sign(x + beta) (eval binarization, sign(0)=0) -> +-1
     matmul (exact in bf16) -> folded scale*BN affine -> LeakyReLU(0.2);
  5. vector path: (binarized-weight) channel mix -> scale -> VectorBN as
     an exact affine-on-norms -> gate;
  6. svpool: max over k for scalars, mean over k for vectors.

HBM traffic per round drops from ~GBs of padded (B, N, k, 3, V) tensors to
one read of (B, N, S+3V) and one write of the pooled outputs.

The row ordering inside a tile is j-major (r = j*T + t), so the center
repeat is a broadcast-reshape and the pool is a (k, T, C) axis-0 reduction;
``arrange_idx`` pre-permutes the kNN indices to match, and
``fold_svblock_params`` pre-permutes linear1's rows (the reference flattens
Vector2Scalar output c-major/j-minor; the kernel produces j-major/c-minor).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def arrange_idx(idx: jax.Array, T: int) -> jax.Array:
    """(B, N, k) kNN indices -> (B, N//T, k*T) tile-local, j-major rows."""
    B, N, k = idx.shape
    x = idx.transpose(0, 2, 1).reshape(B, k, N // T, T)
    return x.transpose(0, 2, 1, 3).reshape(B, N // T, k * T)


def _sv_edge_kernel(
    src_ref, idx_ref, gate_ref,
    wz_ref, w1_ref, beta_ref, a1_ref, b1_ref,
    w2_ref, scale2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref,
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int, N: int,
    binary: bool, exact: bool,
):
    # ``exact``: f32 one-hot gather — gathered rows are bit-exact f32
    # selections, matching the XLA/flax path (sign() in the binary scalar
    # stream amplifies any rounding into ±1 flips). ``exact=False`` runs the
    # gather and centres in bf16 (~3x cheaper gather matmul); the one bf16
    # cast covers BOTH the gathered rows and the centres, so self-edge
    # differences are still exactly zero.
    gdtype = jnp.float32 if exact else jnp.bfloat16
    src = src_ref[0].astype(gdtype)  # (N, S + 3V)
    idxl = idx_ref[0, 0]  # (1, k*T) int32

    # one-hot gather on the MXU: ohT[m, r] = (m == idx[r])
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, k * T), 0)
    oh = (iota_n == idxl).astype(gdtype)  # (N, k*T)
    nbr = jax.lax.dot_general(
        oh,
        src,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )  # (k*T, C)

    t = pl.program_id(1)
    # ref-level dynamic slice (array-level dynamic_slice is not lowerable)
    ctr = (
        src_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]
        .astype(gdtype)
        .astype(jnp.float32)
    )
    ctr_rep = jnp.broadcast_to(ctr[None], (k, T, S + 3 * V)).reshape(
        k * T, S + 3 * V
    )

    e = nbr - ctr_rep

    def vs(x, i):
        return x[:, S + i * V : S + (i + 1) * V]

    # v_e[i]: (k*T, 2V) edge vectors, channels [diff V | ctr V]
    v_e = [
        jnp.concatenate([vs(e, i), vs(ctr_rep, i)], axis=1) for i in range(3)
    ]

    # Vector2Scalar: z_i = v_e_i @ Wz; sv_j = sum_i v_e_i * z_i[:, j]
    prec = jax.lax.Precision.HIGHEST if exact else None
    wz = wz_ref[:]
    z = [
        jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]  # (k*T, 3) each
    sv = []
    for j in range(3):
        acc = v_e[0] * z[0][:, j : j + 1]
        acc = acc + v_e[1] * z[1][:, j : j + 1]
        acc = acc + v_e[2] * z[2][:, j : j + 1]
        sv.append(acc)  # (k*T, 2V)

    if S > 0:
        s_e = jnp.concatenate([e[:, :S], ctr_rep[:, :S]], axis=1)  # (k*T, 2S)
        x_cat = jnp.concatenate([s_e] + sv, axis=1)  # (k*T, 2S + 6V)
    else:
        x_cat = jnp.concatenate(sv, axis=1)

    if binary:
        # ±1 (or 0) values are exact in bf16; the matmul is exact either way
        xq = jnp.sign(x_cat + beta_ref[:])
        h = jnp.dot(
            xq.astype(jnp.bfloat16),
            w1_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (k*T, S_out)
    else:
        h = jnp.dot(
            x_cat, w1_ref[:], preferred_element_type=jnp.float32, precision=prec
        )
    y = h * a1_ref[:] + b1_ref[:]
    y = jnp.where(y >= 0, y, 0.2 * y)
    s_out_ref[0] = jnp.max(y.reshape(k, T, S_out), axis=0)

    # vector path (weights ±1 when binary, but activations stay real —
    # precision follows the exact flag)
    if exact:
        w2 = w2_ref[:]
        wlin = [
            jnp.dot(v_e[i], w2, preferred_element_type=jnp.float32, precision=prec)
            * scale2_ref[:]
            for i in range(3)
        ]
    else:
        w2 = w2_ref[:].astype(jnp.bfloat16)
        wlin = [
            jnp.dot(
                v_e[i].astype(jnp.bfloat16), w2, preferred_element_type=jnp.float32
            )
            * scale2_ref[:]
            for i in range(3)
        ]  # (k*T, V_out) x3
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = a2_ref[:] + b2_ref[:] / nrm
    gate = gate_ref[0]  # (1, V_out)
    for i in range(3):
        vi = jnp.mean((wlin[i] * f).reshape(k, T, V_out), axis=0) * gate
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = vi


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "V", "S_out", "V_out", "k", "T", "binary", "exact", "interpret"
    ),
)
def sv_edge_block(
    src: jax.Array,     # (B, N, S + 3V) f32: [s | v flat i-major]
    idx: jax.Array,     # (B, N, k) int32 kNN indices
    gate: jax.Array,    # (B, V_out) f32
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int = 64,
    binary: bool = True, exact: bool = True, interpret: bool = False,
):
    """Run the fused round. Returns (s_out (B,N,S_out), v_out (B,N,3*V_out))."""
    B, N, _ = src.shape
    assert N % T == 0, (N, T)
    # 4D with a unit -2 axis so block (1, 1, 1, k*T) satisfies the TPU
    # block-shape rule (penultimate dim equals the array dim)
    idx_arr = arrange_idx(idx, T).reshape(B, N // T, 1, k * T)
    gate3 = gate.reshape(B, 1, V_out)

    kern = functools.partial(
        _sv_edge_kernel,
        S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=T, N=N,
        binary=binary, exact=exact,
    )
    Cin = S + 3 * V
    const = lambda b, t: (0, 0)
    s_out, v_out = pl.pallas_call(
        kern,
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, Cin), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 1, k * T), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, V_out), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * V, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * S + 6 * V, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * S + 6 * V), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * V, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, S_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3 * V_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 * V_out), jnp.float32),
        ),
        interpret=interpret,
    )(
        src,
        idx_arr,
        gate3,
        folded["wz"], folded["w1"], folded["beta"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["scale2"], folded["a2"], folded["b2"],
    )
    return s_out, v_out


def fold_svblock_params(
    params: dict, stats: dict, S: int, V: int, binary: bool
) -> Dict[str, jax.Array]:
    """Fold an SVBlock's flax params + batch_stats into kernel constants.

    Row permutation: the reference concatenates [s_e (2S), v2s-flat c-major
    j-minor (6V)] before linear1; the kernel builds [s_e, j=0 (2V), j=1,
    j=2], so linear1's rows (and beta) are permuted to match.
    """
    eps_bn = 1e-5
    twoV = 2 * V

    perm = list(range(2 * S)) + [
        2 * S + c * 3 + j for j in range(3) for c in range(twoV)
    ]
    perm = jnp.asarray(perm, dtype=jnp.int32)

    w1 = params["linear1"]["kernel"][perm, :]
    if binary:
        beta = params["linear1"]["beta"][perm][None, :]
        w1 = jnp.sign(w1)
        scale1 = params["linear1"]["scale"]
    else:
        beta = jnp.zeros((1, w1.shape[0]), w1.dtype)
        scale1 = jnp.ones((w1.shape[1],), w1.dtype)

    bn1 = params["bn1"]["bn"]
    bs1 = stats["bn1"]["bn"]
    inv1 = bn1["scale"] / jnp.sqrt(bs1["var"] + eps_bn)
    a1 = (scale1 * inv1)[None, :]
    b1 = (bn1["bias"] - bs1["mean"] * inv1)[None, :]

    w2 = params["linear2"]["kernel"]
    if binary:
        scale2 = params["linear2"]["scale"][None, :]
        w2 = jnp.sign(w2)
    else:
        scale2 = jnp.ones((1, w2.shape[1]), w2.dtype)

    bn2 = params["bn2"]["bn"]
    bs2 = stats["bn2"]["bn"]
    inv2 = bn2["scale"] / jnp.sqrt(bs2["var"] + eps_bn)
    a2 = inv2[None, :]
    b2 = (bn2["bias"] - bs2["mean"] * inv2)[None, :]

    wz = params["v2s"]["linear"]["kernel"]
    if binary:
        # v2s Linear is bw-binarized in binary blocks (scale applies too)
        wz = jnp.sign(wz) * params["v2s"]["linear"]["scale"][None, :]

    return {
        "wz": wz, "w1": w1, "beta": beta, "a1": a1, "b1": b1,
        "w2": w2, "scale2": scale2, "a2": a2, "b2": b2,
    }


def svblock_gate(params: dict, s: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-batch gate vector without materializing edge scalars.

    The reference gate (sv_layers.py:179-183) takes the mean of the block's
    *edge* scalars over (N, k). mean(ctr half) = mean_n s; mean(diff half) =
    (degree-weighted mean of s) - mean_n s, with degrees from the kNN index
    histogram.
    """
    B, N, S = s.shape
    k = idx.shape[-1]
    ones = jnp.ones(idx.shape[:2] + (idx.shape[2],), s.dtype)

    def hist(i, o):
        return jnp.zeros((N,), s.dtype).at[i.reshape(-1)].add(o.reshape(-1))

    counts = jax.vmap(hist)(idx, ones)  # (B, N)
    mean_nbr = jnp.einsum("bn,bns->bs", counts, s) / (N * k)
    mean_ctr = jnp.mean(s, axis=1)
    g = jnp.concatenate([mean_nbr - mean_ctr, mean_ctr], axis=-1)  # (B, 2S)
    g = jax.nn.relu(g @ params["gate_fc1"]["kernel"])
    return jax.nn.sigmoid(g @ params["gate_fc2"]["kernel"])
