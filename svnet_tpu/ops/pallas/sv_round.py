"""Fully-fused SV-DGCNN round: kNN + gather + SVBlock + pool in ONE kernel.

Evolution of sv_edge.py: instead of consuming precomputed kNN indices, each
(batch, point-tile) program computes its own (T, N) negative-distance tile
on the MXU and extracts neighbours one rank at a time. Each masked-argmax
pass yields an exact first-occurrence one-hot mask (T, N) that doubles as
the gather operator (mask @ src on the MXU), so:

  * no (B, N, k) index tensor, no XLA sort, no separate kNN kernel pass;
  * no (k*T, C) edge tensors — per neighbour rank j only (T, C) tiles live,
    and the svpool (max for scalars / mean for vectors) folds online across
    the k ranks;
  * VMEM per program is O(N*C + T*N), independent of k.

Everything else (edge features, Vector2Scalar, eval binarization, folded
BN affines, VectorBN, gate) matches sv_edge.py semantics exactly.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _round_kernel(
    src_ref,
    wz_ref, w1_ref, beta_ref, a1_ref, b1_ref,
    w2_ref, scale2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref, ssum_ref,
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int, N: int,
    binary: bool, exact: bool,
):
    prec = jax.lax.Precision.HIGHEST if exact else None
    gdtype = jnp.float32 if exact else jnp.bfloat16
    C = S + 3 * V

    src = src_ref[0]  # (N, C) f32
    t = pl.program_id(1)
    ctr = src_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]  # (T, C) f32
    if exact:
        # 3-way bf16 split of src: a one-hot (selection) matmul against the
        # three parts reconstructs the full 24-bit f32 mantissa exactly at
        # half the cost of a HIGHEST-precision matmul, and the splits hoist
        # out of the k-rank loop.
        src_hi = src.astype(jnp.bfloat16)
        r1 = src - src_hi.astype(jnp.float32)
        src_mid = r1.astype(jnp.bfloat16)
        src_lo = (r1 - src_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        src_parts = (src_hi, src_mid, src_lo)
        # reconstruct the centres through the same split so self-edge
        # differences are exactly zero
        c_hi = ctr.astype(jnp.bfloat16)
        cr1 = ctr - c_hi.astype(jnp.float32)
        c_mid = cr1.astype(jnp.bfloat16)
        c_lo = (cr1 - c_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        ctr_g = (
            c_hi.astype(jnp.float32)
            + c_mid.astype(jnp.float32)
            + c_lo.astype(jnp.float32)
        )
    else:
        src_parts = (src.astype(jnp.bfloat16),)
        ctr_g = ctr.astype(jnp.bfloat16).astype(jnp.float32)

    # (T, N) negative squared distances on the MXU (HIGHEST in exact mode:
    # near-tie neighbour selection then matches the f32 XLA/reference path)
    inner = jax.lax.dot_general(
        ctr, src, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    tt = jnp.sum(ctr * ctr, axis=1, keepdims=True)
    aa = jnp.sum(src * src, axis=1, keepdims=True).reshape(1, N)
    neg = 2.0 * inner - tt - aa

    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    BIG = jnp.int32(1 << 30)

    if not exact:
        # fast-mode selection: pack a quantized distance (18 bits, relative
        # to the tile's worst distance — comparable to the bf16 gather
        # precision) with the reversed column index (13 bits) into one int32
        # key. One max-reduce then yields a UNIQUE per-row winner (the index
        # bits break ties toward the lowest column, like XLA top_k), so each
        # rank needs 3 (T, N) passes instead of 5.
        worst = jnp.min(neg)  # most negative distance in the tile
        scale = jnp.float32(-(1 << 18)) / jnp.minimum(worst, -1e-12)
        q = jnp.floor(neg * scale).astype(jnp.int32)  # in [-(2^18), 0]
        q = jnp.maximum(q, jnp.int32(-(1 << 18) + 1))  # keep keys > sentinel
        pkey = q * 8192 + (8191 - cols)  # needs N <= 8192
        INT_MIN = jnp.int32(-(2**31) + 1)

    wz = wz_ref[:]
    w1 = w1_ref[:] if not binary else w1_ref[:].astype(jnp.bfloat16)
    w2 = w2_ref[:]
    scale2 = scale2_ref[:]
    a1, b1 = a1_ref[:], b1_ref[:]
    a2, b2 = a2_ref[:], b2_ref[:]

    s_acc = jnp.full((T, S_out), -jnp.inf, jnp.float32)
    v_acc = [jnp.zeros((T, V_out), jnp.float32) for _ in range(3)]
    se_sum = jnp.zeros((1, 2 * S), jnp.float32) if S > 0 else None

    for j in range(k):
        if exact:
            # exact first-occurrence one-hot of the current nearest neighbour
            m = jnp.max(neg, axis=1, keepdims=True)
            cand = jnp.where(neg >= m, cols, BIG)
            amin = jnp.min(cand, axis=1, keepdims=True)
            mask = cols == amin  # (T, N) exactly one True per row
            neg = jnp.where(mask, -jnp.inf, neg)
        else:
            m = jnp.max(pkey, axis=1, keepdims=True)
            mask = pkey == m  # unique per row (index bits)
            pkey = jnp.where(mask, INT_MIN, pkey)

        mask_b = mask.astype(jnp.bfloat16)
        nbr = jax.lax.dot_general(
            mask_b, src_parts[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for part in src_parts[1:]:
            nbr = nbr + jax.lax.dot_general(
                mask_b, part, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # exact f32 row selection
        e = nbr - ctr_g

        v_e = [
            jnp.concatenate(
                [
                    e[:, S + i * V : S + (i + 1) * V],
                    ctr_g[:, S + i * V : S + (i + 1) * V],
                ],
                axis=1,
            )
            for i in range(3)
        ]  # (T, 2V) x3

        z = [
            jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32, precision=prec)
            for i in range(3)
        ]
        sv = []
        for jj in range(3):
            acc = v_e[0] * z[0][:, jj : jj + 1]
            acc = acc + v_e[1] * z[1][:, jj : jj + 1]
            acc = acc + v_e[2] * z[2][:, jj : jj + 1]
            sv.append(acc)

        if S > 0:
            s_e = jnp.concatenate([e[:, :S], ctr_g[:, :S]], axis=1)
            se_sum = se_sum + jnp.sum(s_e, axis=0, keepdims=True)
            x_cat = jnp.concatenate([s_e] + sv, axis=1)
        else:
            x_cat = jnp.concatenate(sv, axis=1)

        if binary:
            xq = jnp.sign(x_cat + beta_ref[:]).astype(jnp.bfloat16)
            h = jnp.dot(xq, w1, preferred_element_type=jnp.float32)
        else:
            h = jnp.dot(x_cat, w1, preferred_element_type=jnp.float32, precision=prec)
        y = h * a1 + b1
        y = jnp.where(y >= 0, y, 0.2 * y)
        s_acc = jnp.maximum(s_acc, y)

        wlin = [
            jnp.dot(v_e[i], w2, preferred_element_type=jnp.float32, precision=prec)
            * scale2
            for i in range(3)
        ]
        nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
        nrm = jnp.sqrt(nsq) + EPS
        f = a2 + b2 / nrm
        for i in range(3):
            v_acc[i] = v_acc[i] + wlin[i] * f

    s_out_ref[0] = s_acc
    inv_k = 1.0 / k
    for i in range(3):
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = v_acc[i] * inv_k
    if S > 0:
        ssum_ref[0, 0] = se_sum
    else:
        ssum_ref[0, 0] = jnp.zeros((1, ssum_ref.shape[-1]), jnp.float32)


def _round_first_kernel(
    pts_ref,
    wz0_ref, wz1_ref, w1_ref, a1_ref, b1_ref,
    w2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref, ssum_ref,
    *, S_out: int, V_out: int, k: int, T: int, N: int, exact: bool,
    cross: bool = False,
):
    """First-layer (coords) variant: dual Vector2Scalar, FP block.

    Mirrors sv_edge_first.py's math with the rank-loop selection/gather of
    _round_kernel. Emits init_scalar partial sums (c-major) for the gate.
    ``cross=True`` adds the cross(nbr, ctr) channel (SV-PointNet's
    get_graph_feature_cross, ref sv_util.py:64-88): v_e has 3 channels per
    component instead of 2.
    """
    n_ch = 3 if cross else 2
    prec = jax.lax.Precision.HIGHEST if exact else None
    pts = pts_ref[0]  # (N, 3)
    t = pl.program_id(1)
    ctr = pts_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]  # (T, 3)
    if exact:
        # coords fit bf16 poorly too; use the same 3-way split
        hi = pts.astype(jnp.bfloat16)
        r1 = pts - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        parts = (hi, mid, lo)
        chi = ctr.astype(jnp.bfloat16)
        cr1 = ctr - chi.astype(jnp.float32)
        cmid = cr1.astype(jnp.bfloat16)
        clo = (cr1 - cmid.astype(jnp.float32)).astype(jnp.bfloat16)
        ctr_g = (
            chi.astype(jnp.float32)
            + cmid.astype(jnp.float32)
            + clo.astype(jnp.float32)
        )
    else:
        parts = (pts.astype(jnp.bfloat16),)
        ctr_g = ctr.astype(jnp.bfloat16).astype(jnp.float32)

    inner = jax.lax.dot_general(
        ctr, pts, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    tt = jnp.sum(ctr * ctr, axis=1, keepdims=True)
    aa = jnp.sum(pts * pts, axis=1, keepdims=True).reshape(1, N)
    neg = 2.0 * inner - tt - aa

    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    BIG = jnp.int32(1 << 30)

    if not exact:
        # packed-key selection (see _round_kernel): 3 passes per rank
        worst = jnp.min(neg)
        scale = jnp.float32(-(1 << 18)) / jnp.minimum(worst, -1e-12)
        q = jnp.floor(neg * scale).astype(jnp.int32)
        q = jnp.maximum(q, jnp.int32(-(1 << 18) + 1))
        pkey = q * 8192 + (8191 - cols)
        INT_MIN = jnp.int32(-(2**31) + 1)

    wz0, wz1 = wz0_ref[:], wz1_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    a1, b1 = a1_ref[:], b1_ref[:]
    a2, b2 = a2_ref[:], b2_ref[:]

    s_acc = jnp.full((T, S_out), -jnp.inf, jnp.float32)
    v_acc = [jnp.zeros((T, V_out), jnp.float32) for _ in range(3)]
    sva_sum = [jnp.zeros((1, n_ch), jnp.float32) for _ in range(3)]

    for j in range(k):
        if exact:
            m = jnp.max(neg, axis=1, keepdims=True)
            cand = jnp.where(neg >= m, cols, BIG)
            amin = jnp.min(cand, axis=1, keepdims=True)
            mask = cols == amin
            neg = jnp.where(mask, -jnp.inf, neg)
        else:
            m = jnp.max(pkey, axis=1, keepdims=True)
            mask = pkey == m
            pkey = jnp.where(mask, INT_MIN, pkey)

        mask_b = mask.astype(jnp.bfloat16)
        nbr = jax.lax.dot_general(
            mask_b, parts[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for part in parts[1:]:
            nbr = nbr + jax.lax.dot_general(
                mask_b, part, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        e = nbr - ctr_g

        if cross:
            nb = [nbr[:, i : i + 1] for i in range(3)]
            cg = [ctr_g[:, i : i + 1] for i in range(3)]
            cr = [
                nb[1] * cg[2] - nb[2] * cg[1],
                nb[2] * cg[0] - nb[0] * cg[2],
                nb[0] * cg[1] - nb[1] * cg[0],
            ]
            v_e = [
                jnp.concatenate(
                    [e[:, i : i + 1], ctr_g[:, i : i + 1], cr[i]], axis=1
                )
                for i in range(3)
            ]  # (T, 3) x3
        else:
            v_e = [
                jnp.concatenate(
                    [e[:, i : i + 1], ctr_g[:, i : i + 1]], axis=1
                )
                for i in range(3)
            ]  # (T, 2) x3

        def pieces(wz):
            z = [
                jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32,
                        precision=prec)
                for i in range(3)
            ]
            out = []
            for jj in range(3):
                acc = v_e[0] * z[0][:, jj : jj + 1]
                acc = acc + v_e[1] * z[1][:, jj : jj + 1]
                acc = acc + v_e[2] * z[2][:, jj : jj + 1]
                out.append(acc)  # (T, 2)
            return out

        sva = pieces(wz0)
        svb = pieces(wz1)
        for jj in range(3):
            sva_sum[jj] = sva_sum[jj] + jnp.sum(sva[jj], axis=0, keepdims=True)

        x_cat = jnp.concatenate(sva + svb, axis=1)  # (T, 12)
        h = jnp.dot(x_cat, w1, preferred_element_type=jnp.float32, precision=prec)
        y = h * a1 + b1
        y = jnp.where(y >= 0, y, 0.2 * y)
        s_acc = jnp.maximum(s_acc, y)

        wlin = [
            jnp.dot(v_e[i], w2, preferred_element_type=jnp.float32, precision=prec)
            for i in range(3)
        ]
        nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
        nrm = jnp.sqrt(nsq) + EPS
        f = a2 + b2 / nrm
        for i in range(3):
            v_acc[i] = v_acc[i] + wlin[i] * f

    s_out_ref[0] = s_acc
    inv_k = 1.0 / k
    for i in range(3):
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = v_acc[i] * inv_k
    # [c*3+j] ordering for the reference gate MLP
    ssum_ref[0, 0] = jnp.concatenate(
        [sva_sum[j][:, c : c + 1] for c in range(n_ch) for j in range(3)],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("S_out", "V_out", "k", "T", "exact", "cross", "interpret"),
)
def sv_round_first(
    points: jax.Array,  # (B, N, 3)
    folded: Dict[str, jax.Array],
    *, S_out: int, V_out: int, k: int, T: int = 256,
    exact: bool = True, cross: bool = False, interpret: bool = False,
):
    """Fully-fused first round (kNN over coords + init_scalar + conv1 + pool).

    Returns (s_out, v_out UNGATED, s_mean (B, 6) for the conv1 gate MLP).
    Weights from sv_edge_first.fold_first_params.
    """
    B, N, _ = points.shape
    assert N % T == 0
    n_ch = 3 if cross else 2
    const = lambda b, t: (0, 0)
    s_out, v_out, ssum = pl.pallas_call(
        functools.partial(
            _round_first_kernel,
            S_out=S_out, V_out=V_out, k=k, T=T, N=N, exact=exact, cross=cross,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * n_ch, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_out), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, S_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3 * V_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 3 * n_ch), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 * V_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 1, 3 * n_ch), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        points,
        folded["wz0"], folded["wz1"], folded["w1"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["a2"], folded["b2"],
    )
    s_mean = jnp.sum(ssum[:, :, 0, :], axis=1) / (N * k)
    return s_out, v_out, s_mean


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "V", "S_out", "V_out", "k", "T", "binary", "exact", "interpret"
    ),
)
def sv_round(
    src: jax.Array,   # (B, N, S + 3V): [s | v flat i-major]
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int = 128,
    binary: bool = True, exact: bool = True, interpret: bool = False,
):
    """Full round: kNN in the joint feature space + SVBlock + svpool.

    Returns (s_out (B, N, S_out), v_out UNGATED (B, N, 3*V_out), and
    s_edge_mean (B, 2S) — the mean of the edge scalars for the host-side
    gate MLP; the caller applies gate * v_out (per-(batch, channel) scaling
    commutes with the kernel's mean-pool).
    """
    B, N, _ = src.shape
    assert N % T == 0
    assert exact or N <= 8192, "fast-mode packed selection needs N <= 8192"
    const = lambda b, t: (0, 0)
    s_out, v_out, ssum = pl.pallas_call(
        functools.partial(
            _round_kernel,
            S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=T, N=N,
            binary=binary, exact=exact,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, S + 3 * V), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
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
            pl.BlockSpec((1, 1, 1, max(2 * S, 1)), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, S_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3 * V_out), jnp.float32),
            jax.ShapeDtypeStruct((B, N // T, 1, max(2 * S, 1)), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        src,
        folded["wz"], folded["w1"], folded["beta"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["scale2"], folded["a2"], folded["b2"],
    )
    s_edge_mean = jnp.sum(ssum[:, :, 0, :], axis=1) / (N * k)  # (B, 2S)
    return s_out, v_out, s_edge_mean

