"""Fused DIFFERENTIABLE SV-DGCNN round for training (custom-VJP Pallas).

The training step was the last path still paying XLA's edge-tensor
materialization: each round wrote (B, N, k, 2S+6V)-class tensors to HBM
several times in forward AND backward (~325 MB each at cls shapes), which
dominated the measured 163 ms/step (r3 profile: graph-build+gather
fwd+bwd is only ~8 ms/round; the rest is block math traffic). This module
keeps every edge tensor in VMEM with the sv_round3 transposed layout and
differentiates through the whole round with a custom VJP.

Semantics replicated EXACTLY from the flax train path (nn/sv_layers.py
SVBlock with train=True; reference models/sv_layers.py:151-196):

  * edges from precomputed (stop-gradient) kNN indices: s_f = [nbr-ctr,
    ctr] on both streams (ops/graph.py::get_graph_feature_sv);
  * binary: xq = ste_sign(x + beta) (fwd sign, bwd clip(+-1.2) mask),
    weights sign with the same STE, learned per-output scale;
  * BatchNorm train mode: batch stats over ALL edges (B*N*k), biased
    variance, running-stats update handled by the caller from this
    module's stat outputs (momentum rule stays in XLA);
  * VectorBN: BN over vector norms (floored nsq, see sv_layers.py), the
    direction untouched;
  * svpool: max over k (scalars; cotangent routed to the argmax rank),
    mean over k (vectors). The sigmoid gate stays in XLA (it commutes
    with the mean-pool); this op returns the per-sample edge-scalar SUM
    so the gate input and its gradient flow through the VJP.

Structure (BN batch stats force two passes in each direction):
  forward : F1 kernel (sum/sumsq of h and of vector norms, + edge-scalar
            sums) -> XLA batch stats -> F2 kernel (outputs + argmax ranks)
  backward: B1 kernel (BN-backward global sums) -> XLA reduce -> B2 kernel
            (input grads via transposed one-hot scatter matmuls + all
            param-grad partials, accumulated across the grid)

Everything is recomputed per pass from src + indices (flash-attention-
style rematerialization); the exact bit-plane gather guarantees the
recomputed values are IDENTICAL across passes.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu.ops.pallas.sv_round3 import (
    _decode_exact_t,
    _plane_stride_t,
    _round3_tiles,
    pack_planes_exact_t,
)

EPS = 1e-6
_CLIP = 1.2
_NSQ_FLOOR = 1e-12


def _leaky(y):
    return jnp.where(y >= 0, y, 0.2 * y)


def _lane_sum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _train_round_kernel(
    # refs (order fixed; cotangent/stat refs are zeros placeholders in
    # phases that don't use them — Mosaic requires a static ref list)
    srcT_ref, planesT_ref, idxT_ref, idx_ref,
    wzq_ref, scalez_ref, w1qT_ref, w1q_ref, beta_ref, scale1_ref,
    g1_ref, bb1_ref, mu1_ref, inv1_ref,
    w2qT_ref, w2q_ref, scale2_ref, g2_ref, bb2_ref, mun_ref, invn_ref,
    dso_ref, dvo_ref, kmax_ref, dssum_ref,
    s1_ref, s2_ref, s3_ref, s4_ref,
    *outs,
    S: int, V: int, S_out: int, V_out: int, k: int, R: int, T: int, N: int,
    binary: bool, phase: str,
):
    C = S + 3 * V
    IN1 = 2 * S + 6 * V
    b = pl.program_id(0)
    t = pl.program_id(1)
    first_prog = (b == 0) & (t == 0)

    ctrT = srcT_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]  # (C, T)
    planesT = planesT_ref[0]
    rowsN = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    if phase == "b2":
        colsN = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)

    ctr_s = ctrT[0:S, :]
    ctr_v = [ctrT[S + i * V : S + (i + 1) * V, :] for i in range(3)]
    wzcols = [wzq_ref[:, j : j + 1] for j in range(3)]  # (2V, 1)
    # BN sums run over B*N*k; programs accumulate raw sums and the XLA
    # wrapper divides (b2 receives the PRE-DIVIDED globals in s*_ref).

    # accumulators
    if phase == "f1":
        hsum = jnp.zeros((S_out, 1), jnp.float32)
        hsq = jnp.zeros((S_out, 1), jnp.float32)
        nsum = jnp.zeros((V_out, 1), jnp.float32)
        nsqs = jnp.zeros((V_out, 1), jnp.float32)
        sssum = jnp.zeros((max(2 * S, 1), 1), jnp.float32)
    elif phase == "f2":
        s_acc = None
        karg = None
        v_acc = [None, None, None]
    elif phase == "b1":
        dysum = jnp.zeros((S_out, 1), jnp.float32)
        dyxh = jnp.zeros((S_out, 1), jnp.float32)
        dnbsum = jnp.zeros((V_out, 1), jnp.float32)
        dnbnh = jnp.zeros((V_out, 1), jnp.float32)
    else:  # b2
        dsrc_acc = jnp.zeros((C, T), jnp.float32)  # ctr-path grads (local)
        scat = None  # (C, N) neighbour-path grads
        dW1 = jnp.zeros((IN1, S_out), jnp.float32)
        dW2 = jnp.zeros((2 * V, V_out), jnp.float32)
        dWZ = [jnp.zeros((2 * V, 1), jnp.float32) for _ in range(3)]
        dbeta = jnp.zeros((IN1, 1), jnp.float32)
        dsc1 = jnp.zeros((S_out, 1), jnp.float32)
        dsc2 = jnp.zeros((V_out, 1), jnp.float32)
        dscz = [jnp.zeros((1, 1), jnp.float32) for _ in range(3)]

    for chunk in range(k // R):
        # ---- gather R ranks into channel-major (C, L) ----
        # concat the TINY (1, T) winner rows, ONE wide compare + one-hot
        # matmul + decode (bitwise the per-rank dots' — matmul columns are
        # independent; mask-copy analysis in sv_round3.gather_dots, r3.3)
        masks_tn = []
        idx_rows = []
        for r in range(R):
            j = chunk * R + r
            idx_rows.append(
                idxT_ref[0, j : j + 1, pl.ds(pl.multiple_of(t * T, T), T)]
            )
            if phase == "b2":
                idx_col = idx_ref[0, pl.ds(pl.multiple_of(t * T, T), T), j : j + 1]
                masks_tn.append((colsN == idx_col).astype(jnp.bfloat16))  # (T, N)
        win_wide = jnp.concatenate(idx_rows, axis=1)  # (1, R*T)
        gg = jax.lax.dot_general(
            planesT, (rowsN == win_wide).astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (4*stride, R*T)
        nbrT = _decode_exact_t(gg, C)  # (C, L)
        L = R * T
        ctr_rep = jnp.tile(ctrT, (1, R))
        e = nbrT - ctr_rep

        v_e = [
            jnp.concatenate(
                [e[S + i * V : S + (i + 1) * V, :], jnp.tile(ctr_v[i], (1, R))],
                axis=0,
            )
            for i in range(3)
        ]  # (2V, L)
        if S > 0:
            s_e = jnp.concatenate([e[0:S, :], jnp.tile(ctr_s, (1, R))], axis=0)

        # ---- Vector2Scalar ----
        z_raw = [
            [jnp.sum(v_e[i] * wzcols[j], axis=0, keepdims=True) for j in range(3)]
            for i in range(3)
        ]  # (1, L)
        z = [
            [z_raw[i][j] * scalez_ref[0:1, j : j + 1] for j in range(3)]
            for i in range(3)
        ]
        sv = []
        for jj in range(3):
            acc = v_e[0] * z[0][jj] + v_e[1] * z[1][jj] + v_e[2] * z[2][jj]
            sv.append(acc)  # (2V, L)

        parts = ([s_e] if S > 0 else []) + sv
        x_cat = jnp.concatenate(parts, axis=0)  # (IN1, L)

        # ---- linear1 (+STE) ----
        if binary:
            xb = x_cat + beta_ref[:]
            xq = jnp.sign(xb)
            # +-1 x +-1 operands: bf16 MXU matmul is exact
            h_raw = jax.lax.dot_general(
                w1qT_ref[:].astype(jnp.bfloat16), xq.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            xq = x_cat
            h_raw = jax.lax.dot_general(
                w1qT_ref[:], xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        h = h_raw * scale1_ref[:]  # (S_out, L)

        # ---- linear2 (vector stream) ----
        v2_raw = [
            jax.lax.dot_general(
                w2qT_ref[:], v_e[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i in range(3)
        ]  # (V_out, L)
        v2 = [vr * scale2_ref[:] for vr in v2_raw]
        nsq = v2[0] * v2[0] + v2[1] * v2[1] + v2[2] * v2[2]
        nsqf = jnp.maximum(nsq, _NSQ_FLOOR)
        sq = jnp.sqrt(nsqf)
        n = sq + EPS  # (V_out, L)

        if phase == "f1":
            hsum += _lane_sum(h)
            hsq += _lane_sum(h * h)
            nsum += _lane_sum(n)
            nsqs += _lane_sum(n * n)
            if S > 0:
                sssum += _lane_sum(s_e)
            continue

        if phase == "f2":
            xhat = (h - mu1_ref[:]) * inv1_ref[:]
            y = _leaky(g1_ref[:] * xhat + bb1_ref[:])  # (S_out, L)
            nbn = g2_ref[:] * ((n - mun_ref[:]) * invn_ref[:]) + bb2_ref[:]
            w = nbn / n
            for r in range(R):
                j = chunk * R + r
                ys = y[:, r * T : (r + 1) * T]
                if s_acc is None:
                    s_acc = ys
                    karg = jnp.zeros((S_out, T), jnp.int32)
                else:
                    upd = ys > s_acc
                    s_acc = jnp.where(upd, ys, s_acc)
                    karg = jnp.where(upd, j, karg)
            for i in range(3):
                vi = v2[i] * w
                vs = vi[:, 0:T]
                for r in range(1, R):
                    vs = vs + vi[:, r * T : (r + 1) * T]
                v_acc[i] = vs if v_acc[i] is None else v_acc[i] + vs
            continue

        # ---- backward phases: shared recompute of dy / dnbn ----
        xhat = (h - mu1_ref[:]) * inv1_ref[:]
        ybn = g1_ref[:] * xhat + bb1_ref[:]
        lmask = jnp.where(ybn >= 0, 1.0, 0.2)
        nhat = (n - mun_ref[:]) * invn_ref[:]
        nbn = g2_ref[:] * nhat + bb2_ref[:]
        w = nbn / n

        dso_t = dso_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]  # (S_out, T)
        kmax_t = kmax_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]
        dvo_t = [
            dvo_ref[0, V_out * i : V_out * (i + 1),
                    pl.ds(pl.multiple_of(t * T, T), T)]
            for i in range(3)
        ]  # (V_out, T) — cotangent of the k-MEAN (w/o gate), so per-edge
        # contribution is dvo/k

        dy_cols = []
        for r in range(R):
            j = chunk * R + r
            dy_cols.append(jnp.where(kmax_t == j, dso_t, 0.0))
        dy = jnp.concatenate(dy_cols, axis=1) * lmask  # (S_out, L)

        inv_k = jnp.float32(1.0 / k)
        dout = [jnp.tile(dvo_t[i], (1, R)) * inv_k for i in range(3)]
        G = dout[0] * v2[0] + dout[1] * v2[1] + dout[2] * v2[2]  # (V_out, L)
        dnbn = G / n

        if phase == "b1":
            dysum += _lane_sum(dy)
            dyxh += _lane_sum(dy * xhat)
            dnbsum += _lane_sum(dnbn)
            dnbnh += _lane_sum(dnbn * nhat)
            continue

        # ---- b2: full gradient chain ----
        # BN1 backward (s*_ref carry the PRE-DIVIDED global means:
        # s1 = E[dy], s2 = E[dy*xhat], s3 = E[dnbn], s4 = E[dnbn*nhat])
        dh = g1_ref[:] * inv1_ref[:] * (dy - s1_ref[:] - xhat * s2_ref[:])
        dh_raw = dh * scale1_ref[:]
        dsc1 += _lane_sum(dh * h_raw)
        dxq = jax.lax.dot_general(
            w1q_ref[:], dh_raw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (IN1, L)
        dW1 += jax.lax.dot_general(
            xq, dh_raw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (IN1, S_out)
        if binary:
            clipm = (jnp.abs(xb) <= _CLIP).astype(jnp.float32)
            dx_cat = dxq * clipm
            dbeta += _lane_sum(dx_cat)
        else:
            dx_cat = dxq

        # VectorBN backward
        dn = g2_ref[:] * invn_ref[:] * (dnbn - s3_ref[:] - nhat * s4_ref[:])
        dn = dn - G * nbn / (n * n)
        floorm = (nsq > _NSQ_FLOOR).astype(jnp.float32)
        dnsq_fac = dn / sq * floorm  # d(n)/d(v2_i) = v2_i / sq
        dv2 = [dout[i] * w + dnsq_fac * v2[i] for i in range(3)]
        dv2_raw = [dv2[i] * scale2_ref[:] for i in range(3)]
        for i in range(3):
            dsc2 += _lane_sum(dv2[i] * v2_raw[i])

        dv_e = [
            jax.lax.dot_general(
                w2q_ref[:], dv2_raw[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i in range(3)
        ]  # (2V, L)
        for i in range(3):
            dW2 += jax.lax.dot_general(
                v_e[i], dv2_raw[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # v2s backward: dx_cat rows [2S: 2S+6V] are dsv[jj]
        off = 2 * S
        for jj in range(3):
            dsv = dx_cat[off + jj * 2 * V : off + (jj + 1) * 2 * V, :]
            for i in range(3):
                dz = jnp.sum(dsv * v_e[i], axis=0, keepdims=True)  # (1, L)
                dz_raw = dz * scalez_ref[0:1, jj : jj + 1]
                dscz[jj] += jnp.sum(
                    dz * z_raw[i][jj], axis=1, keepdims=True
                )
                dWZ[jj] += _lane_sum(v_e[i] * dz_raw)
                dv_e[i] = dv_e[i] + dsv * z[i][jj] + wzcols[jj] * dz_raw

        # edge-feature backward -> src grads
        dssum_b = dssum_ref[0]  # (2S, 1) per-sample cotangent of s_sum
        if S > 0:
            ds_f = dx_cat[0 : 2 * S, :] + dssum_b
            dnbr_s = ds_f[0:S, :]
            dctr_s = -ds_f[0:S, :] + ds_f[S : 2 * S, :]
        dnbr_rows = []
        dctr_rows = []
        if S > 0:
            dnbr_rows.append(dnbr_s)
            dctr_rows.append(dctr_s)
        for i in range(3):
            dnbr_rows.append(dv_e[i][0:V, :])
            dctr_rows.append(-dv_e[i][0:V, :] + dv_e[i][V : 2 * V, :])
        dnbr = jnp.concatenate(dnbr_rows, axis=0)  # (C, L)
        dctr = jnp.concatenate(dctr_rows, axis=0)  # (C, L)
        for r in range(R):
            dsrc_acc = dsrc_acc + dctr[:, r * T : (r + 1) * T]
            # two-plane bf16 split (hi + residual): the one-hot operand is
            # exact in bf16 and the MXU accumulates in f32 -> ~2^-16-
            # relative scatter grads (same scheme as edge_gather bwd).
            # NOTE (r3.3, measured): fusing the R scatters into one
            # (C, L) @ (L, N) contraction (concat masks_tn) benched
            # NEUTRAL-to-negative on-chip — the mask concat copy eats the
            # deep-matmul win. Kept per-rank.
            dnb = dnbr[:, r * T : (r + 1) * T]
            d_hi = dnb.astype(jnp.bfloat16)
            d_lo = (dnb - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                d_hi, masks_tn[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            contrib += jax.lax.dot_general(
                d_lo, masks_tn[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, N)
            scat = contrib if scat is None else scat + contrib

    # ---- write outputs ----
    if phase == "f1":
        o_h, o_hsq, o_n, o_nsq, o_ss = outs

        @pl.when(first_prog)
        def _():
            o_h[...] = jnp.zeros_like(o_h)
            o_hsq[...] = jnp.zeros_like(o_hsq)
            o_n[...] = jnp.zeros_like(o_n)
            o_nsq[...] = jnp.zeros_like(o_nsq)

        @pl.when(t == 0)
        def _():
            o_ss[...] = jnp.zeros_like(o_ss)

        o_h[...] += hsum
        o_hsq[...] += hsq
        o_n[...] += nsum
        o_nsq[...] += nsqs
        o_ss[0] += sssum
    elif phase == "f2":
        o_s, o_v, o_k = outs
        o_s[0] = s_acc
        o_k[0] = karg
        inv_k = jnp.float32(1.0 / k)
        for i in range(3):
            o_v[0, V_out * i : V_out * (i + 1), :] = v_acc[i] * inv_k
    elif phase == "b1":
        o_dy, o_dyx, o_dnb, o_dnh = outs

        @pl.when(first_prog)
        def _():
            o_dy[...] = jnp.zeros_like(o_dy)
            o_dyx[...] = jnp.zeros_like(o_dyx)
            o_dnb[...] = jnp.zeros_like(o_dnb)
            o_dnh[...] = jnp.zeros_like(o_dnh)

        o_dy[...] += dysum
        o_dyx[...] += dyxh
        o_dnb[...] += dnbsum
        o_dnh[...] += dnbnh
    else:
        (o_dsrc, o_dw1, o_dw2, o_dwz, o_dbeta, o_dsc1, o_dsc2, o_dscz) = outs

        @pl.when(t == 0)
        def _():
            o_dsrc[...] = jnp.zeros_like(o_dsrc)

        @pl.when(first_prog)
        def _():
            o_dw1[...] = jnp.zeros_like(o_dw1)
            o_dw2[...] = jnp.zeros_like(o_dw2)
            o_dwz[...] = jnp.zeros_like(o_dwz)
            o_dbeta[...] = jnp.zeros_like(o_dbeta)
            o_dsc1[...] = jnp.zeros_like(o_dsc1)
            o_dsc2[...] = jnp.zeros_like(o_dsc2)
            o_dscz[...] = jnp.zeros_like(o_dscz)

        o_dsrc[0] += scat
        cur = o_dsrc[0, :, pl.ds(pl.multiple_of(t * T, T), T)]
        o_dsrc[0, :, pl.ds(pl.multiple_of(t * T, T), T)] = cur + dsrc_acc
        o_dw1[...] += dW1
        o_dw2[...] += dW2
        o_dwz[...] += jnp.concatenate(dWZ, axis=1)
        o_dbeta[...] += dbeta
        o_dsc1[...] += dsc1
        o_dsc2[...] += dsc2
        o_dscz[...] += jnp.concatenate(dscz, axis=1)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _call_phase(
    phase, srcT, planesT, idxT, idx, kp, extras, out_shape, out_specs,
    *, S, V, S_out, V_out, k, R, T, N, binary, interpret,
):
    """Invoke one phase. kp: kernel-param dict; extras: (dso, dvo, kmax,
    dssum, s1..s4) — zeros dummies where unused."""
    B = srcT.shape[0]
    C = S + 3 * V
    IN1 = 2 * S + 6 * V
    PC = 4 * _plane_stride_t(C)
    twoV = 2 * V
    const = lambda b, t: (0, 0)
    const3 = lambda b, t: (0, 0, 0)

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        bspec((1, C, N), lambda b, t: (b, 0, 0)),
        bspec((1, PC, N), lambda b, t: (b, 0, 0)),
        bspec((1, k, N), lambda b, t: (b, 0, 0)),
        bspec((1, N, k), lambda b, t: (b, 0, 0)),
        bspec((twoV, 3), const),
        bspec((1, 3), const),
        bspec((S_out, IN1), const),
        bspec((IN1, S_out), const),
        bspec((IN1, 1), const),
        bspec((S_out, 1), const),
        bspec((S_out, 1), const),
        bspec((S_out, 1), const),
        bspec((S_out, 1), const),
        bspec((S_out, 1), const),
        bspec((V_out, twoV), const),
        bspec((twoV, V_out), const),
        bspec((V_out, 1), const),
        bspec((V_out, 1), const),
        bspec((V_out, 1), const),
        bspec((V_out, 1), const),
        bspec((V_out, 1), const),
    ]
    # cotangents / saved / reduced (zeros dummies where the phase ignores
    # them): the first four are per-sample (B, ., .), the last four global
    for x in extras[:4]:
        in_specs.append(bspec((1,) + x.shape[1:], lambda b, t: (b, 0, 0)))
    for x in extras[4:]:
        in_specs.append(bspec(x.shape, const))
    return pl.pallas_call(
        functools.partial(
            _train_round_kernel,
            S=S, V=V, S_out=S_out, V_out=V_out, k=k, R=R, T=T, N=N,
            binary=binary, phase=phase,
        ),
        grid=(B, N // T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        srcT, planesT, idxT, idx,
        kp["wzq"], kp["scalez"], kp["w1qT"], kp["w1q"], kp["beta"],
        kp["scale1"], kp["g1"], kp["bb1"], kp["mu1"], kp["inv1"],
        kp["w2qT"], kp["w2q"], kp["scale2"], kp["g2"], kp["bb2"],
        kp["mun"], kp["invn"],
        *extras,
    )


@functools.lru_cache(maxsize=64)
def make_fused_round(
    S: int, V: int, S_out: int, V_out: int, k: int,
    binary: bool = True, interpret: bool = False, bn_eps: float = 1e-5,
):
    """Factory: a custom-VJP fused training round for one config.

    Returned fn(src, idx, params) ->
        (s_out (B,N,S_out), v_out_ungated (B,N,3V_out), s_mean (B,2S),
         (bn1_mean, bn1_var, bnn_mean, bnn_var))
    differentiable in src and params; idx (B, N, k) int32 is
    non-differentiable (kNN indices are piecewise constant). ``params`` is
    the flax SVBlock param subtree {v2s, linear1, bn1, linear2, bn2}
    (gate params excluded — the gate runs in XLA on s_mean). The batch
    stats 4-tuple is the BIASED batch statistics for the caller's
    running-stats update (zero cotangent).
    """
    C = S + 3 * V
    IN1 = 2 * S + 6 * V
    twoV = 2 * V

    # the kernel builds x_cat rows [s_e (2S) | sv j=0 (2V) | j=1 | j=2]
    # (j-major); flax's Vector2Scalar emits c-major (c*3+j) — permute w1/
    # beta rows in, un-permute their grads out (same as the inference
    # fold, sv_edge.fold_svblock_params)
    _perm = np.asarray(
        list(range(2 * S))
        + [2 * S + c * 3 + j for j in range(3) for c in range(twoV)],
        dtype=np.int32,
    )
    _inv_perm = np.argsort(_perm).astype(np.int32)

    def kernel_params(params, mu1, inv1, mun, invn):
        col = lambda x: x.reshape(-1, 1)
        wz = params["v2s"]["linear"]["kernel"]
        w1 = params["linear1"]["kernel"][_perm, :]
        w2 = params["linear2"]["kernel"]
        if binary:
            wzq = jnp.sign(wz)
            scalez = params["v2s"]["linear"]["scale"].reshape(1, 3)
            w1q = jnp.sign(w1)
            beta = col(params["linear1"]["beta"][_perm])
            scale1 = col(params["linear1"]["scale"])
            w2q = jnp.sign(w2)
            scale2 = col(params["linear2"]["scale"])
        else:
            wzq = wz
            scalez = jnp.ones((1, 3), jnp.float32)
            w1q = w1
            beta = jnp.zeros((IN1, 1), jnp.float32)
            scale1 = jnp.ones((S_out, 1), jnp.float32)
            w2q = w2
            scale2 = jnp.ones((V_out, 1), jnp.float32)
        return {
            "wzq": wzq, "scalez": scalez,
            "w1qT": jnp.swapaxes(w1q, 0, 1), "w1q": w1q,
            "beta": beta, "scale1": scale1,
            "g1": col(params["bn1"]["bn"]["scale"]),
            "bb1": col(params["bn1"]["bn"]["bias"]),
            "mu1": mu1, "inv1": inv1,
            "w2qT": jnp.swapaxes(w2q, 0, 1), "w2q": w2q,
            "scale2": scale2,
            "g2": col(params["bn2"]["bn"]["scale"]),
            "bb2": col(params["bn2"]["bn"]["bias"]),
            "mun": mun, "invn": invn,
        }

    def dummies(B):
        z = jnp.zeros
        return (
            z((B, S_out, 8), jnp.float32),   # dso
            z((B, 3 * V_out, 8), jnp.float32),  # dvo
            z((B, S_out, 8), jnp.int32),     # kmax
            z((B, max(2 * S, 1), 1), jnp.float32),  # dssum
            z((S_out, 1), jnp.float32), z((S_out, 1), jnp.float32),
            z((V_out, 1), jnp.float32), z((V_out, 1), jnp.float32),
        )

    def prep(src, idx):
        B, N, _ = src.shape
        T, R = _round3_tiles(N, k, C, S, V, S_out, V_out, "exact")
        # the b2 phase holds ~2x the forward's live chunk rows
        R = max(1, R // 2)
        while k % R:
            R -= 1
        srcT = jnp.swapaxes(src, 1, 2)
        planesT = pack_planes_exact_t(srcT)
        idxT = jnp.swapaxes(idx, 1, 2)  # (B, k, N)
        return srcT, planesT, idxT, T, R

    def forward(src, idx, params):
        B, N, _ = src.shape
        srcT, planesT, idxT, T, R = prep(src, idx)
        kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=k, R=R, T=T, N=N,
                  binary=binary, interpret=interpret)
        zero_stat = jnp.zeros((S_out, 1), jnp.float32)
        zero_statn = jnp.zeros((V_out, 1), jnp.float32)
        kp = kernel_params(params, zero_stat, zero_stat, zero_statn,
                           zero_statn)
        const2 = lambda b, t: (0, 0)
        # F1: stats sums
        f1_shape = (
            jax.ShapeDtypeStruct((S_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((S_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((V_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((V_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, max(2 * S, 1), 1), jnp.float32),
        )
        f1_specs = (
            pl.BlockSpec((S_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(2 * S, 1), 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        hsum, hsq, nsum, nsq = None, None, None, None
        hsum, hsq, nsum, nsq, ssum = _call_phase(
            "f1", srcT, planesT, idxT, idx, kp, dummies(B), f1_shape,
            f1_specs, **kw,
        )
        M = B * N * k
        mu1 = hsum / M
        var1 = jnp.maximum(hsq / M - mu1 * mu1, 0.0)
        inv1 = 1.0 / jnp.sqrt(var1 + bn_eps)
        mun = nsum / M
        varn = jnp.maximum(nsq / M - mun * mun, 0.0)
        invn = 1.0 / jnp.sqrt(varn + bn_eps)

        kp = kernel_params(params, mu1, inv1, mun, invn)
        f2_shape = (
            jax.ShapeDtypeStruct((B, S_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 3 * V_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, S_out, N), jnp.int32),
        )
        f2_specs = (
            pl.BlockSpec((1, S_out, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * V_out, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_out, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        )
        s_outT, v_outT, kmax = _call_phase(
            "f2", srcT, planesT, idxT, idx, kp, dummies(B), f2_shape,
            f2_specs, **kw,
        )
        s_mean = ssum[:, :, 0] / (N * k)  # (B, 2S)
        stats = (mu1[:, 0], var1[:, 0], mun[:, 0], varn[:, 0])
        out = (
            jnp.swapaxes(s_outT, 1, 2),
            jnp.swapaxes(v_outT, 1, 2),
            s_mean,
            stats,
        )
        res = (src, idx, params, kmax, mu1, inv1, mun, invn)
        return out, res

    def backward(res, cts):
        src, idx, params, kmax, mu1, inv1, mun, invn = res
        dso_rm, dvo_rm, dsmean, _ = cts
        B, N, _ = src.shape
        srcT, planesT, idxT, T, R = prep(src, idx)
        kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=k, R=R, T=T, N=N,
                  binary=binary, interpret=interpret)
        kp = kernel_params(params, mu1, inv1, mun, invn)
        dso = jnp.swapaxes(dso_rm, 1, 2)  # (B, S_out, N)
        dvo = jnp.swapaxes(dvo_rm, 1, 2)
        dssum = (dsmean / (N * k)).reshape(B, -1, 1)
        if S == 0:
            dssum = jnp.zeros((B, 1, 1), jnp.float32)
        M = B * N * k
        zs = jnp.zeros((S_out, 1), jnp.float32)
        zn = jnp.zeros((V_out, 1), jnp.float32)
        extras = (dso, dvo, kmax, dssum, zs, zs, zn, zn)
        const2 = lambda b, t: (0, 0)
        b1_shape = tuple(
            jax.ShapeDtypeStruct(s, jnp.float32)
            for s in [(S_out, 1), (S_out, 1), (V_out, 1), (V_out, 1)]
        )
        b1_specs = tuple(
            pl.BlockSpec(s, const2, memory_space=pltpu.VMEM)
            for s in [(S_out, 1), (S_out, 1), (V_out, 1), (V_out, 1)]
        )
        dysum, dyxh, dnbsum, dnbnh = _call_phase(
            "b1", srcT, planesT, idxT, idx, kp, extras, b1_shape, b1_specs,
            **kw,
        )
        extras = (dso, dvo, kmax, dssum,
                  dysum / M, dyxh / M, dnbsum / M, dnbnh / M)
        C_ = C
        b2_shape = (
            jax.ShapeDtypeStruct((B, C_, N), jnp.float32),
            jax.ShapeDtypeStruct((IN1, S_out), jnp.float32),
            jax.ShapeDtypeStruct((twoV, V_out), jnp.float32),
            jax.ShapeDtypeStruct((twoV, 3), jnp.float32),
            jax.ShapeDtypeStruct((IN1, 1), jnp.float32),
            jax.ShapeDtypeStruct((S_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((V_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        )
        b2_specs = (
            pl.BlockSpec((1, C_, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IN1, S_out), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((twoV, V_out), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((twoV, 3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((IN1, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), const2, memory_space=pltpu.VMEM),
        )
        dsrcT, dW1q, dW2q, dWZq, dbeta, dsc1, dsc2, dscz = _call_phase(
            "b2", srcT, planesT, idxT, idx, kp, extras, b2_shape, b2_specs,
            **kw,
        )
        dsrc = jnp.swapaxes(dsrcT, 1, 2)

        # un-permute the kernel's j-major linear1 rows back to flax order
        dW1q = dW1q[_inv_perm, :]
        dbeta = dbeta[_inv_perm, :]

        # STE masks for the weight signs + assemble the params-grad tree
        wz = params["v2s"]["linear"]["kernel"]
        w1 = params["linear1"]["kernel"]
        w2 = params["linear2"]["kernel"]
        dparams = {
            "v2s": {"linear": {}},
            "linear1": {},
            "linear2": {},
            "bn1": {"bn": {}},
            "bn2": {"bn": {}},
        }
        if binary:
            dparams["v2s"]["linear"]["kernel"] = dWZq * (jnp.abs(wz) <= _CLIP)
            dparams["v2s"]["linear"]["scale"] = dscz[0]
            dparams["linear1"]["kernel"] = dW1q * (jnp.abs(w1) <= _CLIP)
            dparams["linear1"]["beta"] = dbeta[:, 0]
            dparams["linear1"]["scale"] = dsc1[:, 0]
            dparams["linear2"]["kernel"] = dW2q * (jnp.abs(w2) <= _CLIP)
            dparams["linear2"]["scale"] = dsc2[:, 0]
        else:
            dparams["v2s"]["linear"]["kernel"] = dWZq
            dparams["linear1"]["kernel"] = dW1q
            dparams["linear2"]["kernel"] = dW2q
        dparams["bn1"]["bn"]["scale"] = dyxh[:, 0]
        dparams["bn1"]["bn"]["bias"] = dysum[:, 0]
        dparams["bn2"]["bn"]["scale"] = dnbnh[:, 0]
        dparams["bn2"]["bn"]["bias"] = dnbsum[:, 0]
        return dsrc, dparams

    @jax.custom_vjp
    def fused_round(src, idx, params):
        return forward(src, idx, params)[0]

    def fwd(src, idx, params):
        return forward(src, idx, params)

    def bwd(res, cts):
        dsrc, dparams = backward(res, cts)
        didx = np.zeros(res[1].shape, dtype=jax.dtypes.float0)
        return dsrc, didx, dparams

    fused_round.defvjp(fwd, bwd)
    return fused_round
