"""Fused SV-DGCNN round v2: kNN + gather + SVBlock + pool, one kernel.

Redesign of sv_round.py after round-1 profiling showed two walls:

  1. selection cost: the per-rank masked-argmax spent ~5 full (T, N) VPU
     passes per neighbour rank. v2 extracts each rank in 1-2 fused passes:
       * exact: order-preserving int32 keys (IEEE-754 bitcast with the
         sign-fold transform), so one max-reduce finds the winner VALUE and
         one min-where finds its first-occurrence column — f32-exact
         ordering with torch.topk's lowest-index tie-break;
       * fast: 18-bit quantized distance packed with the reversed column
         index into one int32 — the max IS the winner, 1 pass per rank;
       * approx: the fast key folded to L=256 lanes by pairwise max
         (documented recall, see PERF.md) — per-rank passes shrink 4x.
  2. gather cost: the one-hot gather ran 3 separate bf16 matmuls per rank
     (f32-exact 3-way split) at <50% MXU lane utilization. v2 gathers int8
     BYTE PLANES of the source rows in ONE lane-dense int8 matmul per rank
     (int8 MXU = 2x bf16 on v5e):
       * exact: 4 bit-planes of the f32 pattern -> bit-exact f32 rows at
         ~half the MXU time of the old 3-way split;
       * fast: 2 fixed-point planes (int16 per-channel quantization) ->
         ~2^-15 ABSOLUTE error of the per-channel max (tighter than round-1's
         bf16 gather — whose ~2^-8 error is RELATIVE to the value — for
         values within ~2^7 of the channel max; small values see larger
         relative error), at another 2x less MXU time.

The per-edge SVBlock math is batched over (k*T, .) rows after the gather
loop, using whole-array elementwise ops only. Two "obvious" optimizations
were A/B'd on-chip and REJECTED (kept here as a warning): an edge/centre
split with (k, T, .) broadcast-adds loses ~2x to Mosaic relayout copies,
and block-diagonal-combined Vector2Scalar/linear2 matmuls lose ~45% to the
unaligned lane slicing they force on the VPU side.

Semantics (edge features, Vector2Scalar, eval binarization, folded BN
affines, VectorBN, gate contract) match sv_edge.py exactly (reference:
get_graph_feature_sv -> SVBlock -> svpool, sv_dgcnn_cls.py:55-65,
sv_util.py:90-132, sv_layers.py:151-196).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


MODES = ("exact", "fast", "approx")
_INT_MIN = np.int32(-(2**31) + 1)
_BIG = np.int32(1 << 30)
_Q_BITS = 18  # fast-mode distance quantization at N <= 8192 (as round 1)
_APPROX_L = 256  # approx-mode fold width (recall ledger in PERF.md)


# ---------------------------------------------------------------------------
# plane packing (XLA side, once per round)
# ---------------------------------------------------------------------------


def _plane_stride(C: int) -> int:
    """Planes are stored at a 64-lane-aligned stride: in-kernel lane slices
    at unaligned offsets compile to slow cross-lane shuffles (and tickle the
    Mosaic shift-after-slice bug, see _decode_exact). The padding is free in
    the gather matmul, whose width rounds up to 128 lanes anyway."""
    return max(64, (C + 63) // 64 * 64)


def pack_planes_exact(x: jax.Array) -> jax.Array:
    """f32 (..., C) -> int8 (..., 4*stride): byte planes of the f32 bits.

    Plane p holds byte (3-p) (MSB first), stored as byte-128 so it fits
    int8. A one-hot int8 matmul against these planes reconstructs the f32
    row BIT-EXACTLY (one-hot row sum = 1, so the -128 offset is a constant
    +128 after the matmul). Each plane sits at a 64-aligned lane offset.
    """
    C = x.shape[-1]
    P = _plane_stride(C)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, P - C)]
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    planes = []
    for p in range(4):
        byte = jax.lax.shift_right_logical(bits, np.uint32(8 * (3 - p)))
        byte = byte & np.uint32(0xFF)
        b8 = (byte.astype(jnp.int32) - 128).astype(jnp.int8)
        planes.append(jnp.pad(b8, pad, constant_values=np.int8(-128)))
    return jnp.concatenate(planes, axis=-1)


def pack_planes_fast(x: jax.Array):
    """f32 (..., C) -> (int8 (..., 2*stride) planes, f32 (1, C) inv-scales).

    Per-channel symmetric int16 fixed-point: q = round(x * 32704 / max|x_c|)
    split into high/low bytes. ABSOLUTE error ~2^-15 of the channel max;
    vs round-1's bf16 gather (error ~2^-8 RELATIVE to the value) this is
    tighter for values within ~2^7 of the channel max, looser below.
    """
    red = tuple(range(x.ndim - 1))
    amax = jnp.max(jnp.abs(x), axis=red, keepdims=False)  # (C,)
    scale = jnp.float32(32704.0) / jnp.maximum(amax, 1e-30)
    q = jnp.round(x * scale).astype(jnp.int32)  # [-32704, 32704]
    hi = jax.lax.shift_right_arithmetic(q, np.int32(8))  # [-128, 127]
    lo = q - jax.lax.shift_left(hi, np.int32(8))  # [0, 255]
    C = x.shape[-1]
    P = _plane_stride(C)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, P - C)]
    planes = jnp.concatenate(
        [
            jnp.pad(hi.astype(jnp.int8), pad),
            jnp.pad((lo - 128).astype(jnp.int8), pad, constant_values=np.int8(-128)),
        ],
        axis=-1,
    )
    inv = (1.0 / scale).reshape(1, -1)
    return planes, inv


def _decode_exact(g: jax.Array, C: int) -> jax.Array:
    """int32 (R, 4*stride) gathered bit-planes (-128 offset) -> f32 (R, C).

    Byte shifts are int32 MULTIPLIES (wrapping, same bits as <<): this
    Mosaic version miscompiles shift_left when fused after a lane slice
    (verified on-chip 2026-08-16; multiply is exact).
    """
    P = _plane_stride(C)
    g = g + 128
    bits = g[:, 0:C] * np.int32(1 << 24)
    bits = bits + g[:, P : P + C] * np.int32(1 << 16)
    bits = bits + g[:, 2 * P : 2 * P + C] * np.int32(1 << 8)
    bits = bits + g[:, 3 * P : 3 * P + C]
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _decode_fast(g: jax.Array, inv: jax.Array, C: int) -> jax.Array:
    """int32 (R, 2*stride) gathered fixed-point planes -> f32 (R, C)."""
    P = _plane_stride(C)
    hi = g[:, 0:C]
    lo = g[:, P : P + C] + 128
    q = hi * np.int32(1 << 8) + lo  # multiply, not shl (see _decode_exact)
    return q.astype(jnp.float32) * inv


def _decode_ctr_fast(planes_tile: jax.Array, inv: jax.Array, C: int) -> jax.Array:
    """Centre rows through the same fixed-point path (self-edges cancel)."""
    P = _plane_stride(C)
    q = planes_tile[:, 0:C].astype(jnp.int32) * np.int32(1 << 8) + (
        planes_tile[:, P : P + C].astype(jnp.int32) + 128
    )
    return q.astype(jnp.float32) * inv


# ---------------------------------------------------------------------------
# in-kernel selection helpers
# ---------------------------------------------------------------------------


def _neg_dist(ctr: jax.Array, src: jax.Array, N: int, exact: bool) -> jax.Array:
    """(T, N) negative squared distances; HIGHEST precision in exact mode so
    near-tie ordering matches the f32 XLA/flax path (SURVEY §7 hard part 2).
    f32 operands in both modes (as round-1 sv_round): default precision
    lowers to single-pass bf16 on the MXU; interpret-mode (CPU) matches v1.
    """
    prec = jax.lax.Precision.HIGHEST if exact else None
    inner = jax.lax.dot_general(
        ctr, src, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    tt = jnp.sum(ctr * ctr, axis=1, keepdims=True)
    aa = jnp.sum(src * src, axis=1, keepdims=True).reshape(1, N)
    return 2.0 * inner - tt - aa


def _sortable_ikey(neg: jax.Array) -> jax.Array:
    """Order-preserving f32 -> int32 (IEEE sign-fold): ikey monotone in neg.

    where-based sign fold (no shifts — see _decode_exact on the Mosaic
    shift_left bug; shifts are avoided in-kernel throughout)."""
    bits = jax.lax.bitcast_convert_type(neg, jnp.int32)
    return jnp.where(bits < 0, bits ^ np.int32(0x7FFFFFFF), bits)


def _idx_bits(N: int) -> int:
    """Column-index bits in the packed key: 13 at N <= 8192 (round-1
    contract), widening as N grows; the quantized-distance field shrinks to
    31 - idx_bits (q is never positive, so the product stays in int32)."""
    b = 13
    while (1 << b) < N:
        b += 1
    return b


def _packed_key(neg: jax.Array, cols: jax.Array, N: int) -> jax.Array:
    """Fast-mode key: quantized distance * 2^idx_bits + (2^idx_bits-1 - col).

    One max-reduce yields a unique winner whose column is recoverable from
    the key itself (ties break toward the lowest column, like topk).
    18 distance bits at N <= 8192; 31 - idx_bits above (N <= 2^20).
    """
    ib = _idx_bits(N)
    qbits = min(_Q_BITS, 31 - ib)  # q <= 0, so magnitude fits 31-ib bits
    worst = jnp.min(neg)
    scale = jnp.float32(-(1 << qbits)) / jnp.minimum(worst, -1e-12)
    q = jnp.floor(neg * scale).astype(jnp.int32)
    q = jnp.maximum(q, np.int32(-(1 << qbits) + 1))
    return q * np.int32(1 << ib) + (np.int32((1 << ib) - 1) - cols)


def _build_key(neg, cols, N, mode):
    if mode == "exact":
        return _sortable_ikey(neg)
    key = _packed_key(neg, cols, N)
    if mode == "approx":
        # the pairwise fold halves the width down to _APPROX_L; an odd
        # intermediate width would silently drop the last column's key
        w = N
        while w > _APPROX_L:
            assert w % 2 == 0, (
                f"approx fold needs N = 2^m * L for L in [{_APPROX_L}, "
                f"{2 * _APPROX_L}); got N={N} (width {w} is odd)"
            )
            w //= 2
            key = jnp.maximum(key[:, :w], key[:, w : 2 * w])
    return key


def _extract_rank(key, m, cols, N, exact):
    """One neighbour rank: returns (int8 one-hot mask, updated key, new max)."""
    if exact:
        amin = jnp.min(jnp.where(key == m, cols, _BIG), axis=1, keepdims=True)
        mask = (cols == amin).astype(jnp.int8)  # ties -> lowest column
        key = jnp.where(cols == amin, _INT_MIN, key)
    else:
        ib = np.int32(1 << _idx_bits(N))
        win = (ib - 1) - jnp.remainder(m, ib)  # floor-mod: keys < 0
        mask = (cols == win).astype(jnp.int8)
        key = jnp.where(key == m, _INT_MIN, key)
    return mask, key, jnp.max(key, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# the round kernel
# ---------------------------------------------------------------------------


def _round2_kernel(
    src_ref, planes_ref, inv_ref,
    wz_ref, w1_ref, beta_ref,
    a1_ref, b1_ref, w2_ref, scale2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref, ssum_ref,
    nbr_scratch,
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int, N: int,
    binary: bool, mode: str,
):
    C = S + 3 * V
    exact = mode == "exact"
    prec = jax.lax.Precision.HIGHEST if exact else None

    src = src_ref[0]  # (N, C) f32
    t = pl.program_id(1)
    ctr_raw = src_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]  # (T, C)
    if exact:
        ctr_g = ctr_raw  # bit-exact gather: self-edges cancel exactly
    else:
        cpl = planes_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]
        ctr_g = _decode_ctr_fast(cpl, inv_ref[:], C)

    # ---- phase 1: distances + keys ----
    neg = _neg_dist(ctr_raw, src, N, exact)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    key = _build_key(neg, cols, N, mode)

    # ---- phase 2: per-rank extract + int8 plane gather into scratch ----
    planes = planes_ref[0]
    m = jnp.max(key, axis=1, keepdims=True)
    for j in range(k):
        mask, key, m = _extract_rank(key, m, cols, N, exact)
        g = jax.lax.dot_general(
            mask, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        nbr = _decode_exact(g, C) if exact else _decode_fast(g, inv_ref[:], C)
        nbr_scratch[pl.ds(j * T, T), :] = nbr - ctr_g

    # ---- phase 3: batched SVBlock on (k*T, C) rows (same structure as the
    # per-rank v1 math, batched; A/B'd against an edge/centre-split and a
    # block-diagonal-matmul variant on-chip — this plain form is fastest:
    # whole-array elementwise ops, no unaligned lane slicing in hot ops) ----
    ctr_rep = jnp.tile(ctr_g, (k, 1))
    e = nbr_scratch[:]  # (k*T, C) edges, rank-major rows (j*T + t)

    # v_e[i]: (k*T, 2V) = [diff V | ctr V] per vector component
    v_e = [
        jnp.concatenate(
            [e[:, S + i * V : S + (i + 1) * V],
             ctr_rep[:, S + i * V : S + (i + 1) * V]],
            axis=1,
        )
        for i in range(3)
    ]

    # Vector2Scalar: z_i = v_e_i @ wz; sv_j = sum_i v_e_i * z_i[:, j]
    wz = wz_ref[:]
    # z feeds sign(sv + beta): must stay f32-faithful (HIGHEST) in exact
    # mode or binarization flips; wlin below has no sign and takes the
    # cheaper split-dot
    z = [
        jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32, precision=prec)
        for i in range(3)
    ]
    # exact mode keeps HIGHEST here too: the v-stream feeds the NEXT
    # round's kNN ordering, so a ~2^-17 split product perturbs neighbour
    # sets (A/B'd: split-dot was 50 us cheaper but broke f32-faithfulness);
    # fast/approx run the single-pass default
    if exact:
        vdot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                    precision=prec)
    else:
        vdot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    sv = []
    for jj in range(3):
        acc = v_e[0] * z[0][:, jj : jj + 1]
        acc = acc + v_e[1] * z[1][:, jj : jj + 1]
        acc = acc + v_e[2] * z[2][:, jj : jj + 1]
        sv.append(acc)

    if S > 0:
        s_e = jnp.concatenate([e[:, :S], ctr_rep[:, :S]], axis=1)  # (k*T, 2S)
        parts = [s_e] + sv
        ssum_ref[0, 0] = jnp.sum(s_e, axis=0, keepdims=True)
    else:
        parts = sv
        ssum_ref[0, 0] = jnp.zeros((1, ssum_ref.shape[-1]), jnp.float32)

    if binary:
        # sign+matmul per part instead of materializing x_cat: A/B'd
        # -55 us/cloud (skips the (k*T, 2S+6V) concat + one full xq pass)
        w1b = w1_ref[:].astype(jnp.bfloat16)
        h = None
        off = 0
        for part in parts:
            w = part.shape[1]
            hp = jnp.dot(
                jnp.sign(part + beta_ref[:, off : off + w]).astype(jnp.bfloat16),
                w1b[off : off + w],
                preferred_element_type=jnp.float32,
            )
            h = hp if h is None else h + hp
            off += w
    else:
        x_cat = jnp.concatenate(parts, axis=1)
        h = jnp.dot(x_cat, w1_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    y = h * a1_ref[:] + b1_ref[:]
    y = jnp.where(y >= 0, y, 0.2 * y)
    s_out_ref[0] = jnp.max(y.reshape(k, T, S_out), axis=0)

    w2 = w2_ref[:]
    scale2 = scale2_ref[:]
    wlin = [vdot(v_e[i], w2) * scale2 for i in range(3)]
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = a2_ref[:] + b2_ref[:] / nrm
    for i in range(3):
        vi = jnp.mean((wlin[i] * f).reshape(k, T, V_out), axis=0)
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = vi


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "S_out", "V_out", "k", "T", "binary", "mode",
                     "interpret"),
)
def sv_round2(
    src: jax.Array,   # (B, N, S + 3V): [s | v flat i-major]
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int = 128,
    binary: bool = True, mode: str = "exact", interpret: bool = False,
):
    """Full fused round (kNN in joint feature space + SVBlock + svpool).

    Returns (s_out (B, N, S_out), v_out UNGATED (B, N, 3*V_out), s_edge_mean
    (B, 2S) for the host-side gate MLP) — same contract as round-1 sv_round.
    """
    assert mode in MODES, mode
    B, N, _ = src.shape
    C = S + 3 * V
    assert N % T == 0
    assert mode == "exact" or N <= (1 << 20), "packed selection needs N <= 2^20"
    exact = mode == "exact"
    if exact:
        planes = pack_planes_exact(src)
        inv = jnp.ones((1, C), jnp.float32)
        PC = 4 * _plane_stride(C)
    else:
        planes, inv = pack_planes_fast(src)
        PC = 2 * _plane_stride(C)
    const = lambda b, t: (0, 0)
    s_out, v_out, ssum = pl.pallas_call(
        functools.partial(
            _round2_kernel,
            S=S, V=V, S_out=S_out, V_out=V_out, k=k, T=T, N=N,
            binary=binary, mode=mode,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, PC), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((k * T, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        src, planes, inv,
        folded["wz"], folded["w1"], folded["beta"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["scale2"], folded["a2"], folded["b2"],
    )
    s_edge_mean = jnp.sum(ssum[:, :, 0, :], axis=1) / (N * k)
    return s_out, v_out, s_edge_mean


# ---------------------------------------------------------------------------
# first-round kernel (coords input, FP block, optional cross channel)
# ---------------------------------------------------------------------------


def _round2_first_kernel(
    pts_ref, planes_ref, inv_ref,
    wz0_ref, wz1_ref, w1_ref, a1_ref, b1_ref,
    w2_ref, a2_ref, b2_ref,
    s_out_ref, v_out_ref, ssum_ref,
    nbr_scratch,
    *, S_out: int, V_out: int, k: int, T: int, N: int, mode: str,
    cross: bool,
):
    C = 3
    n_ch = 3 if cross else 2
    exact = mode == "exact"
    prec = jax.lax.Precision.HIGHEST if exact else None

    pts = pts_ref[0]  # (N, 3)
    t = pl.program_id(1)
    ctr_raw = pts_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]

    neg = _neg_dist(ctr_raw, pts, N, exact)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    key = _build_key(neg, cols, N, mode)

    planes = planes_ref[0]
    m = jnp.max(key, axis=1, keepdims=True)
    for j in range(k):
        mask, key, m = _extract_rank(key, m, cols, N, exact)
        g = jax.lax.dot_general(
            mask, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if exact:
            nbr_scratch[pl.ds(j * T, T), :] = _decode_exact(g, C)
        else:
            nbr_scratch[pl.ds(j * T, T), :] = _decode_fast(g, inv_ref[:], C)

    nbr = nbr_scratch[:]  # (k*T, 3)
    if exact:
        ctr_g = ctr_raw
    else:
        cpl = planes_ref[0, pl.ds(pl.multiple_of(t * T, T), T), :]
        ctr_g = _decode_ctr_fast(cpl, inv_ref[:], C)
    ctr_rep = jnp.broadcast_to(ctr_g[None], (k, T, C)).reshape(k * T, C)
    e = nbr - ctr_rep

    if cross:
        nb = [nbr[:, i : i + 1] for i in range(3)]
        cg = [ctr_rep[:, i : i + 1] for i in range(3)]
        cr = [
            nb[1] * cg[2] - nb[2] * cg[1],
            nb[2] * cg[0] - nb[0] * cg[2],
            nb[0] * cg[1] - nb[1] * cg[0],
        ]
        v_e = [
            jnp.concatenate([e[:, i : i + 1], ctr_rep[:, i : i + 1], cr[i]], axis=1)
            for i in range(3)
        ]  # (k*T, 3) x3
    else:
        v_e = [
            jnp.concatenate([e[:, i : i + 1], ctr_rep[:, i : i + 1]], axis=1)
            for i in range(3)
        ]  # (k*T, 2) x3

    def pieces(wz):
        z = [
            jnp.dot(v_e[i], wz, preferred_element_type=jnp.float32, precision=prec)
            for i in range(3)
        ]
        out = []
        for jj in range(3):
            acc = v_e[0] * z[0][:, jj : jj + 1]
            acc = acc + v_e[1] * z[1][:, jj : jj + 1]
            acc = acc + v_e[2] * z[2][:, jj : jj + 1]
            out.append(acc)  # (k*T, n_ch)
        return out

    sva = pieces(wz0_ref[:])
    svb = pieces(wz1_ref[:])
    # init_scalar partial sums, [c*3+j] ordering for the reference gate MLP
    ssum_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(sva[jj][:, c : c + 1], axis=0, keepdims=True)
            for c in range(n_ch)
            for jj in range(3)
        ],
        axis=1,
    )

    x_cat = jnp.concatenate(sva + svb, axis=1)  # (k*T, 6*n_ch)
    h = jnp.dot(x_cat, w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    y = h * a1_ref[:] + b1_ref[:]
    y = jnp.where(y >= 0, y, 0.2 * y)
    s_out_ref[0] = jnp.max(y.reshape(k, T, S_out), axis=0)

    wlin = [
        jnp.dot(v_e[i], w2_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        for i in range(3)
    ]
    nsq = wlin[0] * wlin[0] + wlin[1] * wlin[1] + wlin[2] * wlin[2]
    nrm = jnp.sqrt(nsq) + EPS
    f = a2_ref[:] + b2_ref[:] / nrm
    for i in range(3):
        vi = jnp.mean((wlin[i] * f).reshape(k, T, V_out), axis=0)
        v_out_ref[0, :, i * V_out : (i + 1) * V_out] = vi


@functools.partial(
    jax.jit,
    static_argnames=("S_out", "V_out", "k", "T", "mode", "cross", "interpret"),
)
def sv_round2_first(
    points: jax.Array,  # (B, N, 3)
    folded: Dict[str, jax.Array],
    *, S_out: int, V_out: int, k: int, T: int = 128,
    mode: str = "exact", cross: bool = False, interpret: bool = False,
):
    """Fused first round (kNN over coords + init_scalar + conv1 + pool).

    Returns (s_out, v_out UNGATED, s_mean (B, 3*n_ch) for the conv1 gate) —
    same contract as round-1 sv_round_first.
    """
    assert mode in MODES, mode
    B, N, _ = points.shape
    assert N % T == 0
    n_ch = 3 if cross else 2
    exact = mode == "exact"
    if exact:
        planes = pack_planes_exact(points)
        inv = jnp.ones((1, 3), jnp.float32)
        PC = 4 * _plane_stride(3)
    else:
        planes, inv = pack_planes_fast(points)
        PC = 2 * _plane_stride(3)
    const = lambda b, t: (0, 0)
    s_out, v_out, ssum = pl.pallas_call(
        functools.partial(
            _round2_first_kernel,
            S_out=S_out, V_out=V_out, k=k, T=T, N=N, mode=mode, cross=cross,
        ),
        grid=(B, N // T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, PC), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), const, memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((k * T, 3), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        points, planes, inv,
        folded["wz0"], folded["wz1"], folded["w1"],
        folded["a1"], folded["b1"],
        folded["w2"], folded["a2"], folded["b2"],
    )
    s_mean = jnp.sum(ssum[:, :, 0, :], axis=1) / (N * k)
    return s_out, v_out, s_mean
