"""Fused SV-DGCNN round v3: the TRANSPOSED (edges-along-lanes) layout.

Round-2 profiling (PERF.md) left two measured walls in the v2 kernel:

  1. the FIRST round (C=3 coords) cost ~375 us/cloud exact because its
     per-edge feature arrays are 1-3 LANES wide — the VPU ran at <10% lane
     utilization — and the K=2..6 HIGHEST f32 matmuls pad K to 128 at 6
     passes each;
  2. conv-round block math kept (k*T, 2V) arrays at 16-50% lane utilization
     and z/wlin HIGHEST tiny-K matmuls dominated the exact block cost.

v3 turns the whole round 90 degrees: centre points run along LANES and
channels/quantities along SUBLANES. Concretely, per (batch, point-tile)
program:

  * selection operates on (N, T) keys — the same 1-2 fused passes per rank
    as v2 (sortable-int exact keys / packed fast keys / folded approx
    keys), with reductions along sublanes instead of lanes;
  * the one-hot gather is planesT (PC, N) @ mask (N, T) -> (PC, T): the
    gathered rows land CHANNEL-MAJOR, feeding the transposed block math
    directly (plane stride shrinks 64 -> 8: sublane alignment granule);
  * block math runs on (channels, R*T) arrays — lane-dense at any channel
    count. The tiny-K contractions become exact f32 VPU work (SMEM-scalar
    FMAs for the first round's n_ch<=3 quantities; multiply + sublane-
    reduce for the conv rounds' Vector2Scalar z) instead of padded
    HIGHEST matmuls — cheaper AND f32-exact in every mode;
  * neighbour ranks are processed in chunks of R with pooled outputs
    accumulated on the fly (s: running max, v: running sum) — no (k*T, C)
    scratch, bounded VMEM at any k.

Semantics match sv_round2 exactly (reference: get_graph_feature_sv ->
SVBlock -> svpool, sv_dgcnn_cls.py:55-65, sv_util.py:90-132,
sv_layers.py:151-196; first round: sv_dgcnn_cls.py:48-53 +
get_graph_feature / get_graph_feature_cross, sv_util.py:64-88) and the
wrapper keeps sv_round2's calling contract (same folded dicts, row-major
in/out), so the engines switch with one flag.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svnet_tpu import config
from svnet_tpu.ops.pallas.sv_round2 import (
    MODES,
    _BIG,
    _INT_MIN,
    _idx_bits,
    _Q_BITS,
)

EPS = 1e-6


# ---------------------------------------------------------------------------
# channel-major plane packing (XLA side, once per round)
# ---------------------------------------------------------------------------


def _plane_stride_t(C: int) -> int:
    """Transposed planes live on SUBLANES, whose alignment granule is 8
    (f32/int32 tile is (8, 128)) — not 64 as in v2's lane-major planes."""
    return (C + 7) // 8 * 8


def pack_planes_exact_t(xT: jax.Array) -> jax.Array:
    """f32 (B, C, N) channel-major -> int8 (B, 4*stride, N) byte planes.

    Same bit-plane scheme as v2's pack_planes_exact (byte (3-p) of the f32
    bits, stored as byte-128), transposed: plane p occupies sublane rows
    [p*stride, p*stride+C). A one-hot int8 matmul planesT @ mask
    reconstructs f32 columns bit-exactly.
    """
    B, C, N = xT.shape
    P = _plane_stride_t(C)
    bits = jax.lax.bitcast_convert_type(xT, jnp.uint32)
    planes = []
    for p in range(4):
        byte = jax.lax.shift_right_logical(bits, np.uint32(8 * (3 - p)))
        byte = byte & np.uint32(0xFF)
        b8 = (byte.astype(jnp.int32) - 128).astype(jnp.int8)
        planes.append(
            jnp.pad(b8, ((0, 0), (0, P - C), (0, 0)), constant_values=np.int8(-128))
        )
    return jnp.concatenate(planes, axis=1)


def pack_planes_fast_t(xT: jax.Array):
    """f32 (B, C, N) -> (int8 (B, 2*stride, N) planes, f32 (C, 1) inv).

    Per-channel symmetric int16 fixed-point (v2's pack_planes_fast,
    transposed): ~2^-15 ABSOLUTE error of the per-channel max.
    """
    B, C, N = xT.shape
    P = _plane_stride_t(C)
    amax = jnp.max(jnp.abs(xT), axis=(0, 2))  # (C,)
    scale = jnp.float32(32704.0) / jnp.maximum(amax, 1e-30)
    q = jnp.round(xT * scale[None, :, None]).astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(q, np.int32(8))
    lo = q - jax.lax.shift_left(hi, np.int32(8))
    pad = ((0, 0), (0, P - C), (0, 0))
    planes = jnp.concatenate(
        [
            jnp.pad(hi.astype(jnp.int8), pad),
            jnp.pad((lo - 128).astype(jnp.int8), pad, constant_values=np.int8(-128)),
        ],
        axis=1,
    )
    return planes, (1.0 / scale).reshape(C, 1)



def _gb8(mode: str) -> bool:
    """True when ``mode`` gathers through ONE int8 plane (the trace-time
    config knobs). The SINGLE source of truth — _round3_tiles' VMEM
    budget (nplanes) and the kernels' plane packing must always agree,
    or tiles get sized for a different plane count than gets packed."""
    return (mode == "approx" and config.approx_gather_bits == 8) or (
        mode == "fast" and config.fast_gather_bits == 8
    )


def pack_planes_q8_t(xT: jax.Array):
    """f32 (B, C, N) -> (int8 (B, stride, N) plane, f32 (C, 1) inv).

    Per-channel symmetric int8 fixed-point: ONE gather plane (HALF the
    fast mode's one-hot MXU cost), ~2^-8 ABSOLUTE error of the
    per-channel max. The approx-mode gather option
    (config.approx_gather_bits = 8): after the selection fold, the
    gather is what binds an approx round at partseg shapes (k=40,
    conv4's C=127), so halving its width is the next lever. Centres
    decode through the SAME grid, so self-edges still cancel exactly.
    """
    B, C, N = xT.shape
    P = _plane_stride_t(C)
    amax = jnp.max(jnp.abs(xT), axis=(0, 2))  # (C,)
    scale = jnp.float32(127.0) / jnp.maximum(amax, 1e-30)
    q = jnp.clip(jnp.round(xT * scale[None, :, None]), -127, 127)
    planes = jnp.pad(q.astype(jnp.int8), ((0, 0), (0, P - C), (0, 0)))
    return planes, (1.0 / scale).reshape(C, 1)


def _decode_q8_t(g: jax.Array, invT: jax.Array, C: int) -> jax.Array:
    """int32 (stride, T) gathered q8 plane -> f32 (C, T)."""
    return g[0:C, :].astype(jnp.float32) * invT


def _decode_ctr_q8_t(cpl: jax.Array, invT: jax.Array, C: int) -> jax.Array:
    return cpl[0:C, :].astype(jnp.int32).astype(jnp.float32) * invT


def _decode_exact_t(g: jax.Array, C: int) -> jax.Array:
    """int32 (4*stride, T) gathered bit-planes -> f32 (C, T).

    Byte shifts are int32 MULTIPLIES: Mosaic miscompiles shift_left fused
    after a slice (verified on-chip r2; multiply is exact)."""
    P = _plane_stride_t(C)
    g = g + 128
    bits = g[0:C, :] * np.int32(1 << 24)
    bits = bits + g[P : P + C, :] * np.int32(1 << 16)
    bits = bits + g[2 * P : 2 * P + C, :] * np.int32(1 << 8)
    bits = bits + g[3 * P : 3 * P + C, :]
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _decode_fast_t(g: jax.Array, invT: jax.Array, C: int) -> jax.Array:
    """int32 (2*stride, T) gathered fixed-point planes -> f32 (C, T)."""
    P = _plane_stride_t(C)
    q = g[0:C, :] * np.int32(1 << 8) + (g[P : P + C, :] + 128)
    return q.astype(jnp.float32) * invT


def _decode_ctr_fast_t(cpl: jax.Array, invT: jax.Array, C: int) -> jax.Array:
    """Centre columns through the same fixed-point path (self-edges cancel)."""
    P = _plane_stride_t(C)
    q = cpl[0:C, :].astype(jnp.int32) * np.int32(1 << 8) + (
        cpl[P : P + C, :].astype(jnp.int32) + 128
    )
    return q.astype(jnp.float32) * invT


# ---------------------------------------------------------------------------
# transposed selection helpers — (N, T) keys, reductions along sublanes
# ---------------------------------------------------------------------------


def _sortable_ikey(neg: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(neg, jnp.int32)
    return jnp.where(bits < 0, bits ^ np.int32(0x7FFFFFFF), bits)


def _packed_key_t(neg: jax.Array, rows: jax.Array, N: int) -> jax.Array:
    ib = _idx_bits(N)
    qbits = min(_Q_BITS, 31 - ib)
    worst = jnp.min(neg)
    scale = jnp.float32(-(1 << qbits)) / jnp.minimum(worst, -1e-12)
    q = jnp.floor(neg * scale).astype(jnp.int32)
    q = jnp.maximum(q, np.int32(-(1 << qbits) + 1))
    return q * np.int32(1 << ib) + (np.int32((1 << ib) - 1) - rows)


def _build_key_t(neg, rows, N, mode, W=None, valid=None):
    """Keys over W candidate rows (W = N for a full scan); packed keys
    encode ABSOLUTE row ids (from ``rows``), so windowed/compacted
    selection returns global indices. ``valid`` masks compaction padding
    to _INT_MIN BEFORE the approx fold can absorb it.

    The approx fold halves the candidate width down to
    ``config.approx_fold`` (trace-time knob, default 256): each fold
    pairs distant halves (i, i+w) by key max, so the expected number of
    collided top-k pairs is ~C(k,2)/L — raise the fold width for a
    cheaper recall/speed trade at large N*k (partseg), lower it for
    maximum selection-sweep savings. L >= W (e.g. fold=N) folds nothing
    and makes approx selection identical to fast."""
    if mode == "exact":
        key = _sortable_ikey(neg)
    else:
        key = _packed_key_t(neg, rows, N)
    if valid is not None:
        key = jnp.where(valid, key, _INT_MIN)
    if mode == "approx":
        w = N if W is None else W
        while w > config.approx_fold:
            assert w % 2 == 0, (N, w)
            w //= 2
            key = jnp.maximum(key[:w, :], key[w : 2 * w, :])
    return key


def _merge_sorted_keys(a, b, gout):
    """Top-``gout`` of two descending sorted key lists ((n, T) arrays).

    c_i = max over (ka, j) with ka + j = i of min(a_ka, b_j); the 0-th
    element is a +inf sentinel (drop the min) and out-of-range elements
    are -inf sentinels (drop the candidate).
    """
    out = []
    for i in range(1, gout + 1):
        cands = []
        for j in range(0, i + 1):
            ka = i - j
            if ka > len(a) or j > len(b):
                continue
            if ka == 0:
                cands.append(b[j - 1])
            elif j == 0:
                cands.append(a[ka - 1])
            else:
                cands.append(jnp.minimum(a[ka - 1], b[j - 1]))
        c = cands[0]
        for x in cands[1:]:
            c = jnp.maximum(c, x)
        out.append(c)
    return out


def _top_group(key, G, st):
    """Top-G key values of one tournament sweep over (W, T) keys.

    Requires UNIQUE keys (the packed fast/approx keys embed the row id).
    ``st``: exclusive upper threshold from the previous sweep — entries at
    or above it are masked to -inf INSIDE the first merge level, so no
    full-size eligibility temp materializes. Sorted-tuple tournament:
    halve along sublanes carrying descending sorted-G lists; G ranks come
    out of ONE traversal (~1.4x over the per-rank update-and-rescan loop
    at G=8, measured on-chip at N=2048/k=40 — tools/bench_selection.py).
    """
    n = key.shape[0]
    if n & (n - 1):  # non-power-of-2 candidate window (e.g. W = 3N/4)
        p2 = 1 << (n - 1).bit_length()
        key = jnp.concatenate(
            [key, jnp.full((p2 - n, key.shape[1]), _INT_MIN, key.dtype)],
            axis=0,
        )
        n = p2
    lst = [key]
    while n > 1:
        n //= 2
        a = [v[:n, :] for v in lst]
        b = [v[n : 2 * n, :] for v in lst]
        if st is not None:
            a = [jnp.where(v < st, v, _INT_MIN) for v in a]
            b = [jnp.where(v < st, v, _INT_MIN) for v in b]
            st = None
        lst = _merge_sorted_keys(a, b, min(G, 2 * len(lst)))
    return lst[:G]


_SEL_G = 8  # tuple width of the tournament sweeps (top8 ~= top16 on-chip)


def _pmax(p, q):
    """Pair max under (value desc, row asc) — the exact-mode total order
    (min-row-id tie-break, torch.topk semantics)."""
    c = (p[0] > q[0]) | ((p[0] == q[0]) & (p[1] < q[1]))
    return jnp.where(c, p[0], q[0]), jnp.where(c, p[1], q[1])


def _pmin(p, q):
    c = (p[0] > q[0]) | ((p[0] == q[0]) & (p[1] < q[1]))
    return jnp.where(c, q[0], p[0]), jnp.where(c, q[1], p[1])


def _merge_sorted_pairs(a, b, gout):
    """Pair analogue of _merge_sorted_keys for the exact total order."""
    out = []
    for i in range(1, gout + 1):
        cands = []
        for j in range(0, i + 1):
            ka = i - j
            if ka > len(a) or j > len(b):
                continue
            if ka == 0:
                cands.append(b[j - 1])
            elif j == 0:
                cands.append(a[ka - 1])
            else:
                cands.append(_pmin(a[ka - 1], b[j - 1]))
        c = cands[0]
        for x in cands[1:]:
            c = _pmax(c, x)
        out.append(c)
    return out


def _top_group_pair(val, row, G, st, axis=0):
    """Top-G (value, row) pairs of one tournament sweep — exact mode.

    f32-bit sortable values TIE, but (value, row) pairs are unique, so the
    sorted-tuple tournament and cross-sweep threshold stay valid and ties
    extract in increasing row order (the update-loop/torch.topk
    tie-break). ``st``: the last extracted pair — entries at or before it
    in the (v desc, r asc) order are masked inside the first merge level.
    ``axis``: the candidate axis — 0 for the rounds' (W, T) keys, 1 for
    knn_pallas's (T, N) keys; the merge itself is elementwise.
    """
    if axis == 0:
        cut = lambda x, n0, n1: x[n0:n1, :]
    else:
        cut = lambda x, n0, n1: x[:, n0:n1]
    n = val.shape[axis]
    if n & (n - 1):  # non-power-of-2 candidate window
        p2 = 1 << (n - 1).bit_length()
        # pad val and row from their OWN shapes: the rounds pass rows as a
        # broadcastable (W, 1) column while val is (W, T)
        padv = [val.shape[0], val.shape[1]]
        padv[axis] = p2 - n
        padr = [row.shape[0], row.shape[1]]
        padr[axis] = p2 - n
        val = jnp.concatenate(
            [val, jnp.full(tuple(padv), _INT_MIN, val.dtype)], axis=axis
        )
        row = jnp.concatenate(
            [row, jnp.full(tuple(padr), _BIG, row.dtype)], axis=axis
        )
        n = p2
    lst = [(val, row)]
    while n > 1:
        n //= 2
        a = [(cut(v, 0, n), cut(r, 0, n)) for v, r in lst]
        b = [(cut(v, n, 2 * n), cut(r, n, 2 * n)) for v, r in lst]
        if st is not None:
            sv, sr = st

            def _mask(p):
                keep = (p[0] < sv) | ((p[0] == sv) & (p[1] > sr))
                return (
                    jnp.where(keep, p[0], _INT_MIN),
                    jnp.where(keep, p[1], _BIG),
                )

            a = [_mask(p) for p in a]
            b = [_mask(p) for p in b]
            st = None
        lst = _merge_sorted_pairs(a, b, min(G, 2 * len(lst)))
    return lst[:G]


def _select_rows(key, rows, N, k, mode):
    """Selection phase: ALL k winner row-ids up front, as k (1, T) int32
    arrays of absolute ids (windowed/compacted selection included).

    exact — f32-bit sortable keys are not unique (distance ties), so the
    r2/r3.0 update-and-rescan loop stands: per rank, min-row-id among the
    current max (torch.topk tie-break), INT_MIN scatter at the winner,
    fresh max. config.exact_selection='pair' swaps in the (value, row)
    sorted-pair tournament — identical exact semantics (pairs ARE unique,
    ties extract in increasing row order), ~_SEL_G ranks per traversal at
    2 planes per element. fast/approx — packed keys are unique, so
    _top_group extracts _SEL_G ranks per traversal and the winner ids
    fall out of the low bits. Decoupling selection from the gather/block
    chunk loop costs the MXU/VPU overlap of at most one chunk and frees
    the chunk size R from the extraction group size.
    """
    if mode == "exact":
        from svnet_tpu import config  # lazy: avoids an import cycle

        if config.exact_selection == "pair":
            wins = []
            st = None
            for j0 in range(0, k, _SEL_G):
                tops = _top_group_pair(key, rows, min(_SEL_G, k - j0), st)
                st = tops[-1]
                wins += [t[1] for t in tops]
            return wins
        if config.exact_selection == "value":
            # r4 A/B (ROADMAP #2 'per-tile sorted-tuple top-k'): a
            # SINGLE-plane value tournament — the sorted-merge formula is
            # multiset-correct, so duplicate (tied) values are fine for
            # VALUES, unlike the id-decoding fast path — then per-rank
            # min-row extraction with an incremental exclusion mask
            # (ties extract in increasing row order, torch.topk), and ONE
            # combined scatter per G-group instead of one per rank.
            # Cross-group thresholding is tie-unsafe with duplicates, so
            # groups re-run on the scattered key instead (st=None).
            wins = []
            for j0 in range(0, k, _SEL_G):
                g = min(_SEL_G, k - j0)
                vals = _top_group(key, g, None)
                excl = None
                for v in vals:
                    elig = key == v
                    if excl is not None:
                        elig = elig & excl
                    amin = jnp.min(
                        jnp.where(elig, rows, _BIG), axis=0, keepdims=True
                    )
                    wins.append(amin)
                    hit = rows != amin
                    excl = hit if excl is None else (excl & hit)
                if j0 + g < k:
                    key = jnp.where(excl, key, _INT_MIN)
            return wins
        wins = []
        m = jnp.max(key, axis=0, keepdims=True)
        for j in range(k):
            amin = jnp.min(
                jnp.where(key == m, rows, _BIG), axis=0, keepdims=True
            )
            wins.append(amin)
            if j + 1 < k:
                key = jnp.where(rows == amin, _INT_MIN, key)
                m = jnp.max(key, axis=0, keepdims=True)
        return wins
    ib = np.int32(1 << _idx_bits(N))
    wins = []
    st = None
    for j0 in range(0, k, _SEL_G):
        tops = _top_group(key, min(_SEL_G, k - j0), st)
        st = tops[-1]
        wins += [(ib - 1) - jnp.remainder(t, ib) for t in tops]
    return wins


def _zvpu(wzcols, v_e):
    """Vector2Scalar direction read-out as exact f32 VPU work.

    z[j] (1, L) = sum_c wz[c, j] * v_e[c] — a multiply against the
    broadcast (2V, 1) weight column and one sublane-tree reduction, instead
    of a K=2V-padded-to-128 HIGHEST matmul (6 MXU passes). Exact f32 in
    every mode.
    """
    return [
        jnp.sum(v_e * wzc, axis=0, keepdims=True) for wzc in wzcols
    ]


# ---------------------------------------------------------------------------
# the conv-round kernel
# ---------------------------------------------------------------------------


def _round3_kernel(
    src_ref, srcT_ref, planesT_ref, invT_ref, aa_ref, keep_ref,
    wzc_ref, w1T_ref, betaT_ref,
    a1T_ref, b1T_ref, w2_ref, scale2T_ref, a2T_ref, b2T_ref,
    *rest,
    S: int, V: int, S_out: int, V_out: int, k: int, R: int, T: int, N: int,
    W: int, binary: bool, mode: str, gb8: bool = False,
    take_wins: bool = False, emit_wins: bool = False, blk8: bool = False,
    fused_sel: bool = False, ablate: str = "",
):
    # optional graph-reuse refs ride at the end of the input/output lists
    # (config.graph_reuse): ``take_wins`` skips distances/keys/selection and
    # reads the k per-target winner rows; ``emit_wins`` writes them.
    rest = list(rest)
    winsin_ref = rest.pop(0) if take_wins else None
    s_out_ref, v_out_ref, ssum_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    winsout_ref = rest.pop(0) if emit_wins else None
    nbr_scratch, cmp_scratch = rest[0], rest[1:]

    C = S + 3 * V
    twoV = 2 * V
    exact = mode == "exact"
    prec = jax.lax.Precision.HIGHEST if exact else None

    t = pl.program_id(1)
    ctrT_raw = srcT_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]  # (C, T)
    if exact:
        ctr_g = ctrT_raw  # bit-exact gather: self-edges cancel exactly
    else:
        cpl = planesT_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]
        ctr_g = (_decode_ctr_q8_t if gb8 else _decode_ctr_fast_t)(
            cpl, invT_ref[:], C
        )

    # ---- phase 1: distances + keys over the candidate rows ----
    # W == N: full scan. W < N: prepass-certified per-tile block skipping —
    # kept BS-row blocks are compacted into W-capacity scratch (aligned
    # dynamic copies), selection/gather run at width W, and absolute row
    # ids ride along so results match the full scan exactly.
    if take_wins:
        # graph reuse: the neighbour rows were selected by an earlier round
        # (absolute ids over the full N) — phase 1 drops out entirely.
        wins = [winsin_ref[0, r : r + 1, :] for r in range(k)]
        if W < N:
            # gather compaction (config.reuse_gather_window): the wrapper
            # certified every winner block fits W rows, so gather from a
            # compaction of just those blocks — bitwise-identical output
            # (excluded rows contribute exact zeros to the one-hot matmul)
            planes_cmp, rows_cmp, cur_ref = cmp_scratch
            nb = N // BS
            cur_ref[0] = 0
            # padding rows must never match a winner id in the gather mask
            rows_cmp[...] = jnp.full((W, 1), -1, jnp.int32)
            for bk in range(nb):
                @pl.when(keep_ref[0, t, bk] > 0)
                def _(bk=bk):
                    c = cur_ref[0]
                    dst = pl.ds(pl.multiple_of(c * BS, BS), BS)
                    planes_cmp[:, dst] = planesT_ref[0, :, bk * BS : (bk + 1) * BS]
                    rows_cmp[dst, :] = (
                        jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0) + bk * BS
                    )
                    cur_ref[0] = c + 1
            planes_w = planes_cmp[:]
            rows = rows_cmp[:]  # (W, 1) absolute ids
        else:
            planes_w = planesT_ref[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    elif W == N:
        src_w = src_ref[0]  # (N, C)
        aa_w = aa_ref[0]
        planes_w = planesT_ref[0]  # (PC, N) int8
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        valid = None
    else:
        src_cmp, planes_cmp, aa_cmp, rows_cmp, cur_ref = cmp_scratch
        nb = N // BS
        cur_ref[0] = 0
        # padding rows must never match a winner id in the gather mask
        rows_cmp[...] = jnp.full((W, 1), -1, jnp.int32)
        for bk in range(nb):
            @pl.when(keep_ref[0, t, bk] > 0)
            def _(bk=bk):
                c = cur_ref[0]
                dst = pl.ds(pl.multiple_of(c * BS, BS), BS)
                src_cmp[dst, :] = src_ref[0, bk * BS : (bk + 1) * BS, :]
                planes_cmp[:, dst] = planesT_ref[0, :, bk * BS : (bk + 1) * BS]
                aa_cmp[dst, :] = aa_ref[0, bk * BS : (bk + 1) * BS, :]
                rows_cmp[dst, :] = (
                    jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0) + bk * BS
                )
                cur_ref[0] = c + 1
        cnt = cur_ref[0] * BS
        src_w = src_cmp[:]
        aa_w = aa_cmp[:]
        planes_w = planes_cmp[:]
        rows = rows_cmp[:]  # (W, 1) absolute ids
        local = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        valid = local < cnt
    if not take_wins:
        inner = jax.lax.dot_general(
            src_w, ctrT_raw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        tt = jnp.sum(ctrT_raw * ctrT_raw, axis=0, keepdims=True)  # (1, T)
        neg = 2.0 * inner - aa_w - tt
        if valid is not None:
            # neutralize garbage rows beyond the compaction cursor (scratch
            # is uninitialized; 0.0 also keeps the packed-key quantizer's
            # min(neg) over real candidates only)
            neg = jnp.where(valid, neg, 0.0)
        key = _build_key_t(neg, rows, N, mode, W, valid)
        if fused_sel and exact and not ablate:
            wins = None  # extracted inside the fused chunk loop below
        else:
            wins = _select_rows(key, rows, N, k, mode)  # k winner row-ids
            if emit_wins:
                for r in range(k):
                    winsout_ref[0, r : r + 1, :] = wins[r]

    if ablate == "sel" and not take_wins:
        # profiling leg: selection + key build only. Outputs consume the
        # winner ids so Mosaic cannot dead-code the selection work.
        acc = wins[0].astype(jnp.float32)
        for w_ in wins[1:]:
            acc = acc + w_.astype(jnp.float32)
        s_out_ref[0] = jnp.broadcast_to(acc, (S_out, T))
        v_out_ref[0] = jnp.broadcast_to(acc, (3 * V_out, T))
        ssum_ref[0, 0] = jnp.zeros_like(ssum_ref[0, 0])
        return

    # centre-derived constants, reused across chunks. wz column slices are
    # 1-lane unaligned reads of a TINY (2V, 3) array — one-vreg shuffles,
    # hoisted out of the rank loop.
    wzcols = [wzc_ref[:, j : j + 1] for j in range(3)]  # (2V, 1) each
    ctr_s = ctr_g[0:S, :] if S else None
    ctr_v = [ctr_g[S + i * V : S + (i + 1) * V, :] for i in range(3)]
    w1q = w1T_ref[:].astype(jnp.int8) if (binary and blk8) else None

    s_acc = None
    v_acc = [None, None, None]
    se_sum = None
    gath_acc = None

    def gather_dots(wins_g):
        """The group's one-hot gathers as ONE wide MXU matmul.

        All G masks are built first (VPU), then a single
        (PC, W) @ (W, G*T) dot — matmul columns are independent, so the
        result is BITWISE the per-rank dots', but the MXU sees one long
        op to overlap the next chunk's VPU work with, instead of G
        dependency-chained mask->dot pairs. (r3.3: conv4 reuse gather leg
        279 -> 244 us/cloud, full reuse round 373 -> 340;
        tools/bench_round3_stages --reuse.)
        """
        # NOTE (r3.3, measured): per-rank compares + mask concat ON
        # PURPOSE. The "cleaner" single wide compare against a (1, G*T)
        # concat of the winner rows is bitwise identical but benched
        # cls exact 2,374 -> 2,103 (-12%) — Mosaic pipelines the G
        # narrow compares with the MXU better than one wide one. The
        # mask BUILD itself is the second gather wall either way
        # (k*N^2 VPU element ops; see PERF.md "refined gather floor").
        masks = [(rows == win).astype(jnp.int8) for win in wins_g]
        return jax.lax.dot_general(
            planes_w, jnp.concatenate(masks, axis=1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (PC, G*T)

    def decode_group(g):
        """Decode the group's raw (PC, G*T) gather into channel-major
        scratch — one wide elementwise decode (the decoders are width-
        generic row slicers), not G per-rank calls."""
        GT = g.shape[1]
        if exact:
            nbr = _decode_exact_t(g, C)
        elif gb8:
            nbr = _decode_q8_t(g, invT_ref[:], C)
        else:
            nbr = _decode_fast_t(g, invT_ref[:], C)
        nbr_scratch[:, 0:GT] = nbr

    def block_chunk(Rg):
        """SVBlock math over the Rg gathered ranks currently in scratch,
        folded into the running pool accumulators."""
        nonlocal s_acc, v_acc, se_sum, gath_acc
        L = Rg * T
        if ablate == "gather":
            # profiling leg: selection + gather + decode, no block math.
            red = jnp.sum(nbr_scratch[:, 0:L], axis=0, keepdims=True)
            part = red[:, 0:T]
            for r in range(1, Rg):
                part = part + red[:, r * T : (r + 1) * T]
            gath_acc = part if gath_acc is None else gath_acc + part
            return
        nbrT = nbr_scratch[:, 0:L]  # (C, L)
        ctr_rep = jnp.tile(ctr_g, (1, Rg))  # (C, L)
        e = nbrT - ctr_rep

        # v_e[i]: (2V, L) rows [diff V | ctr V]
        v_e = [
            jnp.concatenate(
                [e[S + i * V : S + (i + 1) * V, :],
                 jnp.tile(ctr_v[i], (1, Rg))],
                axis=0,
            )
            for i in range(3)
        ]

        # one lane-concat of the 3 spatial components, shared by the
        # Vector2Scalar reductions and the linear2 matmul below (r3.3):
        # both apply the SAME weights to each component, so 3 narrow ops
        # become 1 wide op each — bitwise identical (columns independent,
        # per-lane sums untouched)
        v_cat = jnp.concatenate(v_e, axis=1)  # (2V, 3L)

        if ablate == "noz":
            # profiling leg: skip the quadratic Vector2Scalar (z build +
            # 9 scaled adds) — same downstream shapes, garbage values
            sv = v_e
        else:
            # Vector2Scalar z: exact f32 VPU reduction (see _zvpu)
            z_cat = _zvpu(wzcols, v_cat)  # z_cat[j]: (1, 3L)
            sv = []
            for jj in range(3):
                p = v_cat * z_cat[jj]  # (2V, 3L)
                # same left-assoc add order as the per-component form
                sv.append(p[:, 0:L] + p[:, L : 2 * L] + p[:, 2 * L : 3 * L])

        if S > 0:
            s_e = jnp.concatenate(
                [e[0:S, :], jnp.tile(ctr_s, (1, Rg))], axis=0
            )
            parts = [s_e] + sv
            chunk_sum = jnp.sum(s_e, axis=1, keepdims=True)  # (2S, 1)
            se_sum = chunk_sum if se_sum is None else se_sum + chunk_sum
        else:
            parts = sv

        x_cat = jnp.concatenate(parts, axis=0)  # (2S+6V, L)
        if binary and blk8:
            # ±1 int8 on the MXU: 2x the bf16 MAC rate, value-identical
            # (config.round_block_matmul — sums bounded far below 2^24)
            xq = jnp.sign(x_cat + betaT_ref[:]).astype(jnp.int8)
            h = jax.lax.dot_general(
                w1q, xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # (S_out, L)
        elif binary:
            xq = jnp.sign(x_cat + betaT_ref[:]).astype(jnp.bfloat16)
            h = jax.lax.dot_general(
                w1T_ref[:].astype(jnp.bfloat16), xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (S_out, L); +-1 operands are exact in bf16
        else:
            h = jax.lax.dot_general(
                w1T_ref[:], x_cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        y = h * a1T_ref[:] + b1T_ref[:]
        y = jnp.where(y >= 0, y, 0.2 * y)
        # svpool max over the chunk's ranks: Rg lane-aligned (S_out, T) slices
        for r in range(Rg):
            ys = y[:, r * T : (r + 1) * T]
            s_acc = ys if s_acc is None else jnp.maximum(s_acc, ys)

        if ablate == "novec":
            return  # profiling leg: skip the vector output stream entirely

        # vector stream: linear2 (+scale2) via MXU (V_out x 2V), VectorBN.
        # ONE (V_out, 2V) @ (2V, 3L) dot over the shared lane-concat —
        # same weights per component, bitwise the 3 per-component dots'
        wl_cat = jax.lax.dot_general(
            w2_ref[:], v_cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale2T_ref[:]  # (V_out, 3L)
        wl = [wl_cat[:, i * L : (i + 1) * L] for i in range(3)]
        nsq = wl[0] * wl[0] + wl[1] * wl[1] + wl[2] * wl[2]
        nrm = jnp.sqrt(nsq) + EPS
        f = a2T_ref[:] + b2T_ref[:] / nrm
        for i in range(3):
            vi = wl[i] * f  # (V_out, L)
            vsum = vi[:, 0:T]
            for r in range(1, Rg):
                vsum = vsum + vi[:, r * T : (r + 1) * T]
            v_acc[i] = vsum if v_acc[i] is None else v_acc[i] + vsum

    # NOTE (r3.1, measured): software-pipelining selection groups with the
    # previous group's gather matmuls — in either emission order, including
    # dots-issued-before-the-next-sweep — measured ~4% SLOWER than this
    # selection-first order at cls fast shapes (56/62/91 vs 55/57/90
    # us/cloud for conv2/3/4); Mosaic does not overlap the one-hot MXU
    # work with the selection VPU sweeps across that distance. Rejected.
    # both paths chunk by the same group pattern so pooled-sum float
    # association is bitwise identical between a normal round and its
    # wins_in replay (graph-reuse roundtrip test)
    done = 0
    if wins is None:
        # fused exact selection (config.exact_selection='fused'): the
        # update-and-rescan loop's per-rank ``rows == winner`` predicate
        # IS the gather's one-hot column — build it once, use it for the
        # INT_MIN scatter AND the mask concat (one (W, T) compare per
        # rank instead of two; the mask build is the second gather wall,
        # PERF.md 'refined gather floor'). Group pattern, dot, and block
        # math are unchanged, so outputs are bitwise 'update''s.
        m = jnp.max(key, axis=0, keepdims=True)
        while done < k:
            G = min(_SEL_G, k - done)
            masks = []
            for j in range(G):
                amin = jnp.min(
                    jnp.where(key == m, rows, _BIG), axis=0, keepdims=True
                )
                if emit_wins:
                    winsout_ref[0, done + j : done + j + 1, :] = amin
                eq = rows == amin
                masks.append(eq.astype(jnp.int8))
                if done + j + 1 < k:
                    key = jnp.where(eq, _INT_MIN, key)
                    m = jnp.max(key, axis=0, keepdims=True)
            g = jax.lax.dot_general(
                planes_w, jnp.concatenate(masks, axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            decode_group(g)
            block_chunk(G)
            done += G
    elif config.gather_pipeline:
        # r5 (ROADMAP r4 #4): chunk c+1's one-hot masks are BUILT before
        # chunk c's dot result is consumed, handing Mosaic an in-flight
        # MXU dot to overlap the VPU compares with. Bitwise identical to
        # the branch below — same masks, same dots, same accumulation
        # order (config.set_gather_pipeline; A/B with bench.py).
        masks = [
            (rows == wins[r]).astype(jnp.int8)
            for r in range(min(_SEL_G, k))
        ]
        while done < k:
            G = min(_SEL_G, k - done)
            g = jax.lax.dot_general(
                planes_w, jnp.concatenate(masks, axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            nxt = done + G
            if nxt < k:
                masks = [
                    (rows == wins[nxt + r]).astype(jnp.int8)
                    for r in range(min(_SEL_G, k - nxt))
                ]
            decode_group(g)
            block_chunk(G)
            done = nxt
    else:
        while done < k:
            G = min(_SEL_G, k - done)
            decode_group(gather_dots([wins[done + r] for r in range(G)]))
            block_chunk(G)
            done += G

    if ablate == "gather":
        s_out_ref[0] = jnp.broadcast_to(gath_acc, (S_out, T))
        v_out_ref[0] = jnp.broadcast_to(gath_acc, (3 * V_out, T))
        ssum_ref[0, 0] = jnp.zeros_like(ssum_ref[0, 0])
        return

    s_out_ref[0] = s_acc
    inv_k = jnp.float32(1.0 / k)
    if ablate == "novec":
        v_out_ref[0] = jnp.zeros_like(v_out_ref[0])
    else:
        for i in range(3):
            v_out_ref[0, V_out * i : V_out * (i + 1), :] = v_acc[i] * inv_k
    if S > 0:
        ssum_ref[0, 0] = se_sum
    else:
        ssum_ref[0, 0] = jnp.zeros_like(ssum_ref[0, 0])


def _round3_tiles(N: int, k: int, C: int, S: int, V: int, S_out: int,
                  V_out: int, mode: str, reuse: bool = False):
    """(T, R) under the ~16 MB VMEM budget.

    Live state: ~4 (N, T) i32/f32 selection arrays + (PC, T) gather + fixed
    (C/PC, N) sources, plus the chunk's (rows, R*T) block intermediates
    (~4C + 4(2S+6V) + 2S_out + 5V_out rows of f32).

    ``reuse`` (wins_in rounds): the selection key arrays never exist — the
    live T-proportional state is the chunk's G=8 concatenated (N, T) int8
    one-hot masks (gather_dots) plus decode rows.
    """
    budget = 11 * 1024 * 1024
    gb8 = _gb8(mode)
    nplanes = 4 if mode == "exact" else (1 if gb8 else 2)
    fixed = N * C * 4 * 2 + N * nplanes * _plane_stride_t(C)
    per_t = N * 10 if reuse else N * 4 * (5 if mode == "exact" else 4)
    rows = 4 * C + 4 * (2 * S + 6 * V) + 2 * S_out + 5 * V_out + 16
    # Mosaic requires the block's lane dim be a multiple of 128 or the full
    # array dim: T is either N (small clouds) or a multiple-of-128 divisor
    T = max(128, (budget // 2 - fixed) // max(per_t, 1) // 128 * 128)
    p2 = 128
    while p2 * 2 <= T:
        p2 *= 2
    T = p2
    while N % T and T > 128:
        T //= 2
    T = min(T, 512)
    if N % T:
        T = N  # N < 128 or not a multiple of 128: whole-cloud tiles
    return T, min(_SEL_G, k)


BS = 128  # Morton block size for window pruning (lane-tile aligned)


def morton_order(points: jax.Array, bits: int = 10) -> jax.Array:
    """(B, N, 3) -> (B, N) int32 permutation sorting points by Morton code.

    Sort once at model entry: all pooling is permutation-invariant (cls)
    or undone with one take at the end (partseg); every round's window
    pruning then works on spatially-coherent blocks. ref hot spot:
    sv_util.py:19-25 (the kNN this accelerates on surface data).
    """
    lo = jnp.min(points, axis=1, keepdims=True)
    hi = jnp.max(points, axis=1, keepdims=True)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * ((1 << bits) - 1))
    q = q.astype(jnp.uint32)
    code = jnp.zeros(points.shape[:2], jnp.uint32)
    for b in range(bits):
        for c in range(3):
            bit = (q[..., c] >> b) & 1
            code = code | (bit << (3 * b + c))
    return jnp.argsort(code, axis=1).astype(jnp.int32)


def _prune_prepass(src: jax.Array, k: int, T: int, W: int):
    """Certify per-tile candidate block sets for exact kNN on (Morton-)
    sorted clouds.

    tau[b, n] = kth-best negative sqdist within the point's own tile (an
    upper bound on the true kth distance, the tile having T >= k points);
    a BS-row source block is prunable for a tile iff EVERY tile point's
    bbox lower-bound distance to it exceeds tau (strict, so exact ties
    keep the block). Returns (keep (B, nt, nb) int32 flags, ok — True iff
    every tile's kept blocks fit the W-row compaction capacity). When ok
    is False the caller falls back to the full scan: exact results either
    way, data-dependent speed (PERF.md 'Morton' lever; the win grows with
    N as the kNN balls shrink relative to the object — measured span
    stats in PERF.md r3).
    """
    B, N, C = src.shape
    nt, nb = N // T, N // BS
    xb = src.reshape(B, nb, BS, C)
    # banded tau: kth-best distance among each block's own + adjacent
    # blocks (384 row-neighbour candidates ⊇ the r3.0 ±64 band, so tau is
    # at least as tight), via ONE batched MXU matmul — the r3.0 rolled
    # direct-diff version cost ~17 ms/cloud at N=16k (128 full (B, N, C)
    # passes) and single-handedly made windowing an end-to-end LOSS; the
    # blocked matmul form is ~100x cheaper. Wrapped blocks at the ends are
    # merely extra candidate members, so tau stays a valid upper bound.
    # Tile-local tau (the r3 first cut) collapses on jump tiles whose own
    # points are spatially scattered.
    nbhd = jnp.concatenate(
        [jnp.roll(xb, 1, axis=1), xb, jnp.roll(xb, -1, axis=1)], axis=2
    )  # (B, nb, 3*BS, C)
    xy = jnp.einsum(
        "bnic,bnjc->bnij", xb, nbhd, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = (
        jnp.sum(xb * xb, -1)[..., None]
        + jnp.sum(nbhd * nbhd, -1)[:, :, None, :]
        - 2.0 * xy
    )  # (B, nb, BS, 3*BS)
    tau = -jax.lax.top_k(-d2.reshape(B, N, 3 * BS), k)[0][..., k - 1]
    # float-safety margin: lb2 below uses the direct (x-y)^2 form, but
    # tau above AND the kernel's ranking use the cancellation-prone
    # 2<x,y> - |x|^2 - |y|^2 form, whose absolute error is
    # O(eps_f32 * |x|^2). Inflate tau by a bound on BOTH errors (~80 ulps
    # of the largest squared norm) so a pruned block can never hold a row
    # the kernel's own ordering would select — keeping the certificate
    # exact under all distance forms. The inflation is ~2e-5 of the
    # cloud's scale^2: pruning loss is nil.
    mx = jnp.max(jnp.sum(src * src, axis=-1), axis=1)  # (B,)
    tau = tau + (2e-5 * mx + 1e-30)[:, None]

    lo = jnp.min(xb, axis=2)  # (B, nb, C)
    hi = jnp.max(xb, axis=2)

    # per-block bbox lower bounds, one (B, N) slab at a time — the r3.0
    # version materialized (B, N, nb, C) (gigabytes at N=16k), HBM-bound
    def body(i, keep):
        d = jnp.maximum(
            jnp.maximum(lo[:, i][:, None] - src, src - hi[:, i][:, None]),
            0.0,
        )  # (B, N, C), direct form — no cancellation
        lb2 = jnp.sum(d * d, axis=-1)  # (B, N)
        prune_pt = (lb2 > tau).reshape(B, nt, T)  # strict: ties keep
        col = 1 - jnp.all(prune_pt, axis=2).astype(jnp.int32)  # (B, nt)
        return jax.lax.dynamic_update_slice(
            keep, col[:, :, None], (0, 0, i)
        )
    keep = jax.lax.fori_loop(
        0, nb, body, jnp.zeros((B, nt, nb), jnp.int32)
    )
    ok = jnp.all(jnp.sum(keep, axis=-1) * BS <= W)
    return keep, ok


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "S_out", "V_out", "k", "T", "R", "binary",
                     "mode", "interpret", "window", "emit_wins", "ablate",
                     "cm", "gather_window"),
)
def sv_round3(
    src: jax.Array,   # (B, N, S + 3V): [s | v flat i-major], row-major
    folded: Dict[str, jax.Array],
    *, S: int, V: int, S_out: int, V_out: int, k: int, T: int = 0, R: int = 0,
    binary: bool = True, mode: str = "exact", interpret: bool = False,
    window: int = 0, wins_in: jax.Array | None = None,
    emit_wins: bool = False, ablate: str = "", cm: bool = False,
    gather_window: int = 0,
):
    """v3 fused round; drop-in contract-compatible with sv_round2.

    Returns (s_out (B, N, S_out), v_out UNGATED (B, N, 3*V_out),
    s_edge_mean (B, 2S)) — plus the (B, k, N) int32 winner-row tensor when
    ``emit_wins`` (rank-major per-target neighbour ids, feedable to a later
    round's ``wins_in`` for graph reuse, config.graph_reuse).

    ``window`` (0 = off): candidate-window width for Morton-sorted inputs.
    A certified prepass restricts selection + gather to W source rows per
    tile with a lax.cond full-scan fallback — exact-mode results are
    bitwise the full scan's; fast/approx differ only within their own
    quantization-tie class.

    ``gather_window`` (0 = off; requires ``wins_in``): gather-compaction
    width for graph-reuse rounds (config.reuse_gather_window). The
    winner ids are known before the kernel runs, so a cheap XLA prepass
    flags the 128-row blocks containing each tile's winners and the
    kernel gathers from a W-row compaction of just those — BITWISE
    identical to the full-width gather, with a lax.cond full-scan
    fallback when any tile's winner blocks exceed W rows.

    ``ablate`` (profiling only, outputs are garbage): "sel" = key build +
    selection only; "gather" = + one-hot gather + decode, no block math;
    "noz" = full minus the quadratic Vector2Scalar; "novec" = full minus
    the vector output stream.
    The legs behind PERF.md's v3 stage tables (tools/bench_round3_stages.py).

    ``cm`` (channel-major plumbing): ``src`` arrives (B, C, N) and
    s_out/v_out return (B, S_out, N)/(B, 3*V_out, N) untransposed — the
    engines keep activations channel-major BETWEEN rounds, cutting the
    XLA transpose sandwich from 3 relayouts per round to 1. Values are
    bitwise identical to the row-major contract (pure data movement).
    """
    assert mode in MODES, mode
    assert wins_in is None or not window, "graph reuse excludes windowing"
    assert wins_in is None or not emit_wins
    assert wins_in is not None or not gather_window, \
        "gather_window requires wins_in (graph-reuse rounds)"
    if cm:  # channel-major plumbing: src arrives (B, C, N)
        B, _, N = src.shape
    else:
        B, N, _ = src.shape
    C = S + 3 * V
    if not T or not R:
        T0, R0 = _round3_tiles(N, k, C, S, V, S_out, V_out, mode,
                               reuse=wins_in is not None)
        T = T or T0
        R = R or R0
    # gather/block chunking is pinned to the extraction group size in both
    # paths (bitwise-identical pooled-sum association between a normal
    # round and its wins_in replay); R only sizes the chunk scratch
    R = max(R, min(_SEL_G, k))
    assert N % T == 0, (N, T)
    assert mode == "exact" or N <= (1 << 20)
    exact = mode == "exact"

    reuse = wins_in is not None
    if cm:
        srcT = src  # already (B, C, N); ONE transpose for the kernel's
        # row-major distance operand — statically dead under graph reuse
        # (take_wins skips phase 1), so skip the relayout AND its DMA then
        src = None if reuse else jnp.swapaxes(srcT, 1, 2)
    else:
        srcT = jnp.swapaxes(src, 1, 2)  # (B, C, N)
        if reuse:
            src = None
    gb8 = _gb8(mode)
    if exact:
        planesT = pack_planes_exact_t(srcT)
        invT = jnp.ones((C, 1), jnp.float32)
        PC = 4 * _plane_stride_t(C)
    elif gb8:
        planesT, invT = pack_planes_q8_t(srcT)
        PC = _plane_stride_t(C)
    else:
        planesT, invT = pack_planes_fast_t(srcT)
        PC = 2 * _plane_stride_t(C)
    if reuse:  # src_ref/aa_ref are never read in the take_wins branch —
        # pass (1, 1, 1) dummies so no (B, N, C) operand is built or DMA'd
        src = jnp.zeros((B, 1, 1), jnp.float32)
        aa = jnp.zeros((B, 1, 1), jnp.float32)
        src_spec = aa_spec = pl.BlockSpec(
            (1, 1, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        aa = jnp.sum(src * src, axis=2, keepdims=True)  # (B, N, 1)
        src_spec = pl.BlockSpec(
            (1, N, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        )
        aa_spec = pl.BlockSpec(
            (1, N, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        )

    # kernel-friendly param orientations (tiny, folded once per call)
    twoV = 2 * V
    IN1 = 2 * S + 6 * V
    wzc = folded["wz"]  # (2V, 3) — columns read as (2V, 1) broadcasts
    w1T = jnp.swapaxes(folded["w1"], 0, 1)          # (S_out, IN1)
    betaT = jnp.swapaxes(folded["beta"], 0, 1)      # (IN1, 1)
    a1T = jnp.swapaxes(folded["a1"], 0, 1)          # (S_out, 1)
    b1T = jnp.swapaxes(folded["b1"], 0, 1)
    w2T = jnp.swapaxes(folded["w2"], 0, 1)          # (V_out, 2V)
    scale2T = jnp.swapaxes(folded["scale2"], 0, 1)  # (V_out, 1)
    a2T = jnp.swapaxes(folded["a2"], 0, 1)
    b2T = jnp.swapaxes(folded["b2"], 0, 1)

    const = lambda b, t: (0, 0)
    nt = N // T

    def call(W, keep):
        scratch = [pltpu.VMEM((C, R * T), jnp.float32)]
        if W < N and reuse:
            # gather compaction: only planes + absolute row ids (selection
            # already ran — no src/aa distance operands)
            scratch += [
                pltpu.VMEM((PC, W), jnp.int8),
                pltpu.VMEM((W, 1), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ]
        elif W < N:
            scratch += [
                pltpu.VMEM((W, C), jnp.float32),
                pltpu.VMEM((PC, W), jnp.int8),
                pltpu.VMEM((W, 1), jnp.float32),
                pltpu.VMEM((W, 1), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ]
        in_specs = [
            src_spec,
            pl.BlockSpec((1, C, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
            aa_spec,
            pl.BlockSpec((1, nt, keep.shape[2]), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((twoV, 3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, IN1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((IN1, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, twoV), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
        ]
        operands = [
            src, srcT, planesT, invT, aa, keep,
            wzc, w1T, betaT, a1T, b1T, w2T, scale2T, a2T, b2T,
        ]
        if wins_in is not None:
            in_specs.append(pl.BlockSpec(
                (1, k, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ))
            operands.append(wins_in)
        out_specs = [
            pl.BlockSpec((1, S_out, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * V_out, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max(2 * S, 1), 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, S_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 3 * V_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, nt, max(2 * S, 1), 1), jnp.float32),
        ]
        if emit_wins:
            out_specs.append(pl.BlockSpec(
                (1, k, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ))
            out_shape.append(jax.ShapeDtypeStruct((B, k, N), jnp.int32))
        return pl.pallas_call(
            functools.partial(
                _round3_kernel,
                S=S, V=V, S_out=S_out, V_out=V_out, k=k, R=R, T=T, N=N, W=W,
                binary=binary, mode=mode, gb8=gb8,
                take_wins=wins_in is not None, emit_wins=emit_wins,
                blk8=config.round_block_matmul == "int8",
                fused_sel=config.exact_selection == "fused",
                ablate=ablate,
            ),
            grid=(B, nt),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(*operands)

    keep_dummy = jnp.zeros((B, nt, 1), jnp.int32)
    if window and 0 < window < N:
        assert window % BS == 0 and window >= T, (window, T)
        if mode == "approx":
            assert window % 2 == 0, window
        keep, ok = _prune_prepass(src, k, T, window)
        res = jax.lax.cond(
            ok,
            lambda: call(window, keep),
            lambda: call(N, keep_dummy),
        )
    elif reuse and 0 < gather_window < N:
        assert gather_window % BS == 0, gather_window
        nbk = N // BS
        blk_t = (wins_in // BS).reshape(B, k, nt, T)
        bidx = jax.lax.broadcasted_iota(jnp.int32, blk_t.shape, 0)
        tidx = jax.lax.broadcasted_iota(jnp.int32, blk_t.shape, 2)
        keep = (
            jnp.zeros((B, nt, nbk), jnp.int32).at[bidx, tidx, blk_t].max(1)
        )
        ok = jnp.all(jnp.sum(keep, axis=-1) * BS <= gather_window)
        res = jax.lax.cond(
            ok,
            lambda: call(gather_window, keep),
            lambda: call(N, keep_dummy),
        )
    else:
        res = call(N, keep_dummy)
    s_out, v_out, ssum = res[:3]
    s_edge_mean = jnp.sum(ssum[:, :, :, 0], axis=1) / (N * k)
    if cm:  # channel-major out: (B, S_out, N), (B, 3*V_out, N) as written
        out = (s_out, v_out, s_edge_mean)
    else:
        out = (
            jnp.swapaxes(s_out, 1, 2),
            jnp.swapaxes(v_out, 1, 2),
            s_edge_mean,
        )
    return out + (res[3],) if emit_wins else out


# ---------------------------------------------------------------------------
# first-round kernel (coords input, FP block, optional cross channel)
# ---------------------------------------------------------------------------


def _round3_first_kernel(
    pts_ref, ptsT_ref, planesT_ref, invT_ref, aa_ref, keep_ref,
    wz0c_ref, wz1c_ref, w1T_ref, a1T_ref, b1T_ref,
    w2T_ref, a2T_ref, b2T_ref,
    s_out_ref, v_out_ref, ssum_ref,
    *rest,
    S_out: int, V_out: int, k: int, R: int, T: int, N: int, W: int,
    mode: str, cross: bool, gb8: bool = False, emit_wins: bool = False,
    fused_sel: bool = False,
):
    """First fused round, transposed. All quantities are single (1, L) rows
    (C=3 coords), so EVERY contraction is exact f32 VPU FMA work — the
    padded HIGHEST K=2..6 matmuls that dominated v2's first round
    (PERF.md:99-105) are gone entirely; only w1 (K=6*n_ch) and w2 stay on
    the MXU.
    """
    winsout_ref = rest[0] if emit_wins else None
    cmp_scratch = rest[1:] if emit_wins else rest
    C = 3
    n_ch = 3 if cross else 2
    exact = mode == "exact"
    prec = jax.lax.Precision.HIGHEST if exact else None

    t = pl.program_id(1)
    ctrT_raw = ptsT_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]  # (3, T)
    if exact:
        ctr_g = ctrT_raw
    else:
        cpl = planesT_ref[0, :, pl.ds(pl.multiple_of(t * T, T), T)]
        ctr_g = (_decode_ctr_q8_t if gb8 else _decode_ctr_fast_t)(
            cpl, invT_ref[:], C
        )

    if W == N:
        pts_w = pts_ref[0]  # (N, 3)
        aa_w = aa_ref[0]
        planes_w = planesT_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        valid = None
    else:
        pts_cmp, planes_cmp, aa_cmp, rows_cmp, cur_ref = cmp_scratch
        nb = N // BS
        cur_ref[0] = 0
        # padding rows must never match a winner id in the gather mask
        rows_cmp[...] = jnp.full((W, 1), -1, jnp.int32)
        for bk in range(nb):
            @pl.when(keep_ref[0, t, bk] > 0)
            def _(bk=bk):
                c = cur_ref[0]
                dst = pl.ds(pl.multiple_of(c * BS, BS), BS)
                pts_cmp[dst, :] = pts_ref[0, bk * BS : (bk + 1) * BS, :]
                planes_cmp[:, dst] = planesT_ref[0, :, bk * BS : (bk + 1) * BS]
                aa_cmp[dst, :] = aa_ref[0, bk * BS : (bk + 1) * BS, :]
                rows_cmp[dst, :] = (
                    jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0) + bk * BS
                )
                cur_ref[0] = c + 1
        cnt = cur_ref[0] * BS
        pts_w = pts_cmp[:]
        aa_w = aa_cmp[:]
        planes_w = planes_cmp[:]
        rows = rows_cmp[:]
        local = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        valid = local < cnt
    inner = jax.lax.dot_general(
        pts_w, ctrT_raw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    tt = jnp.sum(ctrT_raw * ctrT_raw, axis=0, keepdims=True)
    neg = 2.0 * inner - aa_w - tt
    if valid is not None:
        neg = jnp.where(valid, neg, 0.0)
    key = _build_key_t(neg, rows, N, mode, W, valid)
    if fused_sel and exact:
        wins = None  # extracted inside the fused chunk loop below
        m = jnp.max(key, axis=0, keepdims=True)
    else:
        wins = _select_rows(key, rows, N, k, mode)  # k winner ids up front
        if emit_wins:
            for r in range(k):
                winsout_ref[0, r : r + 1, :] = wins[r]

    wz0cols = [wz0c_ref[:, j : j + 1] for j in range(3)]  # (n_ch, 1)
    wz1cols = [wz1c_ref[:, j : j + 1] for j in range(3)]

    s_acc = None
    v_acc = None
    ss_acc = None

    grp_sizes = []
    left = k
    while left > 0:
        grp_sizes.append(min(_SEL_G, left))
        left -= grp_sizes[-1]

    done = 0
    for R in grp_sizes:
        # per-rank compares + mask concat, ONE wide one-hot matmul
        # (bitwise equal to per-rank dots — matmul columns are
        # independent; the single-wide-compare variant measured -12%
        # cls exact, see sv_round3's gather_dots)
        if wins is None:
            # fused exact selection (see _round3_kernel): the update
            # loop's ``rows == winner`` predicate doubles as the one-hot
            # mask column — one (W, T) compare per rank instead of two
            masks = []
            for j in range(R):
                amin = jnp.min(
                    jnp.where(key == m, rows, _BIG), axis=0, keepdims=True
                )
                if emit_wins:
                    winsout_ref[0, done + j : done + j + 1, :] = amin
                eq = rows == amin
                masks.append(eq.astype(jnp.int8))
                if done + j + 1 < k:
                    key = jnp.where(eq, _INT_MIN, key)
                    m = jnp.max(key, axis=0, keepdims=True)
        else:
            masks = [
                (rows == wins[done + r]).astype(jnp.int8) for r in range(R)
            ]
        gg = jax.lax.dot_general(
            planes_w, jnp.concatenate(masks, axis=1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (PC, R*T)
        done += R
        # one wide decode of the whole (PC, R*T) group (the decoders are
        # width-generic row slicers)
        nbrT = (
            _decode_exact_t(gg, C) if exact else
            (_decode_q8_t if gb8 else _decode_fast_t)(gg, invT_ref[:], C)
        )  # (3, L) — tiny, no scratch

        L = R * T
        ctr_rep = jnp.tile(ctr_g, (1, R))  # (3, L)
        e = nbrT - ctr_rep

        # v_e[i] rows: [e_i, ctr_i(, cross_i)] — built as (n_ch, L) stacks
        if cross:
            nb = [nbrT[i : i + 1, :] for i in range(3)]
            cg = [ctr_rep[i : i + 1, :] for i in range(3)]
            cr = [
                nb[1] * cg[2] - nb[2] * cg[1],
                nb[2] * cg[0] - nb[0] * cg[2],
                nb[0] * cg[1] - nb[1] * cg[0],
            ]
            v_e = [
                jnp.concatenate([e[i : i + 1, :], cg[i], cr[i]], axis=0)
                for i in range(3)
            ]  # (3, L) x3
        else:
            v_e = [
                jnp.concatenate([e[i : i + 1, :], ctr_rep[i : i + 1, :]], axis=0)
                for i in range(3)
            ]  # (2, L) x3

        # shared lane-concat (see _round3_kernel r3.3): Vector2Scalar and
        # linear2 apply the SAME weights per spatial component — 3 narrow
        # ops become 1 wide op each, bitwise identical
        v_cat = jnp.concatenate(v_e, axis=1)  # (n_ch, 3L)

        def pieces(wzcols):
            z_cat = _zvpu(wzcols, v_cat)  # z_cat[j]: (1, 3L)
            out = []
            for jj in range(3):
                p = v_cat * z_cat[jj]  # (n_ch, 3L)
                # same left-assoc add order as the per-component form
                out.append(p[:, 0:L] + p[:, L : 2 * L] + p[:, 2 * L : 3 * L])
            return out

        sva = pieces(wz0cols)
        svb = pieces(wz1cols)

        # init_scalar partial sums (j-major rows jj*n_ch + c; the wrapper
        # permutes to the reference's c*3+j order in XLA)
        chunk_ss = jnp.concatenate(
            [jnp.sum(sva[jj], axis=1, keepdims=True) for jj in range(3)], axis=0
        )  # (3*n_ch, 1)
        ss_acc = chunk_ss if ss_acc is None else ss_acc + chunk_ss

        x_cat = jnp.concatenate(sva + svb, axis=0)  # (6*n_ch, L)
        h = jax.lax.dot_general(
            w1T_ref[:], x_cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (S_out, L)
        y = h * a1T_ref[:] + b1T_ref[:]
        y = jnp.where(y >= 0, y, 0.2 * y)
        for r in range(R):
            ys = y[:, r * T : (r + 1) * T]
            s_acc = ys if s_acc is None else jnp.maximum(s_acc, ys)

        wl_cat = jax.lax.dot_general(
            w2T_ref[:], v_cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (V_out, 3L) — one dot over the shared concat, bitwise equal
        wl = [wl_cat[:, i * L : (i + 1) * L] for i in range(3)]
        nsq = wl[0] * wl[0] + wl[1] * wl[1] + wl[2] * wl[2]
        nrm = jnp.sqrt(nsq) + EPS
        f = a2T_ref[:] + b2T_ref[:] / nrm
        vcur = []
        for i in range(3):
            vi = wl[i] * f
            vsum = vi[:, 0:T]
            for r in range(1, R):
                vsum = vsum + vi[:, r * T : (r + 1) * T]
            vcur.append(vsum)
        v_acc = vcur if v_acc is None else [a + b for a, b in zip(v_acc, vcur)]

    s_out_ref[0] = s_acc
    inv_k = jnp.float32(1.0 / k)
    for i in range(3):
        v_out_ref[0, V_out * i : V_out * (i + 1), :] = v_acc[i] * inv_k
    ssum_ref[0, 0] = ss_acc


@functools.partial(
    jax.jit,
    static_argnames=("S_out", "V_out", "k", "T", "R", "mode", "cross",
                     "interpret", "window", "emit_wins", "cm"),
)
def sv_round3_first(
    points: jax.Array,  # (B, N, 3)
    folded: Dict[str, jax.Array],
    *, S_out: int, V_out: int, k: int, T: int = 0, R: int = 0,
    mode: str = "exact", cross: bool = False, interpret: bool = False,
    window: int = 0, emit_wins: bool = False, cm: bool = False,
):
    """v3 fused first round; contract-compatible with sv_round2_first.

    Returns (s_out (B, N, S_out), v_out UNGATED (B, N, 3*V_out),
    s_mean (B, 3*n_ch) in the reference's c*3+j channel order) — plus the
    (B, k, N) int32 xyz-kNN winner tensor when ``emit_wins`` (graph reuse,
    config.graph_reuse='spatial').
    ``window``: see sv_round3 (Morton-sorted candidate windows).
    """
    assert mode in MODES, mode
    B, N, _ = points.shape
    n_ch = 3 if cross else 2
    if not T or not R:
        T0, R0 = _round3_tiles(N, k, 3, 0, 1, S_out, V_out, mode)
        T = T or T0
        R = R or R0
    assert N % T == 0, (N, T)  # chunking is group-patterned, R sizes scratch
    exact = mode == "exact"

    ptsT = jnp.swapaxes(points, 1, 2)  # (B, 3, N)
    gb8 = _gb8(mode)
    if exact:
        planesT = pack_planes_exact_t(ptsT)
        invT = jnp.ones((3, 1), jnp.float32)
        PC = 4 * _plane_stride_t(3)
    elif gb8:
        planesT, invT = pack_planes_q8_t(ptsT)
        PC = _plane_stride_t(3)
    else:
        planesT, invT = pack_planes_fast_t(ptsT)
        PC = 2 * _plane_stride_t(3)
    aa = jnp.sum(points * points, axis=2, keepdims=True)

    w1T = jnp.swapaxes(folded["w1"], 0, 1)  # (S_out, 6*n_ch)
    a1T = jnp.swapaxes(folded["a1"], 0, 1)
    b1T = jnp.swapaxes(folded["b1"], 0, 1)
    w2T = jnp.swapaxes(folded["w2"], 0, 1)  # (V_out, n_ch)
    a2T = jnp.swapaxes(folded["a2"], 0, 1)
    b2T = jnp.swapaxes(folded["b2"], 0, 1)

    const = lambda b, t: (0, 0)
    nt = N // T

    def call(W, keep):
        scratch = []
        if W < N:
            scratch = [
                pltpu.VMEM((W, 3), jnp.float32),
                pltpu.VMEM((PC, W), jnp.int8),
                pltpu.VMEM((W, 1), jnp.float32),
                pltpu.VMEM((W, 1), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ]
        out_specs = [
            pl.BlockSpec((1, S_out, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * V_out, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * n_ch, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, S_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 3 * V_out, N), jnp.float32),
            jax.ShapeDtypeStruct((B, nt, 3 * n_ch, 1), jnp.float32),
        ]
        if emit_wins:
            out_specs.append(pl.BlockSpec(
                (1, k, T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ))
            out_shape.append(jax.ShapeDtypeStruct((B, k, N), jnp.int32))
        return pl.pallas_call(
            functools.partial(
                _round3_first_kernel,
                S_out=S_out, V_out=V_out, k=k, R=R, T=T, N=N, W=W, mode=mode,
                cross=cross, gb8=gb8, emit_wins=emit_wins,
                fused_sel=config.exact_selection == "fused",
            ),
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PC, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, 1), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, keep.shape[2]), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_ch, 3), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((n_ch, 3), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((S_out, 6 * n_ch), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((S_out, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((V_out, n_ch), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((V_out, 1), const, memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            points, ptsT, planesT, invT, aa, keep,
            folded["wz0"], folded["wz1"], w1T, a1T, b1T, w2T, a2T, b2T,
        )

    keep_dummy = jnp.zeros((B, nt, 1), jnp.int32)
    if window and 0 < window < N:
        assert window % BS == 0 and window >= T, (window, T)
        if mode == "approx":
            assert window % 2 == 0, window
        keep, ok = _prune_prepass(points, k, T, window)
        res = jax.lax.cond(
            ok,
            lambda: call(window, keep),
            lambda: call(N, keep_dummy),
        )
    else:
        res = call(N, keep_dummy)
    s_out, v_out, ssum = res[:3]
    # kernel rows are j-major (jj*n_ch + c); the reference gate consumes
    # c-major (c*3 + j)
    perm = jnp.asarray(
        [jj * n_ch + c for c in range(n_ch) for jj in range(3)], dtype=jnp.int32
    )
    s_mean = jnp.sum(ssum[:, :, :, 0], axis=1)[:, perm] / (N * k)
    if cm:  # channel-major out (see sv_round3): engines skip the swaps
        out = (s_out, v_out, s_mean)
    else:
        out = (
            jnp.swapaxes(s_out, 1, 2),
            jnp.swapaxes(v_out, 1, 2),
            s_mean,
        )
    return out + (res[3],) if emit_wins else out

