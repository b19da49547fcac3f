"""sv_round3 (v3 transposed fused round) vs sv_round2 — interpret parity.

The v2 kernel is verified against v1 (test_sv_round2) and v1 against the
flax path (test_infer_engine, test_sv_edge_kernel); v2-vs-v3 parity plus the
default-suite engine smoke (test_kernel_smoke, which runs the round3 chain
against model.apply) transfers the whole chain. v3's block math is exact
f32 VPU work, so even fast mode differs from v2 only by reassociation ulps
given identical neighbour sets and gathers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu.ops.pallas.sv_round2 import sv_round2, sv_round2_first
from svnet_tpu.ops.pallas.sv_round3 import (
    pack_planes_exact_t,
    sv_round3,
    sv_round3_first,
)

B, N, K, T = 2, 128, 8, 32
S, V, S_out, V_out = 16, 5, 32, 10


def _folded(key):
    ks = jax.random.split(key, 9)
    return {
        "wz": jax.random.normal(ks[0], (2 * V, 3)),
        "w1": jax.random.normal(ks[1], (2 * S + 6 * V, S_out)),
        "beta": 0.1 * jax.random.normal(ks[2], (1, 2 * S + 6 * V)),
        "a1": 1.0 + 0.1 * jax.random.normal(ks[3], (1, S_out)),
        "b1": 0.1 * jax.random.normal(ks[4], (1, S_out)),
        "w2": jax.random.normal(ks[5], (2 * V, V_out)),
        "scale2": 1.0 + 0.1 * jax.random.normal(ks[6], (1, V_out)),
        "a2": 1.0 + 0.1 * jax.random.normal(ks[7], (1, V_out)),
        "b2": 0.1 * jax.random.normal(ks[8], (1, V_out)),
    }


def _folded_first(key, n_ch=2):
    ks = jax.random.split(key, 8)
    return {
        "wz0": jax.random.normal(ks[0], (n_ch, 3)),
        "wz1": jax.random.normal(ks[1], (n_ch, 3)),
        "w1": jax.random.normal(ks[2], (6 * n_ch, S_out)),
        "a1": 1.0 + 0.1 * jax.random.normal(ks[3], (1, S_out)),
        "b1": 0.1 * jax.random.normal(ks[4], (1, S_out)),
        "w2": jax.random.normal(ks[5], (n_ch, V_out)),
        "a2": 1.0 + 0.1 * jax.random.normal(ks[6], (1, V_out)),
        "b2": 0.1 * jax.random.normal(ks[7], (1, V_out)),
    }


def test_plane_packing_t_roundtrip_exact():
    from svnet_tpu.ops.pallas.sv_round3 import _decode_exact_t

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 11, 33)) * 123.4
    planes = pack_planes_exact_t(x).astype(jnp.int32)
    back = jnp.stack([_decode_exact_t(planes[b], 11) for b in range(2)])
    assert float(jnp.abs(back - x).max()) == 0.0


@pytest.mark.parametrize("mode,binary", [("exact", True), ("exact", False),
                                         ("fast", True)])
def test_round3_matches_round2(mode, binary):
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K, T=T, binary=binary,
              interpret=True)
    s2, v2, g2 = sv_round2(src, folded, mode=mode, **kw)
    s3, v3, g3 = sv_round3(src, folded, mode=mode, R=4, **kw)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cross", [False, True])
def test_round3_first_matches_round2(cross):
    pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    folded = _folded_first(jax.random.PRNGKey(1), n_ch=3 if cross else 2)
    kw = dict(S_out=S_out, V_out=V_out, k=K, T=T, cross=cross, interpret=True)
    s2, v2, g2 = sv_round2_first(pts, folded, mode="exact", **kw)
    s3, v3, g3 = sv_round3_first(pts, folded, mode="exact", R=4, **kw)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_round3_approx_shapes_finite():
    src = jax.random.normal(jax.random.PRNGKey(0), (B, 512, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    s, v, g = sv_round3(
        src, folded, S=S, V=V, S_out=S_out, V_out=V_out, k=K, T=64, R=4,
        binary=True, mode="approx", interpret=True,
    )
    assert s.shape == (B, 512, S_out) and v.shape == (B, 512, 3 * V_out)
    assert np.isfinite(np.asarray(s)).all() and np.isfinite(np.asarray(v)).all()


def test_round3_approx_fold_width_knob():
    """config.approx_fold trades fold width for recall: with L >= N the
    fold is a no-op and approx must match fast BITWISE (same packed keys,
    same selection, same gathers); an intermediate width still returns
    finite outputs of the right shape."""
    from svnet_tpu import config

    src = jax.random.normal(jax.random.PRNGKey(2), (B, 128, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(3))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=4, T=64, R=4,
              binary=True, interpret=True)
    fast = sv_round3(src, folded, mode="fast", **kw)
    old = config.approx_fold
    try:
        config.set_approx_fold(128)
        a_nofold = sv_round3(src, folded, mode="approx", **kw)
        config.set_approx_fold(64)
        a_64 = sv_round3(src, folded, mode="approx", **kw)
    finally:
        config.approx_fold = old
    for got, want in zip(a_nofold, fast):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert all(np.isfinite(np.asarray(x)).all() for x in a_64)


def test_round3_approx_q8_gather():
    """config.approx_gather_bits=8 (one int8 gather plane): identical
    neighbour SELECTION to 16-bit approx (keys/fold untouched — asserted
    via the selection-driven s_edge_mean changing only with gather
    precision), outputs within the ~2^-8-of-channel-max decode error,
    plane roundtrip exact on the q8 grid."""
    from svnet_tpu import config
    from svnet_tpu.ops.pallas.sv_round3 import _decode_ctr_q8_t, pack_planes_q8_t

    # packer roundtrip: error bounded by half a q8 step per channel
    g = jax.random.normal(jax.random.PRNGKey(0), (2, 11, 33)) * 50
    planes, inv = pack_planes_q8_t(g)
    back = jnp.stack([_decode_ctr_q8_t(planes[b], inv, 11) for b in range(2)])
    step = np.asarray(jnp.max(jnp.abs(g), axis=(0, 2))) / 127.0
    err = np.abs(np.asarray(back) - np.asarray(g))
    assert (err <= 0.5 * step[None, :, None] * 1.001).all()

    src = jax.random.normal(jax.random.PRNGKey(2), (B, 128, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(3))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=4, T=64, R=4,
              binary=True, mode="approx", interpret=True)
    a16 = sv_round3(src, folded, **kw)
    old = config.approx_gather_bits
    try:
        config.set_approx_gather_bits(8)
        a8 = sv_round3(src, folded, **kw)
    finally:
        config.approx_gather_bits = old
        jax.clear_caches()
    # same selection; binarized block math absorbs most decode error —
    # compare at a tolerance scaled to the 8-bit absolute error envelope
    for got, want in zip(a8, a16):
        g_, w_ = np.asarray(got), np.asarray(want)
        assert np.isfinite(g_).all()
        assert np.mean(np.abs(g_ - w_)) < 0.15 * np.mean(np.abs(w_)) + 1e-3


def test_round3_fast_gb8_gather():
    """config.fast_gather_bits=8: fast-quality selection with one int8
    gather plane. With the approx fold disabled (fold >= N) approx and
    fast share identical packed keys and selection, so fast+gb8 must be
    BITWISE equal to approx+gb8 — and within the q8 decode envelope of
    fast-16."""
    from svnet_tpu import config

    src = jax.random.normal(jax.random.PRNGKey(2), (B, 128, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(3))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=4, T=64, R=4,
              binary=True, interpret=True)
    f16 = sv_round3(src, folded, mode="fast", **kw)
    try:
        config.set_fast_gather_bits(8)
        f8 = sv_round3(src, folded, mode="fast", **kw)
        config.set_approx_gather_bits(8)
        config.set_approx_fold(128)  # fold >= N: approx selection == fast
        a8 = sv_round3(src, folded, mode="approx", **kw)
    finally:
        config.fast_gather_bits = 16
        config.approx_gather_bits = 16
        config.approx_fold = 256
        jax.clear_caches()
    for got, want in zip(f8, a8):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(f8, f16):
        g_, w_ = np.asarray(got), np.asarray(want)
        assert np.isfinite(g_).all()
        assert np.mean(np.abs(g_ - w_)) < 0.15 * np.mean(np.abs(w_)) + 1e-3


def test_prune_compaction_exact_matches_full():
    """Morton block-skipping (certified compaction) returns bitwise the
    full scan's results in exact mode; the uncertified path falls back."""
    from svnet_tpu.ops.pallas.sv_round3 import (
        _prune_prepass,
        morton_order,
        sv_round3_first,
    )

    rng = np.random.default_rng(0)
    p = rng.normal(size=(512, 3)).astype(np.float32)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    pts = jnp.asarray(p)[None]
    pts = jnp.take_along_axis(pts, morton_order(pts)[..., None], axis=1)

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    n_ch = 2
    ff = {
        "wz0": jax.random.normal(ks[0], (n_ch, 3)),
        "wz1": jax.random.normal(ks[1], (n_ch, 3)),
        "w1": jax.random.normal(ks[2], (6 * n_ch, S_out)),
        "a1": 1 + 0.1 * jax.random.normal(ks[3], (1, S_out)),
        "b1": 0.1 * jax.random.normal(ks[4], (1, S_out)),
        "w2": jax.random.normal(ks[5], (n_ch, V_out)),
        "a2": 1 + 0.1 * jax.random.normal(ks[6], (1, V_out)),
        "b2": 0.1 * jax.random.normal(ks[7], (1, V_out)),
    }
    kw = dict(S_out=S_out, V_out=V_out, k=4, T=128, R=4, mode="exact",
              interpret=True)
    s_full, v_full, g_full = sv_round3_first(pts, ff, **kw)
    # W=384: certified on this cloud (kept max fits); W=128: falls back
    for W in (384, 128):
        s_w, v_w, g_w = sv_round3_first(pts, ff, window=W, **kw)
        np.testing.assert_array_equal(np.asarray(s_w), np.asarray(s_full))
        np.testing.assert_array_equal(np.asarray(v_w), np.asarray(v_full))
        np.testing.assert_array_equal(np.asarray(g_w), np.asarray(g_full))


def test_top_group_tournament_vs_sort():
    """The sorted-G tuple tournament (_top_group/_select_rows fast path)
    returns exactly the descending top-G of unique keys — including the
    non-power-of-2 candidate window branch (pow2 pad with _INT_MIN) and
    the cross-sweep threshold chaining used for k > G ranks."""
    from svnet_tpu.ops.pallas.sv_round3 import _SEL_G, _top_group

    rng = np.random.default_rng(3)
    for W in (256, 384):  # pow2 and the W = 3N/4 padding branch
        # unique keys, negative-heavy like packed distance keys
        keys = rng.choice(2**20, size=(W, 8), replace=False).astype(np.int32)
        keys = jnp.asarray(keys - 2**19)
        want = np.sort(np.asarray(keys), axis=0)[::-1]  # descending
        st = None
        got = []
        for j0 in range(0, 24, _SEL_G):  # 3 chained sweeps
            tops = _top_group(keys, _SEL_G, st)
            st = tops[-1]
            got += [np.asarray(t)[0] for t in tops]
        np.testing.assert_array_equal(np.stack(got), want[:24])


def test_top_group_pair_broadcast_rows_nonpow2():
    """Regression: _top_group_pair pads rows from row's OWN shape — the
    rounds pass rows as a broadcastable (W, 1) column while values are
    (W, T); a non-power-of-2 candidate window (e.g. Morton W = 3N/4)
    previously built a (p2-n, T) row pad and crashed at trace time."""
    from svnet_tpu.ops.pallas.sv_round3 import _BIG, _top_group_pair

    rng = np.random.default_rng(7)
    W, T = 384, 8  # non-pow2 candidate window
    vals = jnp.asarray(
        rng.integers(-(2**20), 2**20, size=(W, T)).astype(np.int32)
    )
    rows = jnp.arange(W, dtype=jnp.int32)[:, None]  # (W, 1) broadcast
    tops = _top_group_pair(vals, rows, 4, None)
    v = np.asarray(vals)
    order = np.lexsort((np.broadcast_to(np.arange(W)[:, None], v.shape), -v),
                       axis=0)
    for g in range(4):
        np.testing.assert_array_equal(
            np.asarray(tops[g][0])[0], np.take_along_axis(
                v, order[g : g + 1], axis=0)[0])
        np.testing.assert_array_equal(
            np.asarray(tops[g][1])[0], order[g])
        assert int(np.asarray(tops[g][1]).max()) < _BIG


def test_exact_pair_selection_matches_update():
    """config.exact_selection='pair' (sorted-pair tournament) is BITWISE
    identical to the production update-and-rescan loop in exact mode —
    including distance ties (quantized coordinates force many) resolved to
    the same min-row-id winner."""
    from svnet_tpu import config

    # heavy ties: coordinates snapped to a coarse grid + duplicated points.
    # Tiny shapes (N=64, k=4): interpret-mode cost scales with the traced
    # op count, and the tie/tournament logic is shape-independent.
    N2, K2 = 64, 4
    src = jax.random.normal(jax.random.PRNGKey(5), (B, N2, S + 3 * V))
    src = jnp.round(src * 2.0) / 2.0
    src = src.at[:, N2 // 2 :].set(src[:, : N2 // 2])  # exact duplicates
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, mode="exact", interpret=True)

    s_u, v_u, g_u = sv_round3(src, folded, **kw)
    jax.clear_caches()  # config is read at trace time
    config.set_exact_selection("pair")
    try:
        s_p, v_p, g_p = sv_round3(src, folded, **kw)
    finally:
        config.set_exact_selection("update")
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_u))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_u))
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_u))


def test_gather_pipeline_bitwise_identical():
    """config.gather_pipeline (r5: chunk c+1's gather masks built before
    chunk c's dot is consumed) must be BITWISE identical — it only changes
    instruction scheduling, never the masks, dots, or accumulation order."""
    from svnet_tpu import config

    N2, K2 = 64, 4
    src = jax.random.normal(jax.random.PRNGKey(5), (B, N2, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, interpret=True)

    for mode in ("exact", "fast"):
        s_u, v_u, g_u = sv_round3(src, folded, mode=mode, **kw)
        jax.clear_caches()  # config is read at trace time
        config.set_gather_pipeline(True)
        try:
            s_p, v_p, g_p = sv_round3(src, folded, mode=mode, **kw)
        finally:
            config.set_gather_pipeline(False)
            jax.clear_caches()
        np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_u))
        np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_u))
        np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_u))


def test_exact_fused_selection_matches_update():
    """config.exact_selection='fused' (the update loop's ``rows == winner``
    predicate reused as the gather's one-hot mask) is BITWISE identical to
    the production update-and-rescan path in exact mode — including
    distance ties resolved to the same min-row-id winner, the emitted
    graph-reuse winner tensor, and the first round."""
    from svnet_tpu import config

    # heavy ties: coordinates snapped to a coarse grid + duplicated points
    N2, K2 = 64, 4
    src = jax.random.normal(jax.random.PRNGKey(5), (B, N2, S + 3 * V))
    src = jnp.round(src * 2.0) / 2.0
    src = src.at[:, N2 // 2 :].set(src[:, : N2 // 2])  # exact duplicates
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, mode="exact", interpret=True, emit_wins=True)
    pts = jnp.round(jax.random.normal(jax.random.PRNGKey(6), (B, N2, 3)) * 2.0) / 2.0
    folded_f = _folded_first(jax.random.PRNGKey(2))
    kwf = dict(S_out=S_out, V_out=V_out, k=K2, T=N2, R=4, mode="exact",
               interpret=True)

    s_u, v_u, g_u, w_u = sv_round3(src, folded, **kw)
    fs_u = sv_round3_first(pts, folded_f, **kwf)
    jax.clear_caches()  # config is read at trace time
    config.set_exact_selection("fused")
    try:
        s_f, v_f, g_f, w_f = sv_round3(src, folded, **kw)
        fs_f = sv_round3_first(pts, folded_f, **kwf)
    finally:
        config.set_exact_selection("update")
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_u))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_u))
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_u))
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_u))
    for a, b in zip(fs_f, fs_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_graph_reuse_wins_roundtrip(mode):
    """emit_wins -> wins_in on the SAME inputs reproduces the normal round
    bitwise, and exact-mode wins equal the XLA kNN neighbour sets
    (config.graph_reuse mechanism, ops/pallas/sv_round3.py)."""
    from svnet_tpu.ops.knn import knn

    # tiny shapes: the roundtrip is association/id bookkeeping, not math
    N2, K2 = 64, 6
    src = jax.random.normal(jax.random.PRNGKey(2), (B, N2, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(3))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, mode=mode, interpret=True)
    base = sv_round3(src, folded, **kw)
    *em, wins = sv_round3(src, folded, emit_wins=True, **kw)
    assert wins.shape == (B, K2, N2) and wins.dtype == jnp.int32
    for a, b in zip(base, em):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    re = sv_round3(src, folded, wins_in=wins, **kw)
    for a, b in zip(base, re):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if mode == "exact":
        idx = knn(src, K2)
        np.testing.assert_array_equal(
            np.sort(np.asarray(wins).transpose(0, 2, 1), -1),
            np.sort(np.asarray(idx), -1),
        )


def test_graph_reuse_first_round_emits_xyz_knn():
    from svnet_tpu.ops.knn import knn

    N2, K2 = 64, 4
    pts = jax.random.normal(jax.random.PRNGKey(4), (B, N2, 3))
    folded = _folded_first(jax.random.PRNGKey(5), n_ch=3)
    kw = dict(S_out=S_out, V_out=V_out, k=K2, T=N2, R=4, cross=True,
              mode="exact", interpret=True)
    base = sv_round3_first(pts, folded, **kw)
    *em, wins = sv_round3_first(pts, folded, emit_wins=True, **kw)
    for a, b in zip(base, em):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.sort(np.asarray(wins).transpose(0, 2, 1), -1),
        np.sort(np.asarray(knn(pts, K2)), -1),
    )


def test_reuse_gather_window_bitwise():
    """config.reuse_gather_window compaction reproduces the full-width
    reuse gather bitwise — both when the winner blocks fit the window
    (compacted branch) and when they don't (lax.cond full-scan fallback).
    Excluded rows contribute exact zeros to the int32 one-hot matmul, so
    equality is bitwise, not approximate."""
    N2, K2, T2 = 256, 4, 128  # 2 source blocks of BS=128
    folded = _folded(jax.random.PRNGKey(8))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=T2, R=4,
              binary=True, mode="exact", interpret=True)

    # block-local clouds: rows [0,128) cluster at 0, rows [128,256) at +50
    # => each tile's winners live in its own single block and W=128 fits
    base_pts = jax.random.normal(jax.random.PRNGKey(9), (B, N2, S + 3 * V))
    shift = jnp.where(jnp.arange(N2)[None, :, None] < 128, 0.0, 50.0)
    src_local = base_pts + shift
    wins = sv_round3(src_local, folded, emit_wins=True, **kw)[3]
    full = sv_round3(src_local, folded, wins_in=wins, **kw)
    cmp_ = sv_round3(src_local, folded, wins_in=wins, gather_window=128,
                     **kw)
    for a, b in zip(full, cmp_):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the compacted branch really ran: every tile's winners fit one block
    blk = np.asarray(wins) // 128  # (B, k, N)
    assert (blk[:, :, :128] == 0).all() and (blk[:, :, 128:] == 1).all()

    # shuffled cloud: winners span both blocks -> fallback, still bitwise
    src_rand = jax.random.normal(jax.random.PRNGKey(10), (B, N2, S + 3 * V))
    wins_r = sv_round3(src_rand, folded, emit_wins=True, **kw)[3]
    full_r = sv_round3(src_rand, folded, wins_in=wins_r, **kw)
    cmp_r = sv_round3(src_rand, folded, wins_in=wins_r, gather_window=128,
                      **kw)
    for a, b in zip(full_r, cmp_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_reuse_k_prefix_equals_small_k(mode):
    """config.reuse_k semantics (engine slices wins[:, :r] and runs reuse
    rounds at k=r): winner ids are emitted rank-major with deterministic
    min-row-id tie-breaking, so the first r ranks of a k=K emit ARE the
    k=r emit, and a reuse round fed that slice is BITWISE a fresh round
    run at k=r. This is the kernel-level contract the infer.py plumbing
    relies on (k-subsampling serving knob, BASELINE.md's named
    model-semantics route)."""
    N2, K2, R2 = 64, 8, 3
    src = jax.random.normal(jax.random.PRNGKey(11), (B, N2, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(12))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, T=N2, R=4,
              binary=True, mode=mode, interpret=True)

    wins_k = sv_round3(src, folded, k=K2, emit_wins=True, **kw)[3]
    *base_r, wins_r = sv_round3(src, folded, k=R2, emit_wins=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(wins_k[:, :R2]), np.asarray(wins_r)
    )
    reuse_r = sv_round3(src, folded, k=R2, wins_in=wins_k[:, :R2], **kw)
    for a, b in zip(base_r, reuse_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_round_block_matmul_int8_bitwise(mode):
    """config.round_block_matmul='int8' is value-identical to the bf16
    path: ±1 products are exact in both and the int32 sums stay far below
    2^24, so h (and everything downstream) matches bitwise."""
    from svnet_tpu import config

    N2, K2 = 64, 4
    src = jax.random.normal(jax.random.PRNGKey(6), (B, N2, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(7))
    # production binary folding emits ±1 w1 (fold_svblock_params sign());
    # the int8 path relies on that, so the fixture must too
    folded["w1"] = jnp.sign(folded["w1"])
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, mode=mode, interpret=True)
    base = sv_round3(src, folded, **kw)
    try:
        config.set_round_block_matmul("int8")
        got = sv_round3(src, folded, **kw)
    finally:
        config.set_round_block_matmul("bf16")
    for a, b in zip(base, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exact_value_selection_matches_update():
    """config.exact_selection='value' (single-plane value tournament +
    group extraction, r4) is BITWISE identical to the production
    update-and-rescan loop in exact mode — including distance ties
    (quantized duplicated coordinates) resolved to the same min-row-id
    winners in the same rank order."""
    from svnet_tpu import config

    N2, K2 = 64, 4
    src = jax.random.normal(jax.random.PRNGKey(5), (B, N2, S + 3 * V))
    src = jnp.round(src * 2.0) / 2.0
    src = src.at[:, N2 // 2 :].set(src[:, : N2 // 2])  # exact duplicates
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K2, T=N2, R=4,
              binary=True, mode="exact", interpret=True)

    s_u, v_u, g_u = sv_round3(src, folded, **kw)
    jax.clear_caches()  # config is read at trace time
    config.set_exact_selection("value")
    try:
        s_p, v_p, g_p = sv_round3(src, folded, **kw)
    finally:
        config.set_exact_selection("update")
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_u))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_u))
    np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_u))
