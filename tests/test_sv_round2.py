"""sv_round2 (v2 fused round) vs sv_round (v1) — interpret-mode parity.

The v1 kernel is itself verified against the flax path (test_infer_engine,
test_sv_edge_kernel), so v1-vs-v2 parity plus the engine tests transfer the
whole chain. Modes:
  * exact: bit-identical gather (int8 bit-planes reconstruct f32 exactly)
    and identical neighbour ordering (sortable-int keys == f32 ordering,
    lowest-index ties) -> tight logit parity;
  * fast: 16-bit fixed-point gather; same quantized-key selection as v1
    fast -> close parity, same neighbour sets on non-degenerate inputs;
  * approx: folded-bin selection -> neighbour sets differ by design
    (documented recall); only shapes/finiteness here, recall measured in
    tests/test_knn_recall-style assertions below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu.ops.pallas.sv_round import sv_round, sv_round_first
from svnet_tpu.ops.pallas.sv_round2 import (
    pack_planes_exact,
    pack_planes_fast,
    sv_round2,
    sv_round2_first,
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


def test_plane_packing_roundtrip_exact():
    from svnet_tpu.ops.pallas.sv_round2 import _decode_exact

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 11)) * 123.4
    C = 11
    planes = pack_planes_exact(x).astype(jnp.int32).reshape(21, -1)
    back = _decode_exact(planes, C).reshape(3, 7, C)
    assert float(jnp.abs(back - x).max()) == 0.0


def test_plane_packing_fast_error_bound():
    from svnet_tpu.ops.pallas.sv_round2 import _decode_fast

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 11)) * 123.4
    C = 11
    planes, inv = pack_planes_fast(x)
    back = _decode_fast(planes.astype(jnp.int32).reshape(21, -1), inv, C)
    back = back.reshape(3, 7, C)
    amax = jnp.max(jnp.abs(x), axis=(0, 1))
    rel = jnp.abs(back - x) / amax
    assert float(rel.max()) < 2.0 ** -15


@pytest.mark.parametrize("binary", [True, False])
@pytest.mark.slow
def test_round2_exact_matches_round1(binary):
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K, T=T, binary=binary,
              interpret=True)
    s1, v1, g1 = sv_round(src, folded, exact=True, **kw)
    s2, v2, g2 = sv_round2(src, folded, mode="exact", **kw)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_round2_fast_matches_round1_fast():
    """Same 18-bit packed-key selection as v1 fast (identical neighbour
    sets); gathers differ only in representation (16-bit fixed-point vs
    bf16), so FP outputs agree to ~bf16 precision."""
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    kw = dict(S=S, V=V, S_out=S_out, V_out=V_out, k=K, T=T, binary=False,
              interpret=True)
    s1, v1, g1 = sv_round(src, folded, exact=False, **kw)
    s2, v2, g2 = sv_round2(src, folded, mode="fast", **kw)
    # tolerance bounds v1's bf16 gather error (2^-8/element, amplified by
    # the quadratic Vector2Scalar and the 124-wide w1 reduction) — v2's
    # 16-bit fixed-point side contributes ~2^-15; tight v2 parity is
    # covered by test_round2_exact_matches_round1 + the packing tests.
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=0.1, atol=0.8)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=0.1, atol=0.1)


def test_round2_approx_shapes_finite():
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, S + 3 * V))
    folded = _folded(jax.random.PRNGKey(1))
    s, v, g = sv_round2(
        src, folded, S=S, V=V, S_out=S_out, V_out=V_out, k=K, T=T,
        binary=True, mode="approx", interpret=True,
    )
    assert s.shape == (B, N, S_out) and v.shape == (B, N, 3 * V_out)
    assert np.isfinite(np.asarray(s)).all() and np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.slow
def test_round2_first_exact_matches_round1(cross):
    pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    folded = _folded_first(jax.random.PRNGKey(1), n_ch=3 if cross else 2)
    kw = dict(S_out=S_out, V_out=V_out, k=K, T=T, cross=cross, interpret=True)
    s1, v1, g1 = sv_round_first(pts, folded, exact=True, **kw)
    s2, v2, g2 = sv_round2_first(pts, folded, mode="exact", **kw)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)


def _fold_recall(x, k=20, L=256):
    """Recall of the approx fold-L selection vs exact top-k, replicating
    the kernel's key math (quantized distance + reversed column, pairwise
    max fold to L lanes) in numpy."""
    from svnet_tpu import ops
    from svnet_tpu.ops.pallas.sv_round2 import _idx_bits, _Q_BITS

    B, N = x.shape[0], x.shape[1]
    ib = _idx_bits(N)
    qbits = min(_Q_BITS, 31 - ib)
    exact_idx = np.asarray(ops.knn(x, k))
    neg = ops.pairwise_neg_sqdist(x)
    cols = jnp.arange(N, dtype=jnp.int32)
    worst = jnp.min(neg, axis=(1, 2), keepdims=True)
    scale = jnp.float32(-(1 << qbits)) / jnp.minimum(worst, -1e-12)
    q = jnp.maximum(jnp.floor(neg * scale).astype(jnp.int32),
                    jnp.int32(-(1 << qbits) + 1))
    ibm = 1 << ib
    key = q * ibm + (ibm - 1 - cols)[None, None, :]
    w = N
    while w > L:
        w //= 2
        key = jnp.maximum(key[..., :w], key[..., w : 2 * w])
    got = []
    key = np.asarray(key)
    for _ in range(k):
        m = key.max(axis=-1, keepdims=True)
        got.append(ibm - 1 - (m[..., 0] % ibm))
        key = np.where(key == m, -(2**31) + 1, key)
    got = np.stack(got, axis=-1)
    return np.mean([
        len(set(got[b, n]) & set(exact_idx[b, n])) / k
        for b in range(B) for n in range(0, N, 37)
    ])


def _surface_clouds(seed, B, N):
    """Deformed-sphere surface clouds — the bench --surface generator
    itself (svnet_tpu/utils/synth.py), so the recall characterization
    runs on exactly the benched data distribution."""
    from svnet_tpu.utils.synth import surface_clouds

    return jnp.asarray(surface_clouds(seed, B, N))


def test_approx_selection_recall_surface():
    """VERDICT r2 weak #7: approx-mode recall on STRUCTURED clouds — the
    data the mode would actually serve. Both Morton-sorted (the serving
    layout for the window path) and shuffled orders: the fold pairs
    columns i and i+w (distant halves), so Morton adjacency must NOT
    collide spatial near-neighbours. Measured values recorded in PERF.md."""
    from svnet_tpu.ops.pallas.sv_round3 import morton_order

    pts = _surface_clouds(7, 4, 1024)
    perm = morton_order(pts)
    sorted_pts = jnp.take_along_axis(pts, perm[..., None], axis=1)
    r_sorted = _fold_recall(sorted_pts)
    r_shuffled = _fold_recall(pts)
    assert r_sorted > 0.90, r_sorted
    assert r_shuffled > 0.90, r_shuffled


def test_approx_fold_width_recall_partseg_shapes():
    """config.approx_fold recall trade at partseg shapes (N=2048, k=40,
    Morton-sorted surface clouds): widening the fold from 256 to 1024
    must recover recall (expected collided pairs ~C(k,2)/L). Measured
    values recorded in PERF.md."""
    from svnet_tpu.ops.pallas.sv_round3 import morton_order

    pts = _surface_clouds(11, 2, 2048)
    perm = morton_order(pts)
    pts = jnp.take_along_axis(pts, perm[..., None], axis=1)
    r256 = _fold_recall(pts, k=40, L=256)
    r1024 = _fold_recall(pts, k=40, L=1024)
    assert r1024 >= r256, (r256, r1024)
    assert r1024 > 0.97, r1024
    assert r256 > 0.88, r256


def test_approx_selection_recall():
    """Folded-bin selection recall vs exact top-k at bench shapes (documented
    in PERF.md): fold 1024 -> 256 keeps ~0.95+ of the true top-20."""
    from svnet_tpu import ops

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1024, 8))
    exact_idx = np.asarray(ops.knn(x, 20))
    neg = ops.pairwise_neg_sqdist(x)
    cols = jnp.arange(1024, dtype=jnp.int32)
    worst = jnp.min(neg, axis=(1, 2), keepdims=True)
    scale = jnp.float32(-(1 << 18)) / jnp.minimum(worst, -1e-12)
    q = jnp.maximum(jnp.floor(neg * scale).astype(jnp.int32),
                    jnp.int32(-(1 << 18) + 1))
    key = q * 8192 + (8191 - cols)[None, None, :]
    w = 1024
    while w > 256:
        w //= 2
        key = jnp.maximum(key[..., :w], key[..., w : 2 * w])
    # extract top-20 from folded keys
    got = []
    key = np.asarray(key)
    for _ in range(20):
        m = key.max(axis=-1, keepdims=True)
        got.append(8191 - (m[..., 0] % 8192))
        key = np.where(key == m, -(2**31) + 1, key)
    got = np.stack(got, axis=-1)
    recall = np.mean([
        len(set(got[b, n]) & set(exact_idx[b, n])) / 20.0
        for b in range(4) for n in range(0, 1024, 37)
    ])
    assert recall > 0.93, recall
