"""Default-suite kernel-parity smoke tests (VERDICT r2 item 9).

Tiny shapes (N=64, k=4), interpret-mode Pallas on CPU, so that breaking any
Pallas kernel turns the DEFAULT pytest run red. The heavyweight versions of
these parity checks (bigger shapes, more modes, torch oracles) stay in the
slow-marked modules; this file is the canary.

Coverage: one fused-engine-vs-flax check exercises the whole kernel chain
(sv_round2_first -> sv_round2 x3 -> sv_point -> head) in a single test, plus
standalone checks for knn_pallas and edge_gather (fwd + custom-VJP bwd).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models, ops
from svnet_tpu.infer import SVDGCNNClsEngine

B, N, K = 2, 64, 4


def test_engine_exact_vs_flax_smoke():
    """The whole fused kernel chain vs model.apply at tiny shapes."""
    model = models.SV_DGCNN_CLS(num_classes=10, k=K, binary=True)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    want = np.asarray(model.apply(variables, points, False))
    eng = SVDGCNNClsEngine(
        variables, num_classes=10, k=K, binary=True,
        knn_impl="xla", exact=True, interpret=True,
    )
    got = np.asarray(eng(points))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_knn_pallas_smoke():
    from svnet_tpu.ops.pallas.knn import knn_pallas

    x = jax.random.normal(jax.random.PRNGKey(2), (B, N, 6))
    want = np.asarray(ops.knn(x, K))
    got = np.asarray(knn_pallas(x, K, tile=32, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_edge_gather_smoke():
    from svnet_tpu.ops.pallas.edge_gather import edge_gather

    C = 8
    src = jax.random.normal(jax.random.PRNGKey(3), (B, N, C))
    idx = jax.random.randint(jax.random.PRNGKey(4), (B, N, K), 0, N)

    def ref(s):
        flat = jnp.take_along_axis(s, idx.reshape(B, N * K, 1), axis=1)
        return flat.reshape(B, N, K, C)

    got = edge_gather(src, idx, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref(src)))

    ct = jax.random.normal(jax.random.PRNGKey(5), (B, N, K, C))
    want_grad = jax.vjp(ref, src)[1](ct)[0]
    got_grad = jax.vjp(lambda s: edge_gather(s, idx, True), src)[1](ct)[0]
    # bwd rides two bf16 planes (hi + residual): ~2^-16-relative gradients
    np.testing.assert_allclose(
        np.asarray(got_grad), np.asarray(want_grad), rtol=3e-5, atol=3e-5
    )


def test_knn_pallas_pair_selection_smoke():
    """config.exact_selection='pair' in knn_pallas: identical neighbour
    lists (incl. tie order) to ops.knn on a tie-heavy quantized cloud."""
    from svnet_tpu import config
    from svnet_tpu.ops.pallas.knn import knn_pallas

    x = jax.random.normal(jax.random.PRNGKey(6), (B, N, 6))
    x = jnp.round(x * 2.0) / 2.0  # force distance ties
    x = x.at[:, N // 2 :].set(x[:, : N // 2])  # exact duplicates
    want = np.asarray(ops.knn(x, K))
    jax.clear_caches()
    config.set_exact_selection("pair")
    try:
        got = np.asarray(knn_pallas(x, K, tile=32, interpret=True))
    finally:
        config.set_exact_selection("update")
        jax.clear_caches()
    np.testing.assert_array_equal(got, want)


def test_engine_graph_reuse_smoke():
    """config.graph_reuse serving knob: 'conv2' and 'spatial' engines run
    the wins emit/take kernel paths end to end (bitwise mechanism proven in
    test_sv_round3.py::test_graph_reuse_wins_roundtrip); 'none' restores
    the reference dynamic-graph logits exactly."""
    from svnet_tpu import config

    model = models.SV_DGCNN_CLS(num_classes=10, k=K, binary=True)
    points = jax.random.normal(jax.random.PRNGKey(5), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(6), points)
    eng = SVDGCNNClsEngine(
        variables, num_classes=10, k=K, binary=True,
        knn_impl="xla", exact=True, interpret=True,
    )
    base = np.asarray(eng(points))
    try:
        for mode in ("conv2", "spatial"):
            config.set_graph_reuse(mode)
            got = np.asarray(eng(points))
            assert got.shape == base.shape and np.isfinite(got).all(), mode
        # reuse_k: reuse rounds consume only the nearest K//2 ranks
        # (kernel-level bitwise contract proven in
        # test_sv_round3.py::test_reuse_k_prefix_equals_small_k)
        config.set_reuse_k(K // 2)
        got = np.asarray(eng(points))
        assert got.shape == base.shape and np.isfinite(got).all(), "reuse_k"
    finally:
        config.set_graph_reuse("none")
        config.set_reuse_k(0)
    np.testing.assert_array_equal(np.asarray(eng(points)), base)


def test_point_block_cm_matches_row_major():
    """sv_point_block_cm(src.T) == sv_point_block(src) with the v_off
    round blocks re-laid out j-major — the cm engine tails ride this."""
    from svnet_tpu.ops.pallas.sv_point import (
        fold_point_params,
        sv_point_block,
        sv_point_block_cm,
    )

    S, vdims = 24, (4, 6)
    V = sum(vdims)
    S_out, V_out = 16, 8
    key = jax.random.PRNGKey(7)

    def rand(*shape):
        nonlocal key
        key, k2 = jax.random.split(key)
        return jax.random.normal(k2, shape)

    folded = {
        "wz": rand(V, 3), "w1": rand(S + 3 * V, S_out),
        "beta": rand(1, S + 3 * V), "a1": rand(1, S_out),
        "b1": rand(1, S_out), "w2": rand(V, V_out),
        "scale2": rand(1, V_out), "a2": rand(1, V_out),
        "b2": rand(1, V_out), "wzf": rand(V_out, 3),
    }
    gate = jax.nn.sigmoid(rand(B, V_out))
    # row-major src: [s | v i-major over the FULL V (c in round order)]
    src = rand(B, N, S + 3 * V)
    want_x, want_smax, want_vmean = sv_point_block(
        src, gate, folded, S=S, V=V, S_out=S_out, V_out=V_out, T=N,
        binary=False, exact=True, interpret=True,
    )
    # cm src: [s rows | per-round j-major v blocks]
    s_rows = src[:, :, :S]
    v = src[:, :, S:].reshape(B, N, 3, V)
    blocks, off, v_off = [], 0, []
    for Vr in vdims:
        blocks.append(v[:, :, :, off : off + Vr].reshape(B, N, 3 * Vr))
        v_off.append((S + 3 * off, Vr))
        off += Vr
    src_cm = jnp.swapaxes(
        jnp.concatenate([s_rows] + blocks, axis=-1), 1, 2
    )
    got_x, got_smax, got_vmean = sv_point_block_cm(
        src_cm, gate, folded, S=S, V=V, S_out=S_out, V_out=V_out,
        v_off=tuple(v_off), T=N, binary=False, exact=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got_x, 1, 2)), np.asarray(want_x),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_smax), np.asarray(want_smax), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_vmean), np.asarray(want_vmean), rtol=1e-5, atol=1e-5
    )


def test_engine_morton_serving_glue():
    """config.reuse_gather_window's engine glue: Morton sort at entry and
    (partseg) per-point un-permutation at exit preserve the model output.

    cls logits are permutation-invariant up to reduction reassociation;
    partseg per-point logits must land back on THEIR points — a wrong
    inverse permutation produces garbage far outside the tolerance. The
    in-kernel compacted-gather branch itself is bitwise-tested in
    test_sv_round3.py::test_reuse_gather_window_bitwise; at N=64 < 128 the
    window is inert, keeping this default-suite test cheap.

    FP model on purpose: the Morton permutation reorders the per-cloud
    edge-sum (se_mean) reduction, a ~ulp reassociation shift that a
    BINARY model amplifies into sign() flips (~1% of logits far outside
    any tolerance — observed). The FP path is Lipschitz, so the glue is
    checkable at rtol 1e-4; binary serving accuracy under the knob is
    certified on trained checkpoints instead (ACCURACY.md methodology).
    """
    from svnet_tpu import config
    from svnet_tpu.infer import SVDGCNNPsegEngine

    model = models.SV_DGCNN_PSEG(num_part=50, k=K, binary=False)
    points = jax.random.normal(jax.random.PRNGKey(11), (B, N, 3))
    label = jnp.zeros((B, 16)).at[:, 3].set(1.0)
    variables = model.init(jax.random.PRNGKey(12), points, label)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    eng = SVDGCNNPsegEngine(
        variables, num_part=50, k=K, binary=False, exact=True, interpret=True
    )
    try:
        config.set_graph_reuse("spatial")
        want = np.asarray(eng(points, label))
        config.set_reuse_gather_window(128)
        got = np.asarray(eng(points, label))
    finally:
        config.set_graph_reuse("none")
        config.set_reuse_gather_window(0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
