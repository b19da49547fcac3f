"""Fused differentiable training round vs the flax train path (interpret).

Block-level parity is exact-tolerance (single round: outputs, batch stats,
src + param grads). Model-level parity uses a flip-tolerant criterion:
binary STE sign boundaries turn reassociation ulps into isolated +-2
quantization flips, so a handful of entries may deviate while the
overwhelming majority must match (a real gradient bug mismatches
everything — see the dsrc debugging ledger in the module docstring of
ops/pallas/sv_round3_train.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models, ops
from svnet_tpu.nn import sv_layers as svl
from svnet_tpu.ops.pallas.sv_round3_train import make_fused_round

B, N, K = 2, 64, 4
S, V, S_out, V_out = 8, 5, 16, 10
SUB = ("v2s", "linear1", "bn1", "linear2", "bn2")


def _setup(binary):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    s = jax.random.normal(ks[0], (B, N, S))
    v = jax.random.normal(ks[1], (B, N, 3, V))
    src = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
    idx = ops.knn(src, K)
    block = svl.SVBlock(S_out, V_out, binary=binary)
    s_f, v_f = ops.get_graph_feature_sv((s, v), K, idx=idx)
    variables = block.init(ks[2], (s_f, v_f), True)
    cs = jax.random.normal(ks[3], (B, N, S_out))
    cv = jax.random.normal(ks[4], (B, N, 3, V_out))
    return src, idx, block, variables, cs, cv


@pytest.mark.parametrize("binary", [True, False])
def test_fused_round_grad_parity(binary):
    src, idx, block, variables, cs, cv = _setup(binary)
    params, stats0 = variables["params"], variables["batch_stats"]
    fused = make_fused_round(S, V, S_out, V_out, K, binary=binary,
                             interpret=True)

    def ref_loss(params, src):
        s_, v_ = src[..., :S], src[..., S:].reshape(B, N, 3, V)
        sf, vf = ops.get_graph_feature_sv((s_, v_), K, idx=idx)
        (so, vo), upd = block.apply(
            {"params": params, "batch_stats": stats0}, (sf, vf), True,
            mutable=["batch_stats"],
        )
        # argmax-routed max: torch max semantics (ties -> first index),
        # matching the kernel; jnp.max splits ties instead
        am = jnp.argmax(so, axis=2, keepdims=True)
        so = jnp.take_along_axis(so, am, axis=2)[:, :, 0]
        vo = jnp.mean(vo, axis=2)
        loss = jnp.sum(so * cs) + jnp.sum(vo * cv)
        return loss, (so, vo, upd["batch_stats"])

    def fused_loss(params, src):
        sub = {k_: params[k_] for k_ in SUB}
        so, vo_ung, s_mean, stats = fused(src, idx, sub)
        g = jax.nn.relu(s_mean @ params["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ params["gate_fc2"]["kernel"])
        vo = vo_ung.reshape(B, N, 3, V_out) * g[:, None, None, :]
        loss = jnp.sum(so * cs) + jnp.sum(vo * cv)
        return loss, (so, vo, stats)

    (l1, (so1, vo1, bs1)), g1 = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True)(params, src)
    (l2, (so2, vo2, st2)), g2 = jax.value_and_grad(
        fused_loss, argnums=(0, 1), has_aux=True)(params, src)

    np.testing.assert_allclose(np.asarray(so2), np.asarray(so1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vo2), np.asarray(vo1),
                               rtol=2e-4, atol=2e-4)
    # batch stats: fused returns the raw biased batch stats; flax returns
    # the running update ra' = m*ra + (1-m)*batch
    mu1 = st2[0]
    want = (np.asarray(bs1["bn1"]["bn"]["mean"])
            - 0.9 * np.asarray(stats0["bn1"]["bn"]["mean"])) / 0.1
    np.testing.assert_allclose(np.asarray(mu1), want, rtol=1e-3, atol=1e-5)
    # gradients
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               rtol=2e-3, atol=2e-4)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1[0]):
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(leaf), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow  # full-model interpret parity, ~2 min on the 1-CPU box;
# the per-kernel grad/logit parity tests above stay in the default run
@pytest.mark.parametrize("binary", [True, False])
def test_fused_model_apply_parity(binary):
    from svnet_tpu.train.fused import make_fused_train_apply

    # FP leg: dropout=0.0 so the stochastic masks drop out of the parity
    # comparison (the fused twin skips dropout when rng is None)
    model = models.SV_DGCNN_CLS(num_classes=10, k=K, binary=binary,
                                dropout=0.0)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    params, bs = variables["params"], variables["batch_stats"]
    target = jnp.arange(B) % 10
    onehot = jax.nn.one_hot(target, 10)

    def ref_loss(params, pts):
        out, upd = model.apply(
            {"params": params, "batch_stats": bs}, pts, True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean((out - onehot) ** 2), (out, upd["batch_stats"])

    fused_apply = make_fused_train_apply(10, K, binary=binary,
                                         interpret=True)

    def fused_loss(params, pts):
        out, new_bs = fused_apply(params, bs, pts)
        return jnp.mean((out - onehot) ** 2), (out, new_bs)

    (l1, (o1, bs1)), g1 = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True)(params, points)
    (l2, (o2, bs2)), g2 = jax.value_and_grad(
        fused_loss, argnums=(0, 1), has_aux=True)(params, points)

    # FP: per-round batch stats agree to ~1e-8 but tiny-batch BN (B=2)
    # amplifies f32 reassociation ulps through the head (~4e-4 abs);
    # binary arithmetic is exact so the tight tolerance stands.
    tol = dict(rtol=2e-4, atol=2e-4) if binary else dict(rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), **tol)
    # flip-tolerant: relative Frobenius error per tensor. Isolated STE
    # sign flips (ulp reassociation at a sign boundary) perturb a few
    # entries and cascade tiny shifts downstream; a systematic gradient
    # bug mismatches the whole tensor and blows this metric up.
    def rel_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6)

    jax.tree.map(
        lambda a, b: None if rel_err(a, b) <= 2e-2 else (_ for _ in ()).throw(
            AssertionError(f"stats mismatch {rel_err(a, b)}")),
        bs2, bs1,
    )
    # dpoints: FP forward drift (see above) flips global-max argmax /
    # lrelu boundaries, re-routing isolated per-point gradients; direction
    # must agree tightly either way.
    a, b = np.asarray(g2[1]).ravel(), np.asarray(g1[1]).ravel()
    cos_p = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos_p >= 0.99, cos_p
    assert rel_err(g2[1], g1[1]) <= (2e-2 if binary else 2e-1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2[0]))
    # per-tensor: cosine similarity (flips at the sign/clip boundaries
    # perturb isolated entries; a wrong formula decorrelates the tensor).
    # globally: relative error of the whole concatenated gradient.
    allg1, allg2 = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1[0]):
        a = np.asarray(flat2[path]).ravel()
        b = np.asarray(leaf).ravel()
        allg1.append(b)
        allg2.append(a)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        # tiny tensors (the 3-element v2s scales) are dominated by the
        # flip noise of whatever edges they sum over — the global check
        # below still covers them
        if denom > 1e-10 and a.size >= 8:
            cos = float(np.dot(a, b) / denom)
            assert cos >= 0.9, (jax.tree_util.keystr(path), cos)
    a = np.concatenate(allg2)
    b = np.concatenate(allg1)
    # FP leg: the B=2 head BN is ill-conditioned (batch stats over 2
    # samples normalize to exactly +-1); a measured 1e-4 input drift moves
    # the head gradient ~4%, and the trunk's accumulated f32 reassociation
    # drift is that size — verified by stage bisection (trunk grads match
    # to 2e-4 and the isolated head to 7e-4; only the composition at the
    # real operating point amplifies). Binary arithmetic is exact.
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6) <= (
        5e-2 if binary else 2e-1)


@pytest.mark.slow  # full partseg model interpret parity (~minutes on CPU);
# the per-kernel grad/logit parity tests above stay in the default run
@pytest.mark.parametrize("binary", [True, False])
def test_fused_pseg_model_apply_parity(binary):
    from svnet_tpu.train.fused import make_fused_train_apply_pseg

    model = models.SV_DGCNN_PSEG(num_part=50, k=K, binary=binary,
                                 dropout=0.0)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    label = jax.nn.one_hot(jnp.arange(B) % 16, 16)
    variables = model.init(jax.random.PRNGKey(1), points, label)
    params, bs = variables["params"], variables["batch_stats"]
    target = jnp.arange(B * N).reshape(B, N) % 50
    onehot = jax.nn.one_hot(target, 50)

    def ref_loss(params, pts):
        out, upd = model.apply(
            {"params": params, "batch_stats": bs}, pts, label, True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean((out - onehot) ** 2), (out, upd["batch_stats"])

    fused_apply = make_fused_train_apply_pseg(50, K, binary=binary,
                                              interpret=True)

    def fused_loss(params, pts):
        out, new_bs = fused_apply(params, bs, pts, label)
        return jnp.mean((out - onehot) ** 2), (out, new_bs)

    (l1, (o1, bs1)), g1 = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True)(params, points)
    (l2, (o2, bs2)), g2 = jax.value_and_grad(
        fused_loss, argnums=(0, 1), has_aux=True)(params, points)

    tol = dict(rtol=2e-4, atol=2e-4) if binary else dict(rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), **tol)

    def rel_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6)

    jax.tree.map(
        lambda a, b: None if rel_err(a, b) <= 2e-2 else (_ for _ in ()).throw(
            AssertionError(f"stats mismatch {rel_err(a, b)}")),
        bs2, bs1,
    )
    a, b = np.asarray(g2[1]).ravel(), np.asarray(g1[1]).ravel()
    cos_p = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos_p >= 0.99, cos_p
    assert rel_err(g2[1], g1[1]) <= (2e-2 if binary else 2e-1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2[0]))
    allg1, allg2 = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1[0]):
        a = np.asarray(flat2[path]).ravel()
        b = np.asarray(leaf).ravel()
        allg1.append(b)
        allg2.append(a)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-10 and a.size >= 8:
            cos = float(np.dot(a, b) / denom)
            assert cos >= 0.9, (jax.tree_util.keystr(path), cos)
    a = np.concatenate(allg2)
    b = np.concatenate(allg1)
    # see the cls twin above for the FP-tolerance rationale
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6) <= (
        5e-2 if binary else 2e-1)


def test_fused_first_round_grad_parity():
    """Fused FIRST training round (FP, init_scalar + conv1) vs the flax
    oracle: outputs, batch stats, and grads w.r.t. params AND points."""
    from svnet_tpu.ops.pallas.sv_first_train import make_fused_first_round
    from svnet_tpu.train.fused import _v2s_train

    S_out, V_out = 16, 10
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 5)
    points = jax.random.normal(ks[0], (B, N, 3))
    init_p = {"linear": {"kernel": jax.random.normal(ks[1], (2, 3)) * 0.5}}
    idx = ops.knn(points, K)
    v_e = ops.get_graph_feature(points, K, idx=idx)
    s_e = _v2s_train(init_p, v_e, False)
    block = svl.SVBlock(S_out, V_out, binary=False)
    variables = block.init(ks[2], (s_e, v_e), True)
    stats0 = variables["batch_stats"]
    params_all = {"init_scalar": init_p, "conv1": variables["params"]}
    cs = jax.random.normal(ks[3], (B, N, S_out))
    cv = jax.random.normal(ks[4], (B, N, 3, V_out))

    def ref_loss(params, pts):
        idx_ = ops.knn(pts, K)
        ve = ops.get_graph_feature(pts, K, idx=idx_)
        se = _v2s_train(params["init_scalar"], ve, False)
        (so, vo), _upd = block.apply(
            {"params": params["conv1"], "batch_stats": stats0}, (se, ve),
            True, mutable=["batch_stats"],
        )
        am = jnp.argmax(so, axis=2, keepdims=True)
        so = jnp.take_along_axis(so, am, axis=2)[:, :, 0]
        vo = jnp.mean(vo, axis=2)
        return jnp.sum(so * cs) + jnp.sum(vo * cv), (so, vo)

    fused = make_fused_first_round(S_out, V_out, K, interpret=True)

    def fused_loss(params, pts):
        idx_ = ops.knn(pts, K)
        sub = {"init_scalar": params["init_scalar"],
               **{kk: params["conv1"][kk] for kk in SUB}}
        so, vo_ung, s_mean, _stats = fused(pts, idx_, sub)
        g = jax.nn.relu(s_mean @ params["conv1"]["gate_fc1"]["kernel"])
        g = jax.nn.sigmoid(g @ params["conv1"]["gate_fc2"]["kernel"])
        vo = vo_ung.reshape(B, N, 3, V_out) * g[:, None, None, :]
        return jnp.sum(so * cs) + jnp.sum(vo * cv), (so, vo)

    (l1, (so1, vo1)), g1 = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True)(params_all, points)
    (l2, (so2, vo2)), g2 = jax.value_and_grad(
        fused_loss, argnums=(0, 1), has_aux=True)(params_all, points)

    np.testing.assert_allclose(np.asarray(so2), np.asarray(so1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vo2), np.asarray(vo1),
                               rtol=2e-4, atol=2e-4)
    # points gradient (kNN indices are piecewise constant in both paths)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               rtol=2e-3, atol=2e-4)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2[0]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1[0]):
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(leaf), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_first_round_nondividing_R(monkeypatch):
    """r4 regression: the tile heuristic can return a chunk width R that
    does not divide k (cls shapes: R=8, k=20). prep must clamp it — the
    kernel's chunk loop runs k // R times, so an unclamped R silently
    drops the last k % R neighbour ranks from forward, stats AND backward
    (the r4 on-chip training-collapse root cause)."""
    from svnet_tpu.ops.pallas import sv_first_train as sft

    monkeypatch.setattr(sft, "_round3_tiles", lambda *a, **kw: (64, 8))
    sft.make_fused_first_round.cache_clear()
    K2 = 20
    S_out, V_out = 16, 10
    pts = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 3))
    model = models.SV_DGCNN_CLS(num_classes=10, k=K2, binary=True)
    variables = model.init(jax.random.PRNGKey(1), pts)
    p = variables["params"]
    SUBK = ("v2s", "linear1", "bn1", "linear2", "bn2")
    # shrink the block to the test dims: re-init a standalone block
    v = ops.get_graph_feature(pts, k=K2)
    s = svl.Vector2Scalar(3, name="init_scalar").apply(
        {"params": {"linear": p["init_scalar"]["linear"]}}, v, True)
    block = svl.SVBlock(S_out, V_out, binary=False)
    bvars = block.init(jax.random.PRNGKey(2), (s, v), True)
    sub = {"init_scalar": p["init_scalar"],
           **{kk: bvars["params"][kk] for kk in SUBK}}
    idx = ops.knn(pts, K2)
    first = sft.make_fused_first_round(S_out, V_out, K2, interpret=True)
    s1o, v1u, s_mean, (mu1, var1, mun, varn) = first(pts, idx, sub)
    (so, vo), upd = block.apply(
        {"params": bvars["params"], "batch_stats": bvars["batch_stats"]},
        (s, v), True, mutable=["batch_stats"])
    so_p = jnp.max(so, axis=2)
    np.testing.assert_allclose(np.asarray(s1o), np.asarray(so_p),
                               rtol=2e-4, atol=2e-4)
    bs0 = bvars["batch_stats"]
    want_mu = (np.asarray(upd["batch_stats"]["bn1"]["bn"]["mean"])
               - 0.9 * np.asarray(bs0["bn1"]["bn"]["mean"])) / 0.1
    np.testing.assert_allclose(np.asarray(mu1), want_mu, rtol=1e-3,
                               atol=1e-5)
    sft.make_fused_first_round.cache_clear()
