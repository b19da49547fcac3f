"""Knob-aware (QAT-style) training — config.train_knobs (round 5).

Validates that the TRAIN paths' serving-knob simulation matches the
inference engines' semantics (VERDICT r4 next #1: finetune checkpoints
WITH the serving knobs' semantics in the training loop, then re-certify):

  * ste_quant8 reproduces the serving gather's int8 grid
    (ops/pallas/sv_round3.pack_planes_q8_t) and is gradient-transparent;
  * with train_knobs OFF (the default) nothing changes; with reuse='none'
    and no quantization the knob path is logit-identical to the default;
  * the fused Pallas train forward and the flax train path agree under
    every knob composition (spatial/conv2 reuse x reuse_k x q8);
  * the CLI finetune flow works end to end: --preload of a BINARY
    checkpoint into a binary student (the r5 _preload_weights fix) plus
    --train-knobs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import config, models
from svnet_tpu.nn.sv_layers import ste_quant8

B, N, K = 2, 64, 4


@pytest.fixture(autouse=True)
def _reset_knobs():
    yield
    config.set_train_knobs(False)
    config.set_graph_reuse("none")
    config.reuse_k = 0
    config.set_approx_gather_bits(16)


def test_ste_quant8_matches_engine_grid():
    from svnet_tpu.ops.pallas.sv_round3 import pack_planes_q8_t

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 7)) * 5.0
    q = ste_quant8(x)
    # engine grid: pack channel-major (B, C, N), decode = plane * inv
    planes, inv = pack_planes_q8_t(jnp.swapaxes(x, 1, 2))
    want = planes[:, :7, :].astype(jnp.float32) * inv[None, :, :]
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(jnp.swapaxes(want, 1, 2)), atol=1e-6
    )
    # vectors: every (axis, channel) row has its own scale — identical to
    # quantizing the flattened joint channels
    v = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 3, 5))
    qv = ste_quant8(v)
    qf = ste_quant8(v.reshape(3, 32, -1)).reshape(v.shape)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(qf), atol=1e-7)
    # straight-through gradient: identity
    g = jax.grad(lambda t: jnp.sum(ste_quant8(t) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0, atol=1e-6)


def _cls_logits(binary=True, train=True):
    model = models.SV_DGCNN_CLS(num_classes=10, k=K, binary=binary,
                                dropout=0.0)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    if train:
        out, _ = model.apply(variables, points, True,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, points, False)
    return out


def test_knobs_noop_composition_is_identity():
    """train_knobs=True with reuse='none'/rk=0/16-bit gathers compiles the
    alternate code path but must be logit-identical to the default."""
    base = _cls_logits()
    config.set_train_knobs(True)
    on = _cls_logits()
    np.testing.assert_allclose(np.asarray(on), np.asarray(base), atol=1e-6)


def test_knobs_change_the_forward():
    """spatial reuse + rank slice + q8 must actually alter the computation
    (a silent noop here would make every finetune a placebo)."""
    base = _cls_logits()
    config.set_train_knobs(True)
    config.set_graph_reuse("spatial")
    config.set_reuse_k(2)
    config.set_approx_gather_bits(8)
    on = _cls_logits()
    assert float(jnp.max(jnp.abs(on - base))) > 1e-4
    # eval mode too: in-training test evals measure knob semantics
    config.set_graph_reuse("none")
    config.set_approx_gather_bits(8)
    ev_q8 = _cls_logits(train=False)
    config.set_train_knobs(False)
    ev = _cls_logits(train=False)
    assert float(jnp.max(jnp.abs(ev_q8 - ev))) > 1e-6


def test_fp_model_ignores_knobs():
    base = _cls_logits(binary=False)
    config.set_train_knobs(True)
    config.set_graph_reuse("spatial")
    config.set_reuse_k(2)
    on = _cls_logits(binary=False)
    np.testing.assert_allclose(np.asarray(on), np.asarray(base), atol=1e-6)


@pytest.mark.slow  # full-model interpret parity (minutes on 1 CPU)
@pytest.mark.parametrize("reuse,rk,q8", [
    ("spatial", 2, True),
    ("conv2", 2, False),
    ("none", 0, True),
])
def test_fused_flax_knob_parity(reuse, rk, q8):
    """The fused Pallas train forward and the flax train path must agree
    under knob simulation — same flip-tolerant criteria as
    test_fused_train.test_fused_model_apply_parity (binary STE boundaries
    turn reassociation ulps into isolated quantization flips)."""
    from svnet_tpu.train.fused import make_fused_train_apply

    config.set_train_knobs(True)
    config.set_graph_reuse(reuse)
    if rk:
        config.set_reuse_k(rk)
    config.set_approx_gather_bits(8 if q8 else 16)

    model = models.SV_DGCNN_CLS(num_classes=10, k=K, binary=True,
                                dropout=0.0)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    params, bs = variables["params"], variables["batch_stats"]

    o1, upd = model.apply(
        {"params": params, "batch_stats": bs}, points, True,
        mutable=["batch_stats"],
    )
    fused_apply = make_fused_train_apply(10, K, binary=True, interpret=True)
    o2, bs2 = fused_apply(params, bs, points)

    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)

    def rel_err(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-6)

    jax.tree.map(
        lambda a, b: None if rel_err(a, b) <= 2e-2 else (_ for _ in ()).throw(
            AssertionError(f"stats mismatch {rel_err(a, b)}")),
        bs2, upd["batch_stats"],
    )


@pytest.mark.slow
def test_cli_binary_finetune_with_knobs(tmp_path):
    """End-to-end: train a tiny binary checkpoint, then --preload it into a
    SAME-SHAPED binary student with --train-knobs (the knob-finetuning
    recipe; exercises the r5 student-template preload path)."""
    import h5py

    from svnet_tpu.cli.main_cls_dgcnn import main as cls_main

    root = tmp_path / "data"
    mn = root / "modelnet40_ply_hdf5_2048"
    mn.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for part, n in [("train", 16), ("test", 8)]:
        with h5py.File(mn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 128, 3)).astype("float32")
            f["label"] = rng.integers(0, 40, (n, 1)).astype("int64")

    common = [
        "--model", "svnet", "--binary", "--bn-reestimate", "2",
        "--epochs", "1", "--num-points", "64", "--batch-size", "8",
        "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
        "--dataset", "modelnet40", "--data-dir", str(root),
    ]
    base_dir = tmp_path / "base"
    acc = cls_main(common + ["--save-dir", str(base_dir)])
    assert acc is not None
    ckpt = base_dir / "save_models" / "model_best.ckpt"
    assert ckpt.exists()

    ft_dir = tmp_path / "finetune"
    acc_ft = cls_main(
        common
        + ["--save-dir", str(ft_dir), "--preload", str(ckpt),
           "--train-knobs", "--graph-reuse", "spatial", "--reuse-k", "4",
           "--approx-gather-bits", "8"]
    )
    assert acc_ft is not None and 0.0 <= acc_ft <= 1.0
    log = "".join(f.read_text() for f in ft_dir.glob("cls-*.txt"))
    assert "preloaded weights from" in log
    assert "overlap merge" not in log  # student-template restore, all leaves
