"""Model zoo tests: forward shapes for all 12 exported models, SO(3)
invariance of SV/VN classifier logits, and registry wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models, ops

pytestmark = pytest.mark.slow  # minutes on this 1-CPU box

KEY = jax.random.PRNGKey(0)
B, N, NPART = 2, 64, 50
K = 8


def _points(key=KEY):
    return jax.random.normal(key, (B, N, 3))


def _label16():
    lab = jnp.zeros((B, 16)).at[:, 3].set(1.0)
    return lab


CLS_CASES = [
    ("svnet", "pointnet", {}),
    ("svnet", "pointnet", {"binary": True}),
    ("svnet", "dgcnn", {}),
    ("svnet", "dgcnn", {"binary": True}),
    ("vn", "pointnet", {}),
    ("vn", "dgcnn", {}),
    ("original", "pointnet", {}),
    ("original", "dgcnn", {}),
    ("bipointnet", "pointnet", {}),
]

PSEG_CASES = [
    ("svnet", "pointnet", {}),
    ("svnet", "pointnet", {"binary": True}),
    ("svnet", "dgcnn", {}),
    ("svnet", "dgcnn", {"binary": True}),
    ("vn", "pointnet", {}),
    ("vn", "dgcnn", {}),
    ("original", "pointnet", {}),
    ("original", "dgcnn", {}),
    ("bipointnet", "pointnet", {}),
]


def _logits_of(out):
    return out[0] if isinstance(out, tuple) else out


class TestForwardShapes:
    @pytest.mark.parametrize("name,backbone,kw", CLS_CASES)
    def test_cls_forward(self, name, backbone, kw):
        m = models.get_model("cls", backbone, name, num_classes=40, k=K, **kw)
        pts = _points()
        variables = m.init(KEY, pts)
        out = _logits_of(m.apply(variables, pts))
        assert out.shape == (B, 40)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("name,backbone,kw", PSEG_CASES)
    def test_partseg_forward(self, name, backbone, kw):
        kw2 = dict(kw)
        if name == "bipointnet":
            # ema-max offsets are defined for N in {1024, 2048, 4096}
            pytest.skip("ema-max offset table needs N=1024+; covered in slow test")
        m = models.get_model("partseg", backbone, name, num_part=NPART, k=K, **kw2)
        pts, lab = _points(), _label16()
        variables = m.init(KEY, pts, lab)
        out = _logits_of(m.apply(variables, pts, lab))
        assert out.shape == (B, N, NPART)
        assert np.isfinite(np.asarray(out)).all()

    def test_cls_train_mode_runs(self):
        m = models.get_model("cls", "dgcnn", "svnet", num_classes=40, k=K, binary=True)
        pts = _points()
        variables = m.init(KEY, pts)
        out, updates = m.apply(
            variables,
            pts,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert out.shape == (B, 40)
        assert "batch_stats" in updates

    def test_registry_rejects_unknown(self):
        with pytest.raises(ValueError):
            models.get_model("cls", "dgcnn", "bogus")
        with pytest.raises(ValueError):
            models.get_model("cls", "dgcnn", "bipointnet")  # pointnet-only


class TestRotationInvariance:
    """The headline property: SV/VN classifiers are SO(3)-invariant.

    kNN graphs are rotation-invariant up to float near-ties; with random
    gaussian clouds ties are rare, so logits match to loose float tolerance.
    """

    @pytest.mark.parametrize(
        "name,backbone",
        [("svnet", "pointnet"), ("svnet", "dgcnn"), ("vn", "pointnet"), ("vn", "dgcnn")],
    )
    def test_cls_logits_invariant(self, name, backbone):
        m = models.get_model("cls", backbone, name, num_classes=40, k=K)
        pts = _points()
        R = ops.random_rotations(jax.random.PRNGKey(5), B)
        pts_r = ops.rotate_points(pts, R)
        variables = m.init(KEY, pts)
        out = np.asarray(_logits_of(m.apply(variables, pts)))
        out_r = np.asarray(_logits_of(m.apply(variables, pts_r)))
        np.testing.assert_allclose(out_r, out, rtol=2e-2, atol=2e-3)

    def test_svnet_partseg_invariant(self):
        m = models.get_model("partseg", "dgcnn", "svnet", num_part=NPART, k=K)
        pts, lab = _points(), _label16()
        R = ops.random_rotations(jax.random.PRNGKey(6), B)
        variables = m.init(KEY, pts, lab)
        out = np.asarray(m.apply(variables, pts, lab))
        out_r = np.asarray(m.apply(variables, ops.rotate_points(pts, R), lab))
        np.testing.assert_allclose(out_r, out, rtol=2e-2, atol=2e-3)
