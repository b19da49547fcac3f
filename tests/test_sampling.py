"""PointNet++ sampling ops + set abstraction modules + misc inventory
(ModelNet40_v2 smoke, AverageMeter, MeanShift, BiConv1d,
VNLinearAndLeakyReLU, BiPointNet_SEMSEG)."""

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu import ops
from svnet_tpu.nn.pointnet2 import (
    PointNetFeaturePropagation,
    PointNetSetAbstraction,
    PointNetSetAbstractionMsg,
)

KEY = jax.random.PRNGKey(0)


class TestSampling:
    def test_square_distance(self):
        a = jax.random.normal(KEY, (2, 16, 3))
        b = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 3))
        d = np.asarray(ops.square_distance(a, b))
        want = ((np.asarray(a)[:, :, None] - np.asarray(b)[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-5)

    def test_fps_spreads_points(self):
        # two tight clusters: FPS with npoint=2 must pick one from each
        c1 = jnp.zeros((1, 8, 3))
        c2 = jnp.ones((1, 8, 3)) * 10
        xyz = jnp.concatenate([c1, c2], axis=1)
        idx = np.asarray(ops.farthest_point_sample(xyz, 2))[0]
        assert (idx[0] < 8) != (idx[1] < 8)

    def test_fps_unique(self):
        xyz = jax.random.normal(KEY, (2, 64, 3))
        idx = np.asarray(ops.farthest_point_sample(xyz, 16))
        for b in range(2):
            assert len(set(idx[b].tolist())) == 16

    def test_query_ball_point_radius_and_fill(self):
        xyz = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
        new_xyz = xyz[:, :4]
        idx = np.asarray(ops.query_ball_point(0.5, 8, xyz, new_xyz))
        x = np.asarray(xyz)[0]
        q = np.asarray(new_xyz)[0]
        for s in range(4):
            d = ((x[idx[0, s]] - q[s]) ** 2).sum(-1)
            assert (d <= 0.25 + 1e-5).all()

    def test_sample_and_group_shapes(self):
        xyz = jax.random.normal(KEY, (2, 64, 3))
        feats = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 7))
        new_xyz, new_points = ops.sample_and_group(16, 0.8, 8, xyz, feats)
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 10)
        gx, gp = ops.sample_and_group_all(xyz, feats)
        assert gx.shape == (2, 1, 3) and gp.shape == (2, 1, 64, 10)


class TestPointNet2Modules:
    def test_set_abstraction(self):
        m = PointNetSetAbstraction(16, 0.8, 8, mlp=[32, 64])
        xyz = jax.random.normal(KEY, (2, 64, 3))
        variables = m.init(KEY, xyz)
        (nx, npts), _ = m.apply(
            variables, xyz, train=True, mutable=["batch_stats"]
        )
        assert nx.shape == (2, 16, 3) and npts.shape == (2, 16, 64)

    def test_set_abstraction_msg(self):
        m = PointNetSetAbstractionMsg(
            16, [0.4, 0.8], [4, 8], mlp_list=[[16], [32]]
        )
        xyz = jax.random.normal(KEY, (2, 64, 3))
        variables = m.init(KEY, xyz)
        nx, npts = m.apply(variables, xyz)
        assert nx.shape == (2, 16, 3) and npts.shape == (2, 16, 48)

    def test_feature_propagation(self):
        m = PointNetFeaturePropagation(mlp=[32])
        xyz1 = jax.random.normal(KEY, (2, 64, 3))
        xyz2 = xyz1[:, :16]
        p2 = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 8))
        variables = m.init(KEY, xyz1, xyz2, None, p2)
        out = m.apply(variables, xyz1, xyz2, None, p2)
        assert out.shape == (2, 64, 32)


class TestMiscInventory:
    def test_average_meter(self):
        from svnet_tpu.train.meters import AverageMeter

        m = AverageMeter()
        m.update(1.0, 2)
        m.update(2.0, 2)
        assert m.avg == 1.5 and m.count == 4

    def test_mean_shift(self):
        from svnet_tpu.nn.bipointnet_layers import MeanShift

        m = MeanShift()
        x = jnp.ones((8, 4)) * 3.0
        variables = m.init(KEY, x)
        out, updates = m.apply(variables, x, True, mutable=["batch_stats"])
        # ref semantics: the median updates BEFORE subtraction, so the first
        # train step already centers: out = x - median(x) = 0
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
        out2 = m.apply(
            {"batch_stats": updates["batch_stats"]}, x, False
        )
        np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)

    def test_biconv1d(self):
        from svnet_tpu.nn.bipointnet_layers import BiConv1d

        m = BiConv1d(8, kernel_size=3, padding="SAME")
        x = jax.random.normal(KEY, (2, 16, 4))
        variables = m.init(KEY, x)
        out = m.apply(variables, x)
        assert out.shape == (2, 16, 8)

    def test_vn_linear_and_leaky_relu(self):
        from svnet_tpu import ops as O
        from svnet_tpu.nn.vn_layers import VNLinearAndLeakyReLU

        m = VNLinearAndLeakyReLU(7)
        v = jax.random.normal(KEY, (2, 16, 3, 5))
        variables = m.init(KEY, v)
        out = m.apply(variables, v)
        assert out.shape == (2, 16, 3, 7)
        # equivariance
        R = O.random_rotations(jax.random.PRNGKey(5), 2)
        v_r = jnp.einsum("bnic,bij->bnjc", v, R)
        out_r = m.apply(variables, v_r)
        np.testing.assert_allclose(
            np.asarray(out_r),
            np.asarray(jnp.einsum("bnic,bij->bnjc", out, R)),
            rtol=1e-4, atol=1e-5,
        )

    def test_bipointnet_semseg(self):
        from svnet_tpu.models import BiPointNet_SEMSEG

        m = BiPointNet_SEMSEG(num_classes=13)
        pts = jax.random.normal(KEY, (2, 1024, 9))
        variables = m.init(KEY, pts)
        out, trans_feat = m.apply(variables, pts)
        assert out.shape == (2, 1024, 13)
        assert trans_feat.shape == (2, 64, 64)
