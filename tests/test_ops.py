"""Unit tests for svnet_tpu.ops: kNN vs brute force, graph features, pooling,
rotation sampling, and the equivariance/invariance contracts of the raw ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import ops

KEY = jax.random.PRNGKey(0)


def brute_force_knn(x, k):
    # O(N^2) reference in numpy: argsort of true distances.
    x = np.asarray(x)
    B, N, _ = x.shape
    out = np.zeros((B, N, k), dtype=np.int32)
    for b in range(B):
        d = ((x[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)
        out[b] = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return out


class TestKNN:
    def test_matches_brute_force_distances(self):
        """Selected neighbours are within float tolerance of the true k-NN.

        The matmul distance formulation (same as the reference's) can swap
        near-ties vs exact arithmetic, so we check distances, not index sets.
        """
        x = jax.random.normal(KEY, (2, 64, 3))
        k = 8
        idx = np.asarray(ops.knn(x, k))
        xn = np.asarray(x)
        for b in range(2):
            d = ((xn[b][:, None, :] - xn[b][None, :, :]) ** 2).sum(-1)
            kth = np.sort(d, axis=-1)[:, k - 1]  # true k-th smallest distance
            picked = np.take_along_axis(d, idx[b], axis=-1)
            # f32 cancellation in -xx + 2xy - yy gives ~1% relative error
            # near ties (the torch reference has the same formulation/error)
            assert (picked <= kth[:, None] * 1.02 + 1e-3).all(), b

    def test_self_always_included(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 16))
        idx = np.asarray(ops.knn(x, 5))
        for b in range(3):
            for n in range(32):
                assert n in idx[b, n]

    def test_nearest_is_self(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 3))
        idx = np.asarray(ops.knn(x, 4))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(16))


class TestGraphFeatures:
    def test_get_graph_feature_shape_and_channels(self):
        pts = jax.random.normal(KEY, (2, 32, 3))
        v = ops.get_graph_feature(pts, k=6)
        assert v.shape == (2, 32, 6, 3, 2)
        # channel 1 is the broadcast center point
        np.testing.assert_allclose(
            np.asarray(v[..., 1]),
            np.broadcast_to(np.asarray(pts)[:, :, None, :], (2, 32, 6, 3)),
            rtol=1e-6,
        )
        # channel 0 at the self-neighbour slot is zero
        idx = np.asarray(ops.knn(pts, 6))
        diff = np.asarray(v[..., 0])
        for b in range(2):
            for n in range(32):
                self_slot = list(idx[b, n]).index(n)
                np.testing.assert_allclose(diff[b, n, self_slot], 0.0, atol=1e-6)

    def test_get_graph_feature_first_variant(self):
        """ref sv_util.py:55-58 (``first=True``): channel 1 becomes the
        k-mean of the diff channel, making layer 0 translation-invariant."""
        pts = jax.random.normal(KEY, (2, 32, 3))
        v0 = ops.get_graph_feature(pts, k=6)
        v1 = ops.get_graph_feature(pts, k=6, first=True)
        assert v1.shape == (2, 32, 6, 3, 2)
        np.testing.assert_allclose(
            np.asarray(v1[..., 0]), np.asarray(v0[..., 0]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(v1[..., 1]),
            np.broadcast_to(
                np.asarray(v0[..., 0]).mean(axis=2, keepdims=True),
                (2, 32, 6, 3),
            ),
            rtol=1e-5, atol=1e-6,
        )
        # translation invariance (the point of the variant)
        vt = ops.get_graph_feature(pts + 5.0, k=6, first=True)
        np.testing.assert_allclose(
            np.asarray(vt), np.asarray(v1), rtol=1e-4, atol=1e-5
        )

    def test_cross_feature(self):
        pts = jax.random.normal(KEY, (1, 16, 3))
        v = ops.get_graph_feature_cross(pts, k=4)
        assert v.shape == (1, 16, 4, 3, 3)
        idx = ops.knn(pts, 4)
        nbr = np.asarray(ops.gather_neighbors(pts, idx))
        ctr = np.broadcast_to(np.asarray(pts)[:, :, None, :], nbr.shape)
        np.testing.assert_allclose(
            np.asarray(v[..., 2]), np.cross(nbr, ctr), rtol=1e-5, atol=1e-6
        )

    def test_sv_graph_feature_shapes(self):
        s = jax.random.normal(KEY, (2, 32, 10))
        v = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 3, 4))
        s_f, v_f = ops.get_graph_feature_sv((s, v), k=5)
        assert s_f.shape == (2, 32, 5, 20)
        assert v_f.shape == (2, 32, 5, 3, 8)
        # center halves are broadcasts of the originals
        np.testing.assert_allclose(
            np.asarray(s_f[..., 10:]),
            np.broadcast_to(np.asarray(s)[:, :, None], (2, 32, 5, 10)),
            rtol=1e-6,
        )

    def test_equivariance_of_vector_graph_features(self):
        """v-features of rotated points == rotated v-features (p' = p @ R)."""
        pts = jax.random.normal(KEY, (2, 32, 3))
        rot = ops.random_rotations(jax.random.PRNGKey(7), 2)
        pts_r = ops.rotate_points(pts, rot)
        # fix the graph: kNN sets are rotation-invariant in exact arithmetic
        # but float near-ties can flip; feature construction is what we test
        idx = ops.knn(pts, 6)
        for fn in (ops.get_graph_feature, ops.get_graph_feature_cross):
            v = fn(pts, k=6, idx=idx)
            v_r = fn(pts_r, k=6, idx=idx)
            # rotate each 3-vector channel: (B,N,k,3,C) x (B,3,3)
            want = jnp.einsum("bnkic,bij->bnkjc", v, rot)
            # cross products transform with det(R)=+1 rotations like vectors
            np.testing.assert_allclose(
                np.asarray(v_r), np.asarray(want), rtol=1e-4, atol=1e-5
            )


class TestPoolCat:
    def test_svpool_max_mean(self):
        s = jax.random.normal(KEY, (2, 8, 5, 6))
        v = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 5, 3, 4))
        ps, pv = ops.svpool((s, v), axis=2)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(s.max(axis=2)))
        np.testing.assert_allclose(
            np.asarray(pv), np.asarray(v.mean(axis=2)), rtol=1e-6
        )
        ps2, _ = ops.svpool((s, v), axis=2, spool="mean")
        np.testing.assert_allclose(
            np.asarray(ps2), np.asarray(s.mean(axis=2)), rtol=1e-6
        )
        with pytest.raises(ValueError):
            ops.svpool((s, v), spool="bogus")

    def test_svcat(self):
        s1 = jnp.ones((2, 8, 3))
        v1 = jnp.ones((2, 8, 3, 2))
        s2 = jnp.zeros((2, 8, 5))
        v2 = jnp.zeros((2, 8, 3, 4))
        s, v = ops.svcat([(s1, v1), (s2, v2)])
        assert s.shape == (2, 8, 8)
        assert v.shape == (2, 8, 3, 6)


class TestRotations:
    def test_random_rotations_are_orthonormal(self):
        R = np.asarray(ops.random_rotations(KEY, 64))
        eye = np.eye(3)[None]
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(eye, R.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_z_rotations_fix_z(self):
        R = np.asarray(ops.random_z_rotations(KEY, 16))
        z = np.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(z @ R, np.broadcast_to(z, (16, 3)), atol=1e-6)

    def test_uniformity_moments(self):
        # For Haar-uniform R, E[R] = 0 and E[trace(R)] = 0 (character of the
        # fundamental rep integrates to 0); loose tolerance sanity check.
        R = np.asarray(ops.random_rotations(jax.random.PRNGKey(42), 20000))
        assert abs(np.trace(R.mean(0))) < 0.05
        assert np.abs(R.mean(0)).max() < 0.05

    def test_apply_rotation_aug_modes(self):
        pts = jax.random.normal(KEY, (4, 16, 3))
        assert np.allclose(
            np.asarray(ops.apply_rotation_aug(KEY, pts, "aligned")),
            np.asarray(pts),
        )
        out_z = ops.apply_rotation_aug(KEY, pts, "z")
        out_so3 = ops.apply_rotation_aug(KEY, pts, "so3")
        assert out_z.shape == pts.shape and out_so3.shape == pts.shape
        # z-rotation preserves the z coordinate
        np.testing.assert_allclose(
            np.asarray(out_z[..., 2]), np.asarray(pts[..., 2]), rtol=1e-5, atol=1e-6
        )
        with pytest.raises(ValueError):
            ops.apply_rotation_aug(KEY, pts, "bogus")
