"""SV layer library tests: binarization semantics, equivariance/invariance
properties, and golden parity against the PyTorch reference layers (imported
read-only from /root/reference purely as a test oracle)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl

KEY = jax.random.PRNGKey(0)


def rotate_vec(v, rot):
    """Rotate the 3-axis of (..., 3, C) vector features, row-vector convention
    (matches points p' = p @ R)."""
    return jnp.einsum("...ic,...ij->...jc", v, rot[:, None, None] if False else rot)


def rot_v(v, R):
    # v: (B, ..., 3, C), R: (B, 3, 3): v'[b,...,j,c] = sum_i v[b,...,i,c] R[b,i,j]
    return jnp.einsum("b...ic,bij->b...jc", v, R)


class TestSTESign:
    def test_forward_is_sign(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.7, 3.0])
        np.testing.assert_array_equal(
            np.asarray(svl.ste_sign(x)), np.sign(np.asarray(x))
        )

    def test_gradient_is_clip_window(self):
        g = jax.grad(lambda x: svl.ste_sign(x).sum())(
            jnp.array([-2.0, -1.0, 0.0, 1.1, 1.3])
        )
        np.testing.assert_array_equal(
            np.asarray(g), np.array([0.0, 1.0, 1.0, 1.0, 0.0])
        )

    def test_eval_binarize_is_plain_sign(self):
        x = jnp.array([-0.3, 0.0, 0.5])
        np.testing.assert_array_equal(
            np.asarray(svl.binarize(x, train=False)), np.array([-1.0, 0.0, 1.0])
        )


class TestLinear:
    def test_fp_matches_matmul(self):
        m = svl.Linear(8, use_bias=True)
        x = jax.random.normal(KEY, (4, 5))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        k = params["params"]["kernel"]
        b = params["params"]["bias"]
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ k + b), rtol=1e-6
        )

    def test_binary_eval_is_sign_matmul(self):
        m = svl.Linear(8, use_bias=False, bw=True, ba=True)
        x = jax.random.normal(KEY, (4, 5))
        params = m.init(KEY, x)
        y = m.apply(params, x, False)
        p = params["params"]
        want = (
            np.sign(np.asarray(x) + np.asarray(p["beta"]))
            @ np.sign(np.asarray(p["kernel"]))
        ) * np.asarray(p["scale"])
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)

    def test_scale_init(self):
        m = svl.Linear(8, use_bias=False, bw=True)
        x = jnp.zeros((2, 16))
        params = m.init(KEY, x)
        np.testing.assert_allclose(
            np.asarray(params["params"]["scale"]), 1.0 / 4.0
        )


class TestEquivariance:
    """f(R x) == R f(x) for vector streams; f(R x) == f(x) for scalars."""

    B, N, k = 2, 16, 4

    def _rand_pair(self, s_dim=6, v_dim=2, with_k=True):
        shape_s = (self.B, self.N, self.k, s_dim) if with_k else (self.B, self.N, s_dim)
        shape_v = (
            (self.B, self.N, self.k, 3, v_dim)
            if with_k
            else (self.B, self.N, 3, v_dim)
        )
        s = jax.random.normal(jax.random.PRNGKey(1), shape_s)
        v = jax.random.normal(jax.random.PRNGKey(2), shape_v)
        R = ops.random_rotations(jax.random.PRNGKey(3), self.B)
        return s, v, R

    def test_vector_bn_equivariant(self):
        _, v, R = self._rand_pair()
        m = svl.VectorBN()
        params = m.init(KEY, v)
        for train in (False, True):
            kwargs = dict(mutable=["batch_stats"]) if train else {}
            out = m.apply(params, v, train, **kwargs)
            out_r = m.apply(params, rot_v(v, R), train, **kwargs)
            if train:
                out, out_r = out[0], out_r[0]
            np.testing.assert_allclose(
                np.asarray(out_r), np.asarray(rot_v(out, R)), rtol=1e-4, atol=1e-5
            )

    def test_vector2scalar_invariant(self):
        _, v, R = self._rand_pair()
        m = svl.Vector2Scalar(3)
        params = m.init(KEY, v)
        s = m.apply(params, v)
        s_r = m.apply(params, rot_v(v, R))
        np.testing.assert_allclose(
            np.asarray(s_r), np.asarray(s), rtol=1e-4, atol=1e-5
        )
        assert s.shape == v.shape[:-2] + (v.shape[-1] * 3,)

    def test_vector2scalar_trans_back_frame_equivariant(self):
        _, v, R = self._rand_pair()
        m = svl.Vector2Scalar(3, trans_back=True)
        params = m.init(KEY, v)
        _, z = m.apply(params, v)
        _, z_r = m.apply(params, rot_v(v, R))
        np.testing.assert_allclose(
            np.asarray(z_r), np.asarray(rot_v(z, R)), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("binary", [False, True])
    @pytest.mark.parametrize("train", [False, True])
    def test_svblock_sv_contract(self, binary, train):
        s, v, R = self._rand_pair()
        m = svl.SVBlock(16, 5, binary=binary)
        params = m.init(KEY, (s, v))
        kwargs = dict(mutable=["batch_stats"]) if train else {}
        out = m.apply(params, (s, v), train, **kwargs)
        out_r = m.apply(params, (s, rot_v(v, R)), train, **kwargs)
        if train:
            out, out_r = out[0], out_r[0]
        s_out, v_out = out
        s_out_r, v_out_r = out_r
        assert s_out.shape == (self.B, self.N, self.k, 16)
        assert v_out.shape == (self.B, self.N, self.k, 3, 5)
        # scalars invariant (eval: exactly up to float; train: batch stats of
        # invariant quantities are also invariant)
        np.testing.assert_allclose(
            np.asarray(s_out_r), np.asarray(s_out), rtol=2e-3, atol=2e-5
        )
        # vectors equivariant
        np.testing.assert_allclose(
            np.asarray(v_out_r),
            np.asarray(rot_v(v_out, R)),
            rtol=2e-3,
            atol=2e-5,
        )

    def test_svfuse_invariant(self):
        s, v, R = self._rand_pair()
        m = svl.SVFuse(3)
        params = m.init(KEY, (s, v))
        out = m.apply(params, (s, v))
        out_r = m.apply(params, (s, rot_v(v, R)))
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(out), rtol=1e-4, atol=1e-5
        )
        assert out.shape[-1] == s.shape[-1] + 3 * v.shape[-1]

    def test_sv_stnkd_contract(self):
        s, v, R = self._rand_pair(s_dim=32, v_dim=10, with_k=False)
        m = svl.SV_STNkd(32, 10)
        params = m.init(KEY, (s, v))
        s_out, v_out = m.apply(params, (s, v))
        s_out_r, v_out_r = m.apply(params, (s, rot_v(v, R)))
        assert s_out.shape == (self.B, 32)
        assert v_out.shape == (self.B, 3, 10)
        np.testing.assert_allclose(
            np.asarray(s_out_r), np.asarray(s_out), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(v_out_r), np.asarray(rot_v(v_out, R)), rtol=1e-3, atol=1e-4
        )


class TestGoldenParityVsTorchReference:
    """Import the reference layers (read-only) as an oracle and check our
    layers produce identical outputs given identical parameters."""

    @pytest.fixture(autouse=True)
    def _ref(self):
        sys.path.insert(0, "/root/reference")
        import importlib

        self.ref_sv = importlib.import_module("models.sv_layers")
        yield
        sys.path.remove("/root/reference")

    def test_linear_binary_parity_eval_and_train(self):
        import torch

        torch.manual_seed(0)
        ref = self.ref_sv.Linear(6, 8, bias=False, bw=True, ba=True)
        # randomize beta/scale so the test is not trivially zero/const
        with torch.no_grad():
            ref.beta.uniform_(-0.5, 0.5)
            ref.scale.uniform_(0.1, 1.0)
        x = np.random.RandomState(0).randn(10, 6).astype(np.float32)

        m = svl.Linear(8, use_bias=False, bw=True, ba=True)
        params = {
            "params": {
                "kernel": jnp.asarray(ref.weight.detach().numpy().T),
                "beta": jnp.asarray(ref.beta.detach().numpy()[0]),
                "scale": jnp.asarray(ref.scale.detach().numpy()[0]),
            }
        }
        for train in (False, True):
            ref.train(train)
            with torch.no_grad():
                want = ref(torch.from_numpy(x)).numpy()
            got = np.asarray(m.apply(params, jnp.asarray(x), train))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_vector2scalar_parity(self):
        import torch

        torch.manual_seed(1)
        ref = self.ref_sv.Vector2Scalar(4, 3)
        v = np.random.RandomState(1).randn(2, 5, 7, 3, 4).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(v)).numpy()
        m = svl.Vector2Scalar(3)
        params = {
            "params": {
                "linear": {
                    "kernel": jnp.asarray(ref.linear.weight.detach().numpy().T)
                }
            }
        }
        got = np.asarray(m.apply(params, jnp.asarray(v)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_svblock_parity_eval(self):
        import torch

        torch.manual_seed(2)
        ref = self.ref_sv.SVBlock((6, 2), (16, 5), binary=True)
        ref.eval()
        # randomize BN running stats so parity is meaningful
        with torch.no_grad():
            ref.bn1.running_mean.uniform_(-0.3, 0.3)
            ref.bn1.running_var.uniform_(0.5, 1.5)
            ref.bn2.bn.running_mean.uniform_(-0.3, 0.3)
            ref.bn2.bn.running_var.uniform_(0.5, 1.5)
            ref.linear1.beta.uniform_(-0.2, 0.2)

        rs = np.random.RandomState(2)
        s = rs.randn(2, 8, 4, 6).astype(np.float32)
        v = rs.randn(2, 8, 4, 3, 2).astype(np.float32)
        with torch.no_grad():
            want_s, want_v = ref((torch.from_numpy(s), torch.from_numpy(v)))

        m = svl.SVBlock(16, 5, binary=True)

        def t(x):
            return jnp.asarray(x.detach().numpy())

        params = {
            "params": {
                "gate_fc1": {"kernel": t(ref.gate[0].weight).T},
                "gate_fc2": {"kernel": t(ref.gate[2].weight).T},
                "v2s": {
                    "linear": {
                        "kernel": t(ref.v2s.linear.weight).T,
                        "scale": t(ref.v2s.linear.scale)[0],
                    }
                },
                "linear1": {
                    "kernel": t(ref.linear1.weight).T,
                    "beta": t(ref.linear1.beta)[0],
                    "scale": t(ref.linear1.scale)[0],
                },
                "bn1": {
                    "bn": {"scale": t(ref.bn1.weight), "bias": t(ref.bn1.bias)}
                },
                "linear2": {
                    "kernel": t(ref.linear2.weight).T,
                    "scale": t(ref.linear2.scale)[0],
                },
                "bn2": {
                    "bn": {
                        "scale": t(ref.bn2.bn.weight),
                        "bias": t(ref.bn2.bn.bias),
                    }
                },
            },
            "batch_stats": {
                "bn1": {
                    "bn": {
                        "mean": t(ref.bn1.running_mean),
                        "var": t(ref.bn1.running_var),
                    }
                },
                "bn2": {
                    "bn": {
                        "mean": t(ref.bn2.bn.running_mean),
                        "var": t(ref.bn2.bn.running_var),
                    }
                },
            },
        }
        got_s, got_v = m.apply(params, (jnp.asarray(s), jnp.asarray(v)), False)
        np.testing.assert_allclose(
            np.asarray(got_s), want_s.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_v), want_v.numpy(), rtol=1e-4, atol=1e-5
        )
