"""Exactness of the XNOR-popcount kernel vs the dense ±1 matmul.

The kernel is benchmark-only (int8 MXU is the production binary path — see
ops/pallas/binary_matmul.py docstring and PERF.md), but its correctness
claim must be tested, not asserted (VERDICT r2 missing #6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu.ops.pallas.binary_matmul import pack_signs, xnor_popcount_matmul


def _pm1(key, shape):
    return jnp.where(jax.random.bernoulli(key, 0.5, shape), 1.0, -1.0)


@pytest.mark.parametrize("M,K,N", [(128, 64, 128), (256, 128, 64), (384, 96, 32)])
def test_xnor_matches_dense(M, K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = _pm1(kx, (M, K))
    w = _pm1(kw, (K, N))
    got = xnor_popcount_matmul(x, w, interpret=True)
    want = x @ w
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_signs_roundtrip():
    x = _pm1(jax.random.PRNGKey(3), (8, 64))
    p = np.asarray(pack_signs(x))
    bits = (np.asarray(x) > 0).astype(np.uint32)
    want = np.zeros((8, 2), np.uint32)
    for j in range(2):
        for b in range(32):
            want[:, j] |= bits[:, 32 * j + b] << b
    np.testing.assert_array_equal(p.astype(np.uint32), want)
