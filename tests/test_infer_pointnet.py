"""Fused SV-PointNet engine vs flax (CPU, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.infer import SVPointNetClsEngine

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

B, N, K = 2, 128, 8


@pytest.mark.parametrize("binary", [False, True])
def test_pointnet_engine_matches_flax(binary):
    model = models.SV_PointNet_CLS(num_classes=40, k=K, binary=binary)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    want = np.asarray(model.apply(variables, points, False))
    eng = SVPointNetClsEngine(
        variables, k=K, binary=binary, exact=True, interpret=True
    )
    got = np.asarray(eng(points))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
