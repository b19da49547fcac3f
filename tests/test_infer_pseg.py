"""Fused partseg engine vs flax SV_DGCNN_PSEG (CPU, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.infer import SVDGCNNPsegEngine

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

B, N, K = 2, 128, 8


@pytest.mark.parametrize("binary", [True, False])
def test_pseg_engine_matches_flax(binary):
    model = models.SV_DGCNN_PSEG(num_part=50, k=K, binary=binary)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    label = jnp.zeros((B, 16)).at[:, 4].set(1.0)
    variables = model.init(jax.random.PRNGKey(1), points, label)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    want = np.asarray(model.apply(variables, points, label, False))

    eng = SVDGCNNPsegEngine(
        variables, num_part=50, k=K, binary=binary, exact=True, interpret=True
    )
    got = np.asarray(eng(points, label))
    assert got.shape == want.shape == (B, N, 50)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
