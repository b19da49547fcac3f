"""SVPointNetPsegEngine vs flax SV_PointNet_PSEG.apply (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.infer import SVPointNetPsegEngine

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

B, N, K = 2, 64, 4


@pytest.mark.parametrize("binary", [False, True])
def test_pointnet_pseg_engine_matches_flax(binary):
    model = models.SV_PointNet_PSEG(num_part=50, k=K, binary=binary)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    label = jax.nn.one_hot(jnp.arange(B) % 16, 16, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), points, label)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    want = np.asarray(model.apply(variables, points, label, False))
    eng = SVPointNetPsegEngine(
        variables, num_part=50, k=K, binary=binary, exact=True, interpret=True,
    )
    got = np.asarray(eng(points, label))
    if not binary:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    else:
        # 11 sequential binary STE blocks: reassociation ulps cross sign()
        # boundaries and cascade (every stage matches flax bit-close in
        # isolation), so per-point 50-way logits at RANDOM init disagree
        # exactly where the flax decision margin is itself a near-tie.
        # Assert that: (a) most points agree, and (b) every disagreeing
        # point sits in the narrow-margin tie class of the flax logits.
        top2 = np.sort(want, -1)
        margin = top2[..., -1] - top2[..., -2]
        bad = np.argmax(got, -1) != np.argmax(want, -1)
        agree = 1.0 - bad.mean()
        assert agree >= 0.80, agree
        if bad.any():
            assert (
                np.quantile(margin[bad], 0.95) < np.quantile(margin, 0.5)
            ), (np.quantile(margin[bad], 0.95), np.quantile(margin, 0.5))
        np.testing.assert_allclose(got, want, rtol=0.5, atol=0.5)
