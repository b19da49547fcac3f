"""End-to-end sharded large-N inference vs single-device flax (8-dev mesh).

The whole eval forward — per-round ring kNN, cross-shard edge gathers,
per-shard SVBlock math, collective gate means and global pools — runs under
shard_map on the virtual CPU mesh and must reproduce model.apply logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.parallel import make_mesh
from svnet_tpu.parallel.sharded_infer import sharded_cls_forward

B, N, K = 2, 256, 8


def _setup(binary):
    model = models.SV_DGCNN_CLS(num_classes=40, k=K, binary=binary)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.3 * jnp.abs(x) + 0.05, variables["batch_stats"]
        ),
    }
    return model, points, variables


@pytest.mark.parametrize("binary", [True, False])
def test_sharded_cls_matches_single_device(binary):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    model, points, variables, = _setup(binary)
    mesh = make_mesh(8)
    out = np.asarray(
        sharded_cls_forward(variables, points, mesh, k=K, binary=binary)
    )
    # oracle on the SAME Morton-sorted cloud (sorting is exact — cls
    # pooling is permutation-invariant; asserting against the sorted
    # cloud keeps kNN tie sets identical between the two paths)
    from svnet_tpu.ops.pallas.sv_round3 import morton_order

    order = morton_order(points)
    sorted_pts = jnp.take_along_axis(points, order[:, :, None], axis=1)
    want = np.asarray(model.apply(variables, sorted_pts, False))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_sharded_cls_shard_count_invariant():
    """Logits must not depend on HOW many shards the cloud is split over
    (2-way vs 8-way mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    _, points, variables = _setup(True)
    out8 = np.asarray(
        sharded_cls_forward(variables, points, make_mesh(8), k=K)
    )
    out2 = np.asarray(
        sharded_cls_forward(variables, points, make_mesh(2), k=K)
    )
    np.testing.assert_allclose(out2, out8, rtol=2e-4, atol=2e-4)
