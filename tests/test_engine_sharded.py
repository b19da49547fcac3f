"""Multi-device fused inference: the engine under batch sharding on the
8-device virtual mesh produces identical outputs to single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu import models, parallel
from svnet_tpu.infer import SVDGCNNClsEngine

B, N, K = 8, 128, 8


def test_engine_batch_sharded_matches():
    model = models.SV_DGCNN_CLS(num_classes=40, k=K, binary=True)
    points = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    variables = model.init(jax.random.PRNGKey(1), points)
    eng = SVDGCNNClsEngine(variables, k=K, binary=True, exact=True)

    mesh = parallel.make_mesh(8, model=1)
    pts_sharded = jax.device_put(points, parallel.batch_sharding(mesh, 3))
    out_sharded = np.asarray(jax.jit(eng._forward)(pts_sharded))
    out_single = np.asarray(jax.jit(eng._forward)(points))
    np.testing.assert_array_equal(out_sharded, out_single)
