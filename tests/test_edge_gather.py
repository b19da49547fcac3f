"""edge_gather custom-VJP op: forward vs take_along_axis, backward vs XLA AD."""

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu.ops.pallas.edge_gather import edge_gather

B, N, K, C = 2, 128, 8, 22


def _ref_gather(src, idx):
    return jax.vmap(lambda s, i: s[i])(src, idx)


def test_forward_bit_exact():
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, C)) * 57.3
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, N, K), 0, N, jnp.int32)
    got = np.asarray(edge_gather(src, idx, True))
    want = np.asarray(_ref_gather(src, idx))
    assert (got == want).all()


def test_vjp_matches_xla_ad():
    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, N, K), 0, N, jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (B, N, K, C))

    def f_pallas(s):
        return jnp.sum(edge_gather(s, idx, True) * cot)

    def f_xla(s):
        return jnp.sum(_ref_gather(s, idx) * cot)

    g1 = np.asarray(jax.grad(f_pallas)(src))
    g2 = np.asarray(jax.grad(f_xla)(src))
    # backward runs in bf16 on the transposed one-hot matmul; cotangent
    # sums of ~K values keep ~2^-8 relative agreement
    np.testing.assert_allclose(g1, g2, rtol=2e-2, atol=2e-2)


def test_dispatch_through_graph_ops():
    """config.edge_gather='pallas' routes gather_neighbors through the op
    (interpret mode off-TPU) and matches the XLA path bit-exactly fwd."""
    from svnet_tpu import config, ops

    src = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3, 7))
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, N, K), 0, N, jnp.int32)
    want = np.asarray(ops.graph.gather_neighbors(src, idx))
    try:
        config.set_edge_gather("pallas")
        import svnet_tpu.ops.pallas.edge_gather as eg
        orig = eg.edge_gather
        eg.edge_gather = lambda s, i, interpret=False: orig(s, i, True)
        got = np.asarray(ops.graph.gather_neighbors(src, idx))
    finally:
        eg.edge_gather = orig
        config.set_edge_gather("auto")
    assert (got == want).all()
