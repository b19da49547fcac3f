"""Equivalence tests for the fused edge-SVBlock Pallas kernel (interpret
mode on CPU) against the reference flax path
(get_graph_feature_sv -> SVBlock -> svpool)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import ops
from svnet_tpu.nn import sv_layers as svl
from svnet_tpu.ops.pallas.sv_edge import (
    arrange_idx,
    fold_svblock_params,
    sv_edge_block,
    svblock_gate,
)

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

B, N, S, V, S_OUT, V_OUT, K, T = 2, 128, 16, 5, 24, 7, 10, 64


def _setup(binary, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    # round both inputs through bf16 so the kernel's uniform-bf16 gather and
    # the f32 flax path see identical values (sign() amplifies any residue)
    s = jax.random.normal(ks[0], (B, N, S)).astype(jnp.bfloat16).astype(jnp.float32)
    v = (
        jax.random.normal(ks[1], (B, N, 3, V))
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    joint = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
    idx = ops.knn(joint, K)

    block = svl.SVBlock(S_OUT, V_OUT, binary=binary)
    s_f, v_f = ops.get_graph_feature_sv((s, v), K, idx=idx)
    variables = block.init(ks[2], (s_f, v_f))
    params = variables["params"]
    stats = variables["batch_stats"]
    # non-trivial BN stats
    stats = jax.tree.map(
        lambda x: x + jax.random.uniform(ks[3], x.shape, minval=0.1, maxval=0.5),
        stats,
    )
    variables = {"params": params, "batch_stats": stats}
    return s, v, idx, block, variables


def _flax_reference(block, variables, s, v, idx):
    s_f, v_f = ops.get_graph_feature_sv((s, v), K, idx=idx)
    out = block.apply(variables, (s_f, v_f), False)
    return ops.svpool(out, axis=2)


@pytest.mark.parametrize("binary", [False, True])
def test_fused_block_matches_flax(binary):
    s, v, idx, block, variables = _setup(binary)
    want_s, want_v = _flax_reference(block, variables, s, v, idx)

    folded = fold_svblock_params(
        variables["params"], variables["batch_stats"], S, V, binary
    )
    gate = svblock_gate(variables["params"], s, idx)
    src = jnp.concatenate([s, v.reshape(B, N, -1)], axis=-1)
    got_s, got_v = sv_edge_block(
        src, idx, gate, folded,
        S=S, V=V, S_out=S_OUT, V_out=V_OUT, k=K, T=T,
        binary=binary, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=2e-2, atol=1e-2
    )
    want_v_flat = np.asarray(want_v).reshape(B, N, 3 * V_OUT)
    np.testing.assert_allclose(
        np.asarray(got_v), want_v_flat, rtol=2e-2, atol=1e-2
    )


def test_gate_matches_flax_gate():
    s, v, idx, block, variables = _setup(binary=False, seed=3)
    s_f, _ = ops.get_graph_feature_sv((s, v), K, idx=idx)
    p = variables["params"]
    s_mean = jnp.mean(s_f.reshape(B, -1, s_f.shape[-1]), axis=1)
    want = jax.nn.sigmoid(
        jax.nn.relu(s_mean @ p["gate_fc1"]["kernel"]) @ p["gate_fc2"]["kernel"]
    )
    got = svblock_gate(p, s, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_arrange_idx_layout():
    idx = jnp.arange(2 * 8 * 3).reshape(2, 8, 3) % 8
    arr = arrange_idx(idx, T=4)  # (2, 2, 12), rows j-major t-minor
    idxn = np.asarray(idx)
    out = np.asarray(arr)
    for b in range(2):
        for tile in range(2):
            for j in range(3):
                for t in range(4):
                    assert out[b, tile, j * 4 + t] == idxn[b, tile * 4 + t, j]
