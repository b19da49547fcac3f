"""Complexity analyzer tests: param weighting and op classification."""

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu.utils.analysis import analyze_model, count_params, op_counts


def test_count_params_binary_weighting():
    params = {
        "fp": {"kernel": np.zeros((10, 10)), "bias": np.zeros(10)},
        "bin": {"kernel": np.zeros((10, 10)), "scale": np.zeros(10)},
    }
    res = count_params(params)
    assert abs(res["params_m"] * 1e6 - 220) < 1e-6
    assert abs(res["binarized_m"] * 1e6 - 100) < 1e-6
    # 120 fp32 params * 32 bits + 100 binary * 1 bit
    assert abs(res["size_mbit"] * 1e6 - (120 * 32 + 100)) < 1e-3


def test_op_counts_classification():
    w = jnp.ones((8, 16))

    def fp(x):
        return x @ w

    def bin_both(x):
        return jnp.sign(x) @ jnp.sign(w)

    def bin_w(x):
        return x @ jnp.sign(w)

    x = jnp.ones((4, 8))
    assert op_counts(fp, x)["macs"] * 1e6 == 4 * 8 * 16
    assert op_counts(bin_both, x)["bops"] * 1e6 == 4 * 8 * 16
    assert op_counts(bin_w, x)["adds"] * 1e6 == 4 * 8 * 16


def test_analyze_sv_dgcnn_binary_moves_ops_to_bops():
    fp = analyze_model(
        "cls", "dgcnn", "svnet", binary=False, num_points=64, k=8
    )
    bi = analyze_model(
        "cls", "dgcnn", "svnet", binary=True, num_points=64, k=8
    )
    assert bi["bops_m_per_cloud"] > 0
    assert bi["macs_m_per_cloud"] < fp["macs_m_per_cloud"]
    assert bi["size_mbit"] < fp["size_mbit"] / 5  # 1-bit weights dominate
