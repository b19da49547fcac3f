"""VN-family checkpoint conversion: full-model logits parity vs the torch
reference (mean pooling, the reference default)."""

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.utils.convert import check_structure, convert_state_dict

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    import importlib

    mod = importlib.import_module("models")
    yield mod
    sys.path.remove("/root/reference")


def _randomize_bn(tm, torch):
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.uniform_(-0.2, 0.2, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)


def test_vn_dgcnn_cls_parity(ref):
    import torch

    torch.manual_seed(0)
    args = SimpleNamespace(k=8, pooling="mean")
    tm = ref.VN_DGCNN_CLS(args, num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)

    pts = np.random.RandomState(0).randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="vn_dgcnn_cls")

    m = models.VN_DGCNN_CLS(num_classes=40, k=8, pooling="mean")
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got = np.asarray(m.apply(variables, jnp.asarray(pts), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_vn_pointnet_cls_parity(ref):
    import torch

    torch.manual_seed(1)
    args = SimpleNamespace(k=8, pooling="mean")
    tm = ref.VN_PointNet_CLS(args, num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)

    pts = np.random.RandomState(1).randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="vn_pointnet_cls")

    m = models.VN_PointNet_CLS(num_classes=40, k=8, pooling="mean")
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got = np.asarray(m.apply(variables, jnp.asarray(pts), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
