"""Original PointNet/DGCNN checkpoint conversion: logits parity vs torch."""

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

    # dgcnn modules are not exported by the reference __init__ (dead wiring)
    mod = importlib.import_module("models")
    dg_cls = importlib.import_module("models.dgcnn_cls")
    dg_pseg = importlib.import_module("models.dgcnn_partseg")
    # the reference forgot to import torch.nn.init (SURVEY.md §2.10) —
    # patch the module namespace so the oracle can be constructed at all
    import torch

    dg_pseg.init = torch.nn.init
    yield SimpleNamespace(
        PointNet_CLS=mod.PointNet_CLS,
        PointNet_PSEG=mod.PointNet_PSEG,
        DGCNN_CLS=dg_cls.DGCNN_CLS,
        DGCNN_PSEG=dg_pseg.DGCNN_PSEG,
    )
    sys.path.remove("/root/reference")


def _randomize_bn(tm, torch):
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.uniform_(-0.2, 0.2, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)


def _convert_and_check(tm, model_key, ours, init_args):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model=model_key)
    init_vars = ours.init(jax.random.PRNGKey(0), *init_args)
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched
    return variables


def test_pointnet_cls_parity(ref):
    import torch

    torch.manual_seed(0)
    tm = ref.PointNet_CLS(SimpleNamespace(k=8), num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    pts = np.random.RandomState(0).randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(pts.transpose(0, 2, 1)))
    m = models.PointNet_CLS(num_classes=40)
    variables = _convert_and_check(tm, "pointnet_cls", m, (jnp.asarray(pts),))
    got, _ = m.apply(variables, jnp.asarray(pts), False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-4)


def test_pointnet_partseg_parity(ref):
    import torch

    torch.manual_seed(1)
    tm = ref.PointNet_PSEG(SimpleNamespace(k=8), num_part=50)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    rs = np.random.RandomState(1)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    lab = np.zeros((2, 16), dtype=np.float32)
    lab[:, 2] = 1.0
    with torch.no_grad():
        want, _ = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(lab[:, None, :]),
        )
    m = models.PointNet_PSEG(num_part=50)
    variables = _convert_and_check(
        tm, "pointnet_partseg", m, (jnp.asarray(pts), jnp.asarray(lab))
    )
    got, _ = m.apply(variables, jnp.asarray(pts), jnp.asarray(lab), False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 1), rtol=1e-3, atol=1e-4
    )


def test_dgcnn_cls_parity(ref):
    import torch

    torch.manual_seed(2)
    tm = ref.DGCNN_CLS(SimpleNamespace(k=8), num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    pts = np.random.RandomState(2).randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()
    m = models.DGCNN_CLS(num_classes=40, k=8)
    variables = _convert_and_check(tm, "dgcnn_cls", m, (jnp.asarray(pts),))
    got = np.asarray(m.apply(variables, jnp.asarray(pts), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_dgcnn_partseg_parity(ref):
    import torch

    torch.manual_seed(3)
    tm = ref.DGCNN_PSEG(SimpleNamespace(k=8), num_part=50)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    rs = np.random.RandomState(3)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    lab = np.zeros((2, 16), dtype=np.float32)
    lab[:, 9] = 1.0
    with torch.no_grad():
        want = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(lab[:, None, :]),
        ).numpy()
    m = models.DGCNN_PSEG(num_part=50, k=8)
    variables = _convert_and_check(
        tm, "dgcnn_partseg", m, (jnp.asarray(pts), jnp.asarray(lab))
    )
    got = np.asarray(m.apply(variables, jnp.asarray(pts), jnp.asarray(lab), False))
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 1), rtol=1e-3, atol=1e-4
    )
