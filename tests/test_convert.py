"""Checkpoint conversion tests: full-model logits parity between the torch
reference (imported read-only as an oracle) and our models under converted
weights — the stand-in for released-.pth parity (the released checkpoints
are not shipped in this snapshot, .MISSING_LARGE_BLOBS)."""

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.utils.convert import convert_state_dict, check_structure

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    import importlib

    mod = importlib.import_module("models")
    yield mod
    sys.path.remove("/root/reference")


def _randomize_bn_stats(torch_model, torch):
    """Give running stats non-trivial values so eval parity is meaningful."""
    g = torch.Generator().manual_seed(0)
    for m in torch_model.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.uniform_(-0.2, 0.2, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)
        if hasattr(m, "beta") and isinstance(
            getattr(m, "beta"), torch.nn.Parameter
        ):
            m.beta.data.uniform_(-0.1, 0.1, generator=g)


@pytest.mark.parametrize("binary", [False, True])
def test_sv_dgcnn_cls_logits_parity(ref, binary):
    import torch

    torch.manual_seed(0)
    args = SimpleNamespace(k=8, binary=binary)
    tm = ref.SV_DGCNN_CLS(args, num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, torch)

    rs = np.random.RandomState(0)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="sv_dgcnn_cls")

    m = models.SV_DGCNN_CLS(num_classes=40, k=8, binary=binary)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got = np.asarray(m.apply(variables, jnp.asarray(pts), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("binary", [False, True])
def test_sv_pointnet_cls_logits_parity(ref, binary):
    import torch

    torch.manual_seed(1)
    args = SimpleNamespace(k=8, binary=binary)
    tm = ref.SV_PointNet_CLS(args, num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, torch)

    rs = np.random.RandomState(1)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="sv_pointnet_cls")

    m = models.SV_PointNet_CLS(num_classes=40, k=8, binary=binary)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got = np.asarray(m.apply(variables, jnp.asarray(pts), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sv_dgcnn_partseg_logits_parity(ref):
    import torch

    torch.manual_seed(2)
    args = SimpleNamespace(k=8, binary=True, dropout=0.5)
    tm = ref.SV_DGCNN_PSEG(args, num_part=50)
    tm.eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, torch)

    rs = np.random.RandomState(2)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    lab = np.zeros((2, 16), dtype=np.float32)
    lab[:, 5] = 1.0
    with torch.no_grad():
        want = (
            tm(
                torch.from_numpy(pts.transpose(0, 2, 1)),
                torch.from_numpy(lab[:, None, :]),
            )
            .numpy()
            .transpose(0, 2, 1)  # (B, parts, N) -> (B, N, parts)
        )

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="sv_dgcnn_partseg")

    m = models.SV_DGCNN_PSEG(num_part=50, k=8, binary=True)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(lab))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got = np.asarray(m.apply(variables, jnp.asarray(pts), jnp.asarray(lab), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_module_prefix_stripped(ref):
    import torch

    torch.manual_seed(3)
    args = SimpleNamespace(k=8, binary=False)
    tm = ref.SV_DGCNN_CLS(args, num_class=10)
    sd = {
        "module." + k: v.detach().numpy() for k, v in tm.state_dict().items()
    }
    variables = convert_state_dict(sd, model="sv_dgcnn_cls")
    m = models.SV_DGCNN_CLS(num_classes=10, k=8)
    init_vars = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 3), jnp.float32)
    )
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing and not unexpected and not mismatched
