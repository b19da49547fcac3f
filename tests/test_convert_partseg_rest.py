"""Converter parity for the remaining partseg families:
SV-PointNet, VN-DGCNN, VN-PointNet."""

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


def _randomize(tm, torch):
    g = torch.Generator().manual_seed(0)
    for m in tm.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.uniform_(-0.2, 0.2, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)
        # zero-init betas leave activations exactly on the sign() boundary in
        # an untrained net, where 1e-6 float noise flips bits — randomize as
        # training would
        if hasattr(m, "beta") and isinstance(m.beta, torch.nn.Parameter):
            m.beta.data.uniform_(-0.1, 0.1, generator=g)


def _run(tm, key, ours, pts, lab, torch, transpose_out=True):
    tm.eval()
    with torch.no_grad():
        _randomize(tm, torch)
        want = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(lab[:, None, :]),
        )
        if isinstance(want, tuple):
            want = want[0]
        want = want.numpy()
        if transpose_out:
            want = want.transpose(0, 2, 1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model=key)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(lab))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched
    got = ours.apply(variables, jnp.asarray(pts), jnp.asarray(lab), False)
    if isinstance(got, tuple):
        got = got[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def _inputs(seed):
    rs = np.random.RandomState(seed)
    pts = rs.randn(2, 48, 3).astype(np.float32) * 0.5
    lab = np.zeros((2, 16), dtype=np.float32)
    lab[:, seed % 16] = 1.0
    return pts, lab


@pytest.mark.parametrize("binary", [False, True])
def test_sv_pointnet_partseg_parity(ref, binary):
    import torch

    torch.manual_seed(4)
    tm = ref.SV_PointNet_PSEG(SimpleNamespace(k=8, binary=binary), num_part=50)
    pts, lab = _inputs(4)
    _run(tm, "sv_pointnet_partseg", models.SV_PointNet_PSEG(num_part=50, k=8, binary=binary), pts, lab, torch)


def test_vn_dgcnn_partseg_parity(ref):
    import torch

    torch.manual_seed(5)
    tm = ref.VN_DGCNN_PSEG(SimpleNamespace(k=8, pooling="mean"), num_part=50)
    pts, lab = _inputs(5)
    _run(tm, "vn_dgcnn_partseg", models.VN_DGCNN_PSEG(num_part=50, k=8, pooling="mean"), pts, lab, torch)


def test_vn_pointnet_partseg_parity(ref):
    import torch

    torch.manual_seed(6)
    tm = ref.VN_PointNet_PSEG(SimpleNamespace(k=8, pooling="mean"), num_part=50)
    pts, lab = _inputs(6)
    _run(tm, "vn_pointnet_partseg", models.VN_PointNet_PSEG(num_part=50, k=8, pooling="mean"), pts, lab, torch)
