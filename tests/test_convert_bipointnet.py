"""BiPointNet (LSR + ema-max) checkpoint conversion: logits parity vs torch.

N=1024 because the reference's ema-max offset table only covers
{1024, 2048, 4096}; torch BiLinearLSR scales are data-initialized on the
first forward, so the oracle runs once before export.
"""

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.utils.convert import check_structure, convert_state_dict

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

B, N = 2, 1024


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


def test_bipointnet_cls_parity(ref):
    import torch

    torch.manual_seed(0)
    tm = ref.BiPointNet_CLS(SimpleNamespace(k=20), num_class=40)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    pts = np.random.RandomState(0).randn(B, N, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        # first forward initializes the lazy LSR scales
        tm(torch.from_numpy(pts.transpose(0, 2, 1)))
        want, _ = tm(torch.from_numpy(pts.transpose(0, 2, 1)))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="bipointnet_cls")

    m = models.BiPointNet_CLS(num_classes=40)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got, _ = m.apply(variables, jnp.asarray(pts), False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-3
    )


def test_bipointnet_partseg_parity(ref):
    import torch

    torch.manual_seed(1)
    tm = ref.BiPointNet_PSEG(SimpleNamespace(k=20), num_part=50)
    tm.eval()
    with torch.no_grad():
        _randomize_bn(tm, torch)
    rs = np.random.RandomState(1)
    pts = rs.randn(B, N, 3).astype(np.float32) * 0.5
    lab = np.zeros((B, 16), dtype=np.float32)
    lab[:, 7] = 1.0
    with torch.no_grad():
        tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(lab[:, None, :]),
        )
        want, _ = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(lab[:, None, :]),
        )

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict(sd, model="bipointnet_partseg")

    m = models.BiPointNet_PSEG(num_part=50)
    init_vars = m.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(lab))
    missing, unexpected, mismatched = check_structure(variables, init_vars)
    assert not missing, missing
    assert not unexpected, unexpected
    assert not mismatched, mismatched

    got, _ = m.apply(variables, jnp.asarray(pts), jnp.asarray(lab), False)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 1), rtol=1e-3, atol=1e-3
    )
