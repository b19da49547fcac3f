"""CLI driver with --dp 8 on the virtual 8-device CPU mesh."""

import h5py
import numpy as np
import pytest

from svnet_tpu.cli.main_cls_pointnet import main as cls_main

pytestmark = pytest.mark.slow  # minutes on this 1-CPU box


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_dp")
    rng = np.random.default_rng(0)
    mn = root / "modelnet40_ply_hdf5_2048"
    mn.mkdir()
    for part, n in [("train", 32), ("test", 16)]:
        with h5py.File(mn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 128, 3)).astype("float32")
            f["label"] = rng.integers(0, 40, (n, 1)).astype("int64")
    return root


def test_cls_train_dp8(synth_data, tmp_path):
    acc = cls_main(
        [
            "--model", "svnet", "--binary", "--dp", "8",
            "--bn-reestimate", "2",
            "--epochs", "1", "--num-points", "64", "--batch-size", "16",
            "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
            "--data-dir", str(synth_data), "--save-dir", str(tmp_path / "r"),
        ]
    )
    assert acc is not None and 0.0 <= acc <= 1.0


def test_cls_train_dp4_tp2(synth_data, tmp_path):
    """dp x tp mesh from the CLI (r4): wide kernels column-sharded on the
    'model' axis, batch on 'data', one full training epoch end to end."""
    acc = cls_main(
        [
            "--model", "svnet", "--binary", "--dp", "4", "--tp", "2",
            "--bn-reestimate", "2",
            "--epochs", "1", "--num-points", "64", "--batch-size", "16",
            "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
            "--data-dir", str(synth_data), "--save-dir", str(tmp_path / "r"),
        ]
    )
    assert acc is not None and 0.0 <= acc <= 1.0
