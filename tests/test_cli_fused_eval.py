"""--fused evaluation path: the CLI --test run through the Pallas engine
produces the same predictions as the flax eval path (exact mode)."""

import h5py
import numpy as np
import pytest

from svnet_tpu.cli.main_cls_dgcnn import main as cls_main
from svnet_tpu.cli.main_cls_pointnet import main as pn_main

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_fused")
    rng = np.random.default_rng(0)
    mn = root / "modelnet40_ply_hdf5_2048"
    mn.mkdir()
    for part, n in [("train", 32), ("test", 16)]:
        with h5py.File(mn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 128, 3)).astype("float32")
            f["label"] = rng.integers(0, 40, (n, 1)).astype("int64")
    return root


def test_fused_test_eval_matches(synth_data, tmp_path):
    save = tmp_path / "r"
    common = [
        "--model", "svnet", "--binary", "--bn-reestimate", "2",
        "--num-points", "64", "--batch-size", "8", "--k", "8",
        "--rot", "aligned", "--rot-test", "aligned",
        "--data-dir", str(synth_data), "--save-dir", str(save),
    ]
    cls_main(common + ["--epochs", "1"])
    ckpt = str(save / "save_models" / "model_best.ckpt")
    acc_plain = cls_main(common + ["--test", ckpt])
    acc_fused = cls_main(common + ["--test", ckpt, "--fused"])
    assert acc_plain == pytest.approx(acc_fused, abs=1e-9)


def test_fused_test_eval_pointnet_matches(synth_data, tmp_path):
    save = tmp_path / "rp"
    common = [
        "--model", "svnet", "--binary", "--bn-reestimate", "2",
        "--num-points", "64", "--batch-size", "8", "--k", "8",
        "--rot", "aligned", "--rot-test", "aligned",
        "--data-dir", str(synth_data), "--save-dir", str(save),
    ]
    pn_main(common + ["--epochs", "1"])
    ckpt = str(save / "save_models" / "model_best.ckpt")
    acc_plain = pn_main(common + ["--test", ckpt])
    acc_fused = pn_main(common + ["--test", ckpt, "--fused"])
    assert acc_plain == pytest.approx(acc_fused, abs=1e-9)
