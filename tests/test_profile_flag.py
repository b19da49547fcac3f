"""--profile-dir writes a jax.profiler trace during training."""

import os

import h5py
import numpy as np

from svnet_tpu.cli.main_cls_pointnet import main as cls_main


def test_profile_dir_written(tmp_path):
    root = tmp_path / "data"
    mn = root / "modelnet40_ply_hdf5_2048"
    mn.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for part, n in [("train", 32), ("test", 8)]:
        with h5py.File(mn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 64, 3)).astype("float32")
            f["label"] = rng.integers(0, 40, (n, 1)).astype("int64")

    prof = tmp_path / "trace"
    # --profile-dir wiring is model-agnostic; the original PointNet is the
    # cheapest compile on this 1-CPU box (the SV/binary variant spent ~3 min
    # of pure XLA compile here for identical flag coverage)
    cls_main(
        [
            "--model", "original", "--epochs", "1",
            "--num-points", "64", "--batch-size", "8", "--k", "8",
            "--rot", "aligned", "--rot-test", "aligned",
            "--data-dir", str(root), "--save-dir", str(tmp_path / "res"),
            "--profile-dir", str(prof), "--bn-reestimate", "0",
        ]
    )
    files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs
    ]
    assert files, "no profiler trace files written"
