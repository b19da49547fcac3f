"""S3DIS semantic-segmentation driver end-to-end on synthetic data."""

import os

import h5py
import numpy as np
import pytest

from svnet_tpu.cli.main_semseg import main as semseg_main

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU


@pytest.fixture(scope="module")
def synth_s3dis(tmp_path_factory):
    root = tmp_path_factory.mktemp("s3dis")
    d = root / "indoor3d_sem_seg_hdf5_data"
    d.mkdir()
    rng = np.random.default_rng(0)
    rooms = 12
    with h5py.File(d / "ply_data_all_0.h5", "w") as f:
        f["data"] = rng.standard_normal((rooms, 128, 9)).astype("float32")
        f["label"] = rng.integers(0, 13, (rooms, 128)).astype("uint8")
    (d / "all_files.txt").write_text("indoor3d_sem_seg_hdf5_data/ply_data_all_0.h5\n")
    names = [f"Area_{1 + (i % 6)}_room{i}" for i in range(rooms)]
    (d / "room_filelist.txt").write_text("\n".join(names) + "\n")
    return root


def test_semseg_train_eval(synth_s3dis, tmp_path):
    save = tmp_path / "res"
    common = [
        "--epochs", "1", "--num-points", "128", "--batch-size", "4",
        "--test-area", "5",
        "--data-dir", str(synth_s3dis), "--save-dir", str(save),
    ]
    acc = semseg_main(common)
    assert acc is not None and 0.0 <= acc <= 1.0
    ckpt = save / "save_models" / "model_best.ckpt"
    assert ckpt.exists()
    miou = semseg_main(common + ["--test", str(ckpt)])
    assert 0.0 <= miou <= 1.0
