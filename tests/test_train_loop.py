"""End-to-end driver tests on synthetic HDF5 datasets: the full CLI train
path (loaders -> jitted steps -> metrics -> checkpoints -> logging) and the
eval-only --test path."""

import os

import h5py
import numpy as np
import pytest

from svnet_tpu.cli.main_cls_pointnet import main as cls_pointnet_main
from svnet_tpu.cli.main_partseg_pointnet import main as pseg_pointnet_main

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    mn = root / "modelnet40_ply_hdf5_2048"
    mn.mkdir()
    for part, n in [("train", 32), ("test", 16)]:
        with h5py.File(mn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 128, 3)).astype("float32")
            f["label"] = rng.integers(0, 40, (n, 1)).astype("int64")

    sn = root / "shapenet_part_seg_hdf5_data"
    sn.mkdir()
    for part, n in [("train", 16), ("val", 8), ("test", 8)]:
        with h5py.File(sn / f"ply_data_{part}0.h5", "w") as f:
            f["data"] = rng.standard_normal((n, 128, 3)).astype("float32")
            label = rng.integers(0, 16, (n, 1)).astype("int64")
            f["label"] = label
            # parts within each category's own range
            from svnet_tpu.train.metrics import INDEX_START, SEG_NUM

            pid = np.zeros((n, 128), dtype="int64")
            for i in range(n):
                c = label[i, 0]
                pid[i] = rng.integers(
                    INDEX_START[c], INDEX_START[c] + SEG_NUM[c], 128
                )
            f["pid"] = pid
    return root


def test_cls_train_eval_roundtrip(synth_data, tmp_path):
    save = tmp_path / "results"
    common = [
        "--model", "svnet", "--binary", "--bn-reestimate", "2",
        "--epochs", "2", "--num-points", "64", "--batch-size", "8",
        "--k", "8", "--rot", "z", "--rot-test", "aligned",
        "--data-dir", str(synth_data), "--save-dir", str(save),
    ]
    acc = cls_pointnet_main(common)
    assert acc is not None and 0.0 <= acc <= 1.0

    model_dir = save / "save_models"
    assert (model_dir / "latest.txt").exists()
    assert (model_dir / "model_best.ckpt").exists()
    # only the newest periodic checkpoint retained
    assert (model_dir / "checkpoint_001.ckpt").exists()
    assert not (model_dir / "checkpoint_000.ckpt").exists()

    # eval-only --test path
    acc2 = cls_pointnet_main(common + ["--test", str(model_dir / "model_best.ckpt")])
    assert acc2 is not None and 0.0 <= acc2 <= 1.0

    # resume path restarts past the last epoch without error
    acc3 = cls_pointnet_main(common + ["--resume"])
    assert acc3 is not None


def test_cls_kd_distill(synth_data, tmp_path, capsys):
    """FP teacher -> binary student KD: teacher-shaped restore template +
    teacher-init of overlapping leaves (ref ships only KD checkpoint evals,
    /root/reference/scripts.sh:54-55; the train recipe is ours)."""
    teacher_dir = tmp_path / "teacher"
    common = [
        "--model", "svnet",
        "--epochs", "1", "--num-points", "64", "--batch-size", "8",
        "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
        "--data-dir", str(synth_data),
    ]
    acc_t = cls_pointnet_main(common + ["--save-dir", str(teacher_dir)])
    assert acc_t is not None
    t_ckpt = teacher_dir / "save_models" / "model_best.ckpt"

    student_dir = tmp_path / "student"
    acc_s = cls_pointnet_main(
        common
        + ["--binary", "--bn-reestimate", "2", "--save-dir", str(student_dir),
           "--preload", str(t_ckpt), "--distill",
           "--kd-t", "2", "--kd-alpha", "0.3"]
    )
    assert acc_s is not None and 0.0 <= acc_s <= 1.0
    # the shared cls-log logger is cached per-process on the first run's
    # dir; each run's own timestamped log is the per-run contract file
    log = "".join(
        f.read_text() for f in student_dir.glob("cls-*.txt")
    )
    assert "KD teacher loaded" in log
    assert "KD student initialized from teacher" in log
    # binary student auto-enables BN re-estimation before eval
    assert "BN re-estimation before eval" in log

    # --no-kd-init keeps the fresh student init
    student2 = tmp_path / "student2"
    cls_pointnet_main(
        common
        + ["--binary", "--bn-reestimate", "2", "--save-dir", str(student2),
           "--preload", str(t_ckpt), "--distill", "--no-kd-init"]
    )
    log2 = "".join(f.read_text() for f in student2.glob("cls-*.txt"))
    assert "KD teacher loaded" in log2
    assert "KD student initialized" not in log2


def test_partseg_kd_distill(synth_data, tmp_path):
    """Partseg KD path: binary student's tree has beta/scale leaves the FP
    teacher lacks — the restore template must be teacher-shaped."""
    teacher_dir = tmp_path / "t_seg"
    common = [
        "--model", "svnet",
        "--epochs", "1", "--num-points", "64", "--batch-size", "8",
        "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
        "--data-dir", str(synth_data),
    ]
    iou_t = pseg_pointnet_main(common + ["--save-dir", str(teacher_dir)])
    assert iou_t is not None
    t_ckpt = teacher_dir / "save_models" / "model_best.ckpt"

    student_dir = tmp_path / "s_seg"
    iou_s = pseg_pointnet_main(
        common
        + ["--binary", "--bn-reestimate", "2", "--save-dir", str(student_dir),
           "--preload", str(t_ckpt), "--distill"]
    )
    assert iou_s is not None and 0.0 <= iou_s <= 1.0
    log = "".join(
        f.read_text() for f in student_dir.glob("partseg-*.txt")
    )
    assert "KD student initialized from teacher" in log


def test_cls_checkinfo(synth_data, capsys):
    out = cls_pointnet_main(
        ["--model", "svnet", "--checkinfo", "--num-points", "64",
         "--data-dir", str(synth_data), "--save-dir", "/tmp/ci"]
    )
    assert out is None
    captured = capsys.readouterr().out
    assert "Number of Parameters" in captured


def test_partseg_train_eval(synth_data, tmp_path):
    save = tmp_path / "results_seg"
    iou = pseg_pointnet_main(
        [
            "--model", "svnet", "--binary", "--bn-reestimate", "2",
            "--epochs", "1", "--num-points", "64", "--batch-size", "8",
            "--k", "8", "--rot", "aligned", "--rot-test", "aligned",
            "--data-dir", str(synth_data), "--save-dir", str(save),
        ]
    )
    assert iou is not None and 0.0 <= iou <= 1.0
    assert (save / "save_models" / "model_best.ckpt").exists()
