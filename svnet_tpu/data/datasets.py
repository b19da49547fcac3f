"""Dataset loaders. Capability parity with reference data.py.

Each dataset is a simple indexable object (``__len__`` / ``__getitem__``)
over in-RAM numpy arrays loaded once from HDF5, with the reference's
per-item train-time augmentations. No torch dependency — batching and
shuffling live in svnet_tpu/data/loader.py.

Download helpers mirror data.py:23-68 (wget+unzip of the standard HDF5
packagings); they are no-ops when the data is already present.
"""

from __future__ import annotations

import glob
import os
import subprocess
from typing import Optional

import numpy as np

try:
    import h5py

    HAS_H5PY = True
except ImportError:  # pragma: no cover - h5py is present in this image
    HAS_H5PY = False


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center to the centroid and scale into the unit sphere. ref data.py:15-20."""
    pc = pc - pc.mean(axis=0)
    m = np.max(np.sqrt((pc**2).sum(axis=1)))
    return pc / m


_URLS = {
    "modelnet40": "https://shapenet.cs.stanford.edu/media/modelnet40_ply_hdf5_2048.zip",
    "shapenetpart": "https://shapenet.cs.stanford.edu/media/shapenet_part_seg_hdf5_data.zip",
    "s3dis": "https://shapenet.cs.stanford.edu/media/indoor3d_sem_seg_hdf5_data.zip",
}


def download(dataset: str, data_dir: str) -> None:
    """Fetch + unzip a dataset into data_dir if missing. ref data.py:23-68."""
    os.makedirs(data_dir, exist_ok=True)
    marker = {
        "modelnet40": "modelnet40_ply_hdf5_2048",
        "shapenetpart": "shapenet_part_seg_hdf5_data",
        "s3dis": "indoor3d_sem_seg_hdf5_data",
    }[dataset]
    if os.path.exists(os.path.join(data_dir, marker)):
        return
    url = _URLS[dataset]
    zip_name = os.path.basename(url)
    subprocess.run(
        ["wget", url, "--no-check-certificate", "-O", zip_name], check=True
    )
    subprocess.run(["unzip", "-q", zip_name, "-d", data_dir], check=True)
    os.remove(zip_name)


def _require_h5py():
    if not HAS_H5PY:
        raise RuntimeError(
            "h5py is required to load HDF5 datasets but is not installed"
        )


def load_data_cls(data_dir: str, partition: str):
    """Concatenate modelnet40*hdf5_2048/*{partition}*.h5. ref data.py:71-87."""
    _require_h5py()
    all_data, all_label = [], []
    pattern = os.path.join(data_dir, "modelnet40*hdf5_2048", f"*{partition}*.h5")
    for h5_name in sorted(glob.glob(pattern)):
        with h5py.File(h5_name, "r") as f:
            all_data.append(f["data"][:].astype("float32"))
            all_label.append(f["label"][:].astype("int64"))
    if not all_data:
        raise FileNotFoundError(f"no ModelNet40 h5 files match {pattern}")
    return np.concatenate(all_data), np.concatenate(all_label)


def load_data_partseg(data_dir: str, partition: str):
    """ShapeNetPart HDF5 (data/label/pid). ref data.py:90-115."""
    _require_h5py()
    if partition == "trainval":
        files = sorted(
            glob.glob(os.path.join(data_dir, "shapenet*hdf5*", "*train*.h5"))
        ) + sorted(glob.glob(os.path.join(data_dir, "shapenet*hdf5*", "*val*.h5")))
    else:
        files = sorted(
            glob.glob(os.path.join(data_dir, "shapenet*hdf5*", f"*{partition}*.h5"))
        )
    if not files:
        raise FileNotFoundError(f"no ShapeNetPart h5 files in {data_dir}")
    all_data, all_label, all_seg = [], [], []
    for h5_name in files:
        with h5py.File(h5_name, "r") as f:
            all_data.append(f["data"][:].astype("float32"))
            all_label.append(f["label"][:].astype("int64"))
            all_seg.append(f["pid"][:].astype("int64"))
    return (
        np.concatenate(all_data),
        np.concatenate(all_label),
        np.concatenate(all_seg),
    )


class ModelNet40:
    """ref data.py:186-201. Item: (points (num_points, 3) f32, label int)."""

    num_classes = 40

    def __init__(
        self,
        num_points: int,
        data_dir: str,
        partition: str = "train",
        seed: int = 0,
        **kwargs,
    ):
        self.data, self.label = load_data_cls(data_dir, partition)
        self.label = self.label.reshape(-1)
        self.num_points = num_points
        self.partition = partition
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item):
        from svnet_tpu.data.augment import translate_pointcloud

        pointcloud = self.data[item][: self.num_points]
        label = int(self.label[item])
        if self.partition == "train":
            pointcloud = translate_pointcloud(pointcloud, self.rng)
            pointcloud = pointcloud[self.rng.permutation(pointcloud.shape[0])]
        return pointcloud, label


class ModelNet40_v2:
    """Raw-txt ModelNet40 variant with per-item cache + pc_normalize.

    ref data.py:203-256 — and fixes its latent NameError: ``uniform=True``
    actually works here (farthest_point_sample is imported).
    """

    num_classes = 40

    def __init__(
        self,
        data_dir: str,
        num_points: int = 1024,
        partition: str = "train",
        uniform: bool = False,
        normal_channel: bool = False,
        cache_size: int = 15000,
    ):
        assert partition in ("train", "test")
        self.root = data_dir
        self.npoints = num_points
        self.uniform = uniform
        self.normal_channel = normal_channel
        catfile = os.path.join(self.root, "modelnet40_shape_names.txt")
        self.cat = [line.rstrip() for line in open(catfile)]
        self.classes = dict(zip(self.cat, range(len(self.cat))))
        ids = [
            line.rstrip()
            for line in open(
                os.path.join(self.root, f"modelnet40_{partition}.txt")
            )
        ]
        names = ["_".join(x.split("_")[0:-1]) for x in ids]
        self.datapath = [
            (names[i], os.path.join(self.root, names[i], ids[i]) + ".txt")
            for i in range(len(ids))
        ]
        self.cache_size = cache_size
        self.cache: dict = {}

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, index):
        if index in self.cache:
            return self.cache[index]
        name, path = self.datapath[index]
        cls = self.classes[name]
        pts = np.loadtxt(path, delimiter=",").astype(np.float32)
        if self.uniform:
            import jax.numpy as jnp

            from svnet_tpu.ops.sampling import farthest_point_sample

            idx = np.asarray(
                farthest_point_sample(jnp.asarray(pts[None, :, :3]), self.npoints)
            )[0]
            pts = pts[idx]
        else:
            pts = pts[: self.npoints]
        pts[:, 0:3] = pc_normalize(pts[:, 0:3])
        if not self.normal_channel:
            pts = pts[:, 0:3]
        item = (pts, int(cls))
        if len(self.cache) < self.cache_size:
            self.cache[index] = item
        return item


class ShapeNetPart:
    """ref data.py:260-297. Item: (points, category label, per-point seg)."""

    num_classes = 16
    num_parts = 50
    cat2id = {
        "airplane": 0, "bag": 1, "cap": 2, "car": 3, "chair": 4,
        "earphone": 5, "guitar": 6, "knife": 7, "lamp": 8, "laptop": 9,
        "motor": 10, "mug": 11, "pistol": 12, "rocket": 13,
        "skateboard": 14, "table": 15,
    }
    seg_num = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
    index_start = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]

    def __init__(
        self,
        num_points: int,
        data_dir: str,
        partition: str = "train",
        class_choice: Optional[str] = None,
        seed: int = 0,
    ):
        self.data, self.label, self.seg = load_data_partseg(data_dir, partition)
        self.label = self.label.reshape(-1)
        self.num_points = num_points
        self.partition = partition
        self.class_choice = class_choice
        self.rng = np.random.default_rng(seed)

        if class_choice is not None:
            cid = self.cat2id[class_choice]
            idx = (self.label == cid).squeeze()
            self.data, self.label, self.seg = (
                self.data[idx],
                self.label[idx],
                self.seg[idx],
            )
            self.seg_num_all = self.seg_num[cid]
            self.seg_start_index = self.index_start[cid]
        else:
            self.seg_num_all = 50
            self.seg_start_index = 0

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item):
        pointcloud = self.data[item][: self.num_points]
        label = int(self.label[item])
        seg = self.seg[item][: self.num_points]
        if self.partition == "trainval":
            idx = self.rng.permutation(pointcloud.shape[0])
            pointcloud, seg = pointcloud[idx], seg[idx]
        return pointcloud, label, seg


class ScanObjectNNCls:
    """ref data.py:299-340. subset 'easy' = main_split objectdataset,
    'hard' = augmentedrot_scale75."""

    num_classes = 15

    def __init__(
        self,
        num_points: int,
        data_dir: str,
        partition: str = "train",
        subset: str = "easy",
        seed: int = 0,
    ):
        _require_h5py()
        names = {
            ("train", "easy"): "training_objectdataset.h5",
            ("train", "hard"): "training_objectdataset_augmentedrot_scale75.h5",
            ("test", "easy"): "test_objectdataset.h5",
            ("test", "hard"): "test_objectdataset_augmentedrot_scale75.h5",
        }
        try:
            fname = names[(partition, subset)]
        except KeyError:
            raise ValueError(
                f"unrecognized partition/subset {partition!r}/{subset!r}"
            ) from None
        path = os.path.join(data_dir, "h5_files", "main_split", fname)
        with h5py.File(path, "r") as h5:
            self.points = np.array(h5["data"]).astype("float32")
            self.labels = np.array(h5["label"]).astype("int64")
        self.num_points = num_points
        self.partition = partition
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.points.shape[0]

    def __getitem__(self, idx):
        from svnet_tpu.data.augment import translate_pointcloud

        # random point subsample each epoch (ref data.py:328-332)
        pt_idxs = self.rng.permutation(self.points.shape[1])[: self.num_points]
        pointcloud = self.points[idx, pt_idxs].copy()
        if self.partition == "train":
            pointcloud = translate_pointcloud(pointcloud, self.rng)
        return pointcloud, int(self.labels[idx])


class S3DIS:
    """Semantic segmentation rooms with Area-based split. ref data.py:342-360
    (unused by the reference mains; kept for capability parity)."""

    num_classes = 13

    def __init__(
        self,
        num_points: int = 4096,
        data_dir: str = "data",
        partition: str = "train",
        test_area: str = "1",
        seed: int = 0,
    ):
        _require_h5py()
        d = os.path.join(data_dir, "indoor3d_sem_seg_hdf5_data")
        with open(os.path.join(d, "all_files.txt")) as f:
            all_files = [line.rstrip() for line in f]
        with open(os.path.join(d, "room_filelist.txt")) as f:
            rooms = [line.rstrip() for line in f]
        data_list, label_list = [], []
        for fpath in all_files:
            with h5py.File(os.path.join(data_dir, fpath), "r") as f:
                data_list.append(f["data"][:])
                label_list.append(f["label"][:])
        data = np.concatenate(data_list, 0)
        seg = np.concatenate(label_list, 0)
        area = f"Area_{test_area}"
        test_idx = [i for i, r in enumerate(rooms) if area in r]
        train_idx = [i for i, r in enumerate(rooms) if area not in r]
        idx = train_idx if partition == "train" else test_idx
        self.data, self.seg = data[idx], seg[idx]
        self.num_points = num_points
        self.partition = partition
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item):
        pointcloud = self.data[item][: self.num_points]
        seg = self.seg[item][: self.num_points]
        if self.partition == "train":
            idx = self.rng.permutation(pointcloud.shape[0])
            pointcloud, seg = pointcloud[idx], seg[idx]
        return pointcloud, seg.astype("int64")
