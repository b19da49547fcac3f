"""Data layer: dataset loaders (ModelNet40 / ShapeNetPart / ScanObjectNN /
S3DIS), host-side augmentations, and a simple batched loader that feeds
device arrays."""

from svnet_tpu.data.datasets import (
    ModelNet40,
    ShapeNetPart,
    ScanObjectNNCls,
    S3DIS,
    pc_normalize,
)
from svnet_tpu.data.augment import (
    translate_pointcloud,
    jitter_pointcloud,
    rotate_pointcloud_2d,
)
from svnet_tpu.data.loader import Loader
