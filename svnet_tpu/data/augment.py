"""Host-side (numpy) per-cloud augmentations. ref data.py:165-183.

Rotation augmentation is NOT here: it happens batched on device inside the
jitted train step (svnet_tpu/ops/rotations.py), same as the reference's
train loop (main_cls_dgcnn.py:168-178).
"""

from __future__ import annotations

import numpy as np


def translate_pointcloud(pointcloud: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Anisotropic scale U(2/3, 3/2) + shift U(-0.2, 0.2). ref data.py:165-170."""
    xyz1 = rng.uniform(low=2.0 / 3.0, high=3.0 / 2.0, size=(3,))
    xyz2 = rng.uniform(low=-0.2, high=0.2, size=(3,))
    return (pointcloud * xyz1 + xyz2).astype("float32")


def jitter_pointcloud(
    pointcloud: np.ndarray,
    rng: np.random.Generator,
    sigma: float = 0.01,
    clip: float = 0.02,
) -> np.ndarray:
    """Gaussian jitter, clipped. ref data.py:173-176 (unused by mains)."""
    noise = np.clip(sigma * rng.standard_normal(pointcloud.shape), -clip, clip)
    return (pointcloud + noise).astype("float32")


def rotate_pointcloud_2d(pointcloud: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random rotation in the xz plane. ref data.py:179-183 (unused by mains)."""
    theta = 2 * np.pi * rng.uniform()
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    out = pointcloud.copy()
    out[:, [0, 2]] = out[:, [0, 2]] @ rot
    return out.astype("float32")
