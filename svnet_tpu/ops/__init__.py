"""Geometry / graph ops (TPU-native equivalents of reference models/utils/*)."""

from svnet_tpu.ops.knn import knn, pairwise_neg_sqdist
from svnet_tpu.ops.graph import (
    gather_neighbors,
    get_graph_feature,
    get_graph_feature_cross,
    get_graph_feature_sv,
    scalar_graph_feature,
    vn_graph_feature,
    svpool,
    svcat,
)
from svnet_tpu.ops.rotations import (
    random_rotations,
    random_z_rotations,
    rotate_points,
    apply_rotation_aug,
)

__all__ = [
    "knn",
    "pairwise_neg_sqdist",
    "gather_neighbors",
    "get_graph_feature",
    "get_graph_feature_cross",
    "get_graph_feature_sv",
    "scalar_graph_feature",
    "vn_graph_feature",
    "svpool",
    "svcat",
    "random_rotations",
    "random_z_rotations",
    "rotate_points",
    "apply_rotation_aug",
]
