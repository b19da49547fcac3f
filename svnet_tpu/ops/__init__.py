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
from svnet_tpu.ops.sampling import (
    square_distance,
    index_points,
    farthest_point_sample,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
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
    "square_distance",
    "index_points",
    "farthest_point_sample",
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
    "random_rotations",
    "random_z_rotations",
    "rotate_points",
    "apply_rotation_aug",
]
