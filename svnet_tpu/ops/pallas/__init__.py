"""Pallas TPU kernels for the two ops XLA's defaults lose on (SURVEY.md §7):
the kNN graph build and the fused edge-SVBlock eval path."""

from svnet_tpu.ops.pallas.knn import knn_pallas
from svnet_tpu.ops.pallas.sv_edge import sv_edge_block, fold_svblock_params
from svnet_tpu.ops.pallas.sv_edge_first import sv_edge_first_block, fold_first_params
from svnet_tpu.ops.pallas.sv_round import sv_round, sv_round_first
from svnet_tpu.ops.pallas.sv_round2 import sv_round2, sv_round2_first
from svnet_tpu.ops.pallas.sv_point import sv_point_block, fold_point_params
from svnet_tpu.ops.pallas.sv_block_point import sv_block_point, fold_point_like_params
