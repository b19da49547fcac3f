"""Pallas TPU kernels for the two ops XLA's defaults lose on (SURVEY.md §7):
the kNN graph build and the fused edge-SVBlock eval path."""

from svnet_tpu.ops.pallas.knn import knn_pallas
