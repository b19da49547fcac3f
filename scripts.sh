#!/usr/bin/env bash
# Example commands (counterpart of the reference's scripts.sh).
# Every run writes two logs to --save-dir: a timestamped verbose log and a
# fixed-name epoch summary (cls-log.txt / partseg-log.txt).

set -e

DATA=${DATA:-data}

############################ training ############################

# SVNet-PointNet, ModelNet40, full precision / binary
python -m svnet_tpu.cli.main_cls_pointnet --model svnet \
    --rot aligned --rot-test so3 --data-dir $DATA --save-dir results/sv_pn_fp
python -m svnet_tpu.cli.main_cls_pointnet --model svnet --binary \
    --rot aligned --rot-test so3 --data-dir $DATA --save-dir results/sv_pn_bin

# SVNet-DGCNN, ModelNet40 (the flagship), FP / binary / binary+KD
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet \
    --rot aligned --rot-test so3 --data-dir $DATA --save-dir results/sv_dg_fp
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary \
    --rot aligned --rot-test so3 --data-dir $DATA --save-dir results/sv_dg_bin
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary \
    --preload results/sv_dg_fp/save_models/model_best.ckpt --distill \
    --rot aligned --rot-test so3 --data-dir $DATA --save-dir results/sv_dg_kd

# ScanObjectNN (hard subset)
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary \
    --dataset scanobjectnn --subset hard --data-dir $DATA \
    --save-dir results/sv_dg_bin_sonn

# ShapeNetPart segmentation
python -m svnet_tpu.cli.main_partseg_dgcnn --model svnet --binary \
    --num-points 2048 --k 40 --data-dir $DATA --save-dir results/sv_dg_bin_seg
python -m svnet_tpu.cli.main_partseg_pointnet --model svnet \
    --num-points 2048 --k 40 --data-dir $DATA --save-dir results/sv_pn_fp_seg

# VN / original / BiPointNet baselines
python -m svnet_tpu.cli.main_cls_dgcnn --model vn --pooling mean \
    --data-dir $DATA --save-dir results/vn_dg
python -m svnet_tpu.cli.main_cls_pointnet --model original \
    --data-dir $DATA --save-dir results/pn
python -m svnet_tpu.cli.main_cls_pointnet --model bipointnet \
    --data-dir $DATA --save-dir results/bipn

# multi-chip data parallelism (batch sharded over a device mesh)
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary --dp 4 \
    --batch-size 128 --data-dir $DATA --save-dir results/sv_dg_bin_dp4

############################ evaluation ############################

python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary \
    --test results/sv_dg_bin/save_models/model_best.ckpt \
    --rot-test so3 --data-dir $DATA --save-dir results/eval

############################ analysis ############################

python -m svnet_tpu.utils.analysis --model svnet --backbone dgcnn --task cls
python -m svnet_tpu.utils.analysis --model svnet --backbone dgcnn --task cls --binary
python -m svnet_tpu.utils.analysis --model svnet --backbone dgcnn --task partseg --binary

############################ benchmark ############################

python bench.py                     # fused engine, exact gathers
python bench.py --fast              # bf16 gathers
python bench.py --engine flax       # pure-XLA reference path
