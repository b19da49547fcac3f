#!/bin/sh
# Round-4 training/certification queue (run serially on the chip).
# Stage 2 (after the FP A/B settles the teacher): KD cls, partseg FP+KD,
# certification ladders, evidence collection.
set -x
cd /root/repo
D=/root/synth_v2
P=/root/synth_pseg
TEACHER=$1   # path to the FP teacher ckpt

# KD cls (teacher-init, T=2, alpha=0.3 — the r3 recipe)
python -m svnet_tpu.cli.main_cls_dgcnn --model svnet --binary --rot z --rot-test so3 \
  --preload "$TEACHER" --distill --kd-t 2 --kd-alpha 0.3 \
  --epochs 100 --data-dir $D --save-dir $D/runs/kd100 > $D/runs/kd100.out 2>&1

# partseg FP teacher (fused FP path; honest re-estimated evals)
python -m svnet_tpu.cli.main_partseg_dgcnn --model svnet --rot z --rot-test so3 \
  --epochs 30 --bn-reestimate 60 --data-dir $P --save-dir $P/runs/fp > $P/runs/fp.out 2>&1

# partseg binary + KD from the FP teacher
python -m svnet_tpu.cli.main_partseg_dgcnn --model svnet --binary --rot z --rot-test so3 \
  --preload $P/runs/fp/save_models/model_best.ckpt --distill --kd-t 2 --kd-alpha 0.3 \
  --epochs 30 --data-dir $P --save-dir $P/runs/kd > $P/runs/kd.out 2>&1

echo R4_RUNS_DONE
