#!/bin/sh
# Trained-checkpoint certification of the serving knob ladder (ACCURACY.md
# r3.4): evaluates one checkpoint through the fused engine at each serving
# configuration and greps the IoU/acc lines. Usage:
#   sh tools/certify_serving.sh partseg /root/synth_pseg/runs/bin/save_models/model_best.ckpt /root/synth_pseg
#   sh tools/certify_serving.sh cls     /root/synth_v2/runs/bin/save_models/model_best.ckpt   /root/synth_v2
set -e
TASK=$1; CKPT=$2; DATA=$3
if [ "$TASK" = partseg ]; then
  DRIVER=svnet_tpu.cli.main_partseg_dgcnn; FOLD="--approx-fold 512"; K=40
else
  DRIVER=svnet_tpu.cli.main_cls_dgcnn; FOLD=""; K=20
fi
run() {
  echo "=== $*"
  python -m $DRIVER --model svnet --binary --data-dir "$DATA" \
    --save-dir /tmp/certify_$TASK --test "$CKPT" --fused "$@" 2>&1 \
    | grep -Ei "test.*(acc|iou)" | tail -2
}
run --engine-mode exact
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse spatial
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse spatial --reuse-k $((K / 2))
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse spatial --reuse-k $((K / 4))
