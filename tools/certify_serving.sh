#!/bin/sh
# Trained-checkpoint certification of the serving knob ladder (ACCURACY.md
# r4): evaluates one checkpoint through the fused engine at each serving
# configuration, leg by leg, and greps the IoU/acc lines. Usage:
#   sh tools/certify_serving.sh partseg CKPT /root/synth_pseg
#   sh tools/certify_serving.sh cls     CKPT /root/synth_v2
set -e
TASK=$1; CKPT=$2; DATA=$3
case "$TASK" in
  partseg) DRIVER=svnet_tpu.cli.main_partseg_dgcnn; FOLD="--approx-fold 512"; K=40 ;;
  cls)     DRIVER=svnet_tpu.cli.main_cls_dgcnn;     FOLD="";                  K=20 ;;
  *) echo "usage: sh tools/certify_serving.sh {cls|partseg} CKPT DATADIR" >&2; exit 2 ;;
esac
if [ ! -e "$CKPT" ]; then echo "checkpoint not found: $CKPT" >&2; exit 2; fi
run() {
  echo "=== $*"
  # Run to a log first so a crashed eval aborts the certification (a bare
  # pipeline would let `set -e` see only the tail exit status).
  python -m $DRIVER --model svnet --binary --data-dir "$DATA" \
    --save-dir /tmp/certify_$TASK --test "$CKPT" --fused "$@" \
    > /tmp/certify_${TASK}_run.log 2>&1 || { cat /tmp/certify_${TASK}_run.log >&2; exit 1; }
  grep -Ei "test.*(acc|iou)" /tmp/certify_${TASK}_run.log | tail -2
}
run --engine-mode exact
run --engine-mode fast
run --engine-mode approx $FOLD
run --engine-mode approx $FOLD --approx-gather-bits 8
# unstacked graph-reuse legs (r5: per-knob attribution WITHOUT gb8 —
# VERDICT r4 weak #4 named the stacked-only ladder as confounded)
run --engine-mode approx $FOLD --graph-reuse conv2
run --engine-mode approx $FOLD --graph-reuse spatial
# stacked composition legs
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse conv2
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse spatial
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse conv2 --reuse-k $((K / 2))
run --engine-mode approx $FOLD --approx-gather-bits 8 --graph-reuse spatial --reuse-k $((K / 2))
