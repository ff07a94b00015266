#!/bin/sh
# Usage: sh run_eval.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <CKPT>
# Mirrors the reference run_eval.sh: IoU-guided NMS enabled.
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --eval --use_iou_for_nms \
  2>&1 | tee -a "$2/log_eval.txt"
