#!/bin/sh
# Usage: sh run_eval_opt.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <CKPT> <OPT_RATE>
# Mirrors the reference run_eval_opt.sh: IoU-guided NMS + 10-step test-time
# IoU optimization (gradient ascent of predicted IoU w.r.t. center/size).
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --eval --use_iou_for_nms \
  --opt_step 10 --opt_rate "$6" \
  2>&1 | tee -a "$2/log_eval_opt.txt"
