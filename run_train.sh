#!/bin/sh
# Usage: sh run_train.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <PRETRAIN_CKPT>
# Mirrors the reference run_train.sh (README.md:141-160).
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --view_stats \
  2>&1 | tee -a "$2/log_train.txt"
