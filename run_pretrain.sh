#!/bin/sh
# Usage: sh run_pretrain.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST>
# Mirrors the reference run_pretrain.sh (README.md:125-140). DEVICE_ID is
# accepted for interface parity; device selection on TPU is via
# JAX_PLATFORMS / mesh config, not CUDA_VISIBLE_DEVICES.
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.pretrain \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  2>&1 | tee -a "$2/log_pretrain.txt"
