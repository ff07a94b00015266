#!/bin/sh
# Usage: sh run_train_fast.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <PRETRAIN_CKPT>
# Production-throughput SSL launcher: bf16 mixed precision with
# REFERENCE-EXACT step semantics (the round-5 repaired headline config).
#
# The previous headline stacked bf16 with the pruned fast step; a 2x2
# ablation showed each approximation alone is statistically sign-balanced
# against the reference but the two compound to a measured accuracy
# deficit (reports/flagship.md §3). This launcher therefore takes ONE
# approximation only (bf16). For f32 paper-exact semantics use
# run_train.sh; the pruned step remains available via --fast_step (do not
# stack it with --bf16 for final training).
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --view_stats --bf16 \
  2>&1 | tee -a "$2/log_train.txt"
