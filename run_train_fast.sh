#!/bin/sh
# Usage: sh run_train_fast.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <PRETRAIN_CKPT>
# Production-throughput SSL launcher: bf16 mixed precision + the fast step
# (teacher on unlabeled scenes only, jittered GridConv on labeled scenes
# only — both prune compute whose outputs the reference provably discards;
# per-box numerics are identical, only train-mode BN batch statistics see a
# different scene subset; see PARITY.md "Step semantics" and
# train/steps.py::make_ssl_step). For paper-exact semantics use
# run_train.sh.
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --view_stats --bf16 \
  2>&1 | tee -a "$2/log_train.txt"
