#!/bin/sh
# Usage: sh run_train.sh <DEVICE_ID> <LOG_DIR> <DATASET> <LABELED_LIST> <PRETRAIN_CKPT>
# Mirrors the reference run_train.sh (README.md:141-160).
#
# This paper-recipe launcher runs REFERENCE-EXACT step semantics (the
# teacher sees the full mixed batch and every scene gets a jittered
# GridConv pass, exactly like train.py:334-337 of the reference). The
# ~7% faster production configuration — identical per-box numerics, only
# train-mode BN batch composition differs — is run_train_fast.sh.
mkdir -p "$2"
python -m iou3dmatch_tpu.cli.train \
  --log_dir "$2" --dataset "$3" --labeled_sample_list "$4" \
  --detector_checkpoint "$5" --view_stats --reference_exact_step \
  2>&1 | tee -a "$2/log_train.txt"
