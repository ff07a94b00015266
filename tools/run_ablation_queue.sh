#!/bin/bash
# Round-5 ablation/repair queue: trains parity-demo runs back-to-back on
# the TPU so the chip never idles. Each run is resumable; re-running the
# script skips completed runs (metrics.json present).
#   usage: run_ablation_queue.sh [variant:seed ...]
#   env:   Q_ROOT (default _parity_demo_dense), Q_DATASET (default scannet),
#          Q_CONF (PARITY_DEMO_CONF JSON override; default = dense schedule)
set -u
cd /root/repo
export PARITY_DEMO_OURS_PLATFORM=tpu
export PARITY_DEMO_CONF=${Q_CONF:-'{"pre_epochs":200,"ssl_epochs":30,"n_val":12}'}
ROOT=${Q_ROOT:-_parity_demo_dense}
DATASET=${Q_DATASET:-scannet}

run () {
  variant=$1; seed=$2
  dir="$ROOT/ours_${variant}"
  [ "$variant" = exact ] && dir="$ROOT/ours"
  [ "$seed" != 0 ] && dir="${dir}_s${seed}"
  if [ -f "$dir/metrics.json" ]; then
    echo "[queue] skip $variant s$seed (done)"; return
  fi
  echo "[queue] start $variant s$seed $(date +%H:%M:%S)"
  python tools/parity_demo.py --phase ours --dataset "$DATASET" \
    --variant "$variant" --ours_seed "$seed" --root "$ROOT" \
    > "/tmp/${DATASET}_${variant}_s${seed}.log" 2>&1
  echo "[queue] done  $variant s$seed rc=$? $(date +%H:%M:%S)"
}

for spec in "$@"; do
  run ${spec%:*} ${spec#*:}
done
echo "[queue] all done"
