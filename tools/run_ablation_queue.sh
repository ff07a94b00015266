#!/bin/bash
# Round-5 2x2 ablation queue (VERDICT r4 #1): trains the remaining corner
# runs back-to-back on the TPU so the chip never idles. Each run is
# resumable; re-running the script skips completed runs (metrics.json).
set -u
cd /root/repo
export PARITY_DEMO_OURS_PLATFORM=tpu
export PARITY_DEMO_CONF='{"pre_epochs":200,"ssl_epochs":30,"n_val":12}'

run () {
  variant=$1; seed=$2
  dir="_parity_demo_dense/ours_${variant}"
  [ "$seed" != 0 ] && dir="${dir}_s${seed}"
  if [ -f "$dir/metrics.json" ]; then
    echo "[queue] skip $variant s$seed (done)"; return
  fi
  echo "[queue] start $variant s$seed $(date +%H:%M:%S)"
  python tools/parity_demo.py --phase ours --variant "$variant" \
    --ours_seed "$seed" --root _parity_demo_dense \
    > "/tmp/${variant}_s${seed}.log" 2>&1
  echo "[queue] done  $variant s$seed rc=$? $(date +%H:%M:%S)"
}

for spec in "$@"; do
  run ${spec%:*} ${spec#*:}
done
echo "[queue] all done"
