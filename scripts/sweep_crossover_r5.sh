#!/bin/bash
# Round-5 crossover re-measurement: the moment-form backward (round 4)
# changed every kernel's per-pair cost asymmetrically (flat gained ~10%),
# so the round-3 FLAT/RESIDENT thresholds need re-derivation (VERDICT
# round-4 "What's missing" item 3b).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/crossover_r5.log}
: > "$LOG"
for n in 8192 4096 2048; do
  for b in flat resident dense; do
    echo "=== splats=$n binning=$b tile_h=auto ===" | tee -a "$LOG"
    timeout 1800 python scripts/profile_step.py --image squirrel_cls.jpg \
      --splats $n --binning $b --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
  done
done
echo "=== mini splats=1024 binning=resident ===" | tee -a "$LOG"
timeout 1800 python scripts/profile_step.py --image squirrel_cls_mini.jpg \
  --splats 1024 --binning resident --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
echo "SWEEP DONE" | tee -a "$LOG"
