#!/bin/bash
# Round-3 crossover re-measurement on hardware: exact-ellipse culling changed
# every pair count, and the new "window" layout enters the race at 8k.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/crossover_r3.log}
: > "$LOG"
for n in 8192 4096 2048; do
  for b in flat resident window dense; do
    echo "=== splats=$n binning=$b tile_h=auto ===" | tee -a "$LOG"
    timeout 1800 python scripts/profile_step.py --image squirrel_cls.jpg \
      --splats $n --binning $b --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
  done
done
for b in resident window; do
  echo "=== mini splats=1024 binning=$b tile_h=auto ===" | tee -a "$LOG"
  timeout 1800 python scripts/profile_step.py --image squirrel_cls_mini.jpg \
    --splats 1024 --binning $b --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
done
echo "SWEEP DONE" | tee -a "$LOG"
