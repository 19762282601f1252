#!/bin/bash
# Dense/flat crossover sweep at the production tile height (tile_h=32).
# CLAUDE.md round-3 backlog: FLAT_THRESHOLD (8192) was measured at tile_h=8;
# re-measure the crossover now that 32-row tiles are the default.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/crossover_sweep.log}
: > "$LOG"
for n in 2048 4096 8192; do
  for b in dense flat resident; do
    echo "=== splats=$n binning=$b tile_h=auto(32) ===" | tee -a "$LOG"
    timeout 1800 python scripts/profile_step.py --image squirrel_cls.jpg \
      --splats $n --binning $b --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
  done
done
# mini at 1k: dense is the current default; check flat too.
for b in dense flat resident; do
  echo "=== mini splats=1024 binning=$b tile_h=auto(32) ===" | tee -a "$LOG"
  timeout 1800 python scripts/profile_step.py --image squirrel_cls_mini.jpg \
    --splats 1024 --binning $b --k -1 --scan 200 --iters 30 2>&1 | tee -a "$LOG"
done
echo "SWEEP DONE" | tee -a "$LOG"
