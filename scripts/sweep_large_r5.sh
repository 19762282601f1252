#!/bin/bash
# Round-5 large-scale re-measurement: the separable moment reduction
# changed every kernel's backward cost; refresh the headline scale rows.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/large_r5.log}
: > "$LOG"

echo "=== batched B=2 10k flat (net-new row) ===" | tee -a "$LOG"
timeout 2400 python scripts/batched_at_scale.py --batch 2 --iters 100 \
  2>&1 | tee -a "$LOG"

echo "=== 1080p 100k flat (r4: 71.07 ms scan) ===" | tee -a "$LOG"
timeout 2400 python scripts/profile_step.py --size 1080x1920 \
  --splats 102400 --binning flat --scan 30 --iters 10 2>&1 | tee -a "$LOG"

echo "=== 1080p 1M flat sigma-init (r4: 469.2 ms, tile_h=64) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 1080x1920 \
  --splats 1048576 --binning flat --scan 6 --iters 3 2>&1 | tee -a "$LOG"

echo "=== 1080p 1M flat pixel-init (r4: 517.8 ms) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 1080x1920 \
  --splats 1048576 --binning flat --init-scale 1,2 --scan 6 --iters 3 \
  2>&1 | tee -a "$LOG"

echo "=== 4K 4M flat pixel-init (r4: 2537 ms) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 2160x3840 \
  --splats 4194304 --binning flat --init-scale 1,2 --scan 4 --iters 2 \
  2>&1 | tee -a "$LOG"

echo "SWEEP DONE" | tee -a "$LOG"
