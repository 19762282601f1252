#!/bin/bash
# Round-3 large-scale re-measurement on hardware: exact-ellipse culling cut
# the binned pair count at every scale; re-time the round-2 headline rows.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/large_r3.log}
: > "$LOG"

echo "=== 10k squirrel_cls flat (round-2: 8.65 ms scan) ===" | tee -a "$LOG"
timeout 1800 python scripts/profile_step.py --image squirrel_cls.jpg \
  --splats 10240 --binning flat --scan 200 --iters 30 2>&1 | tee -a "$LOG"

echo "=== 1080p 100k flat (round-2: 78.8 ms scan) ===" | tee -a "$LOG"
timeout 2400 python scripts/profile_step.py --size 1080x1920 \
  --splats 102400 --binning flat --scan 30 --iters 10 2>&1 | tee -a "$LOG"

echo "=== 1080p 1M flat sigma-init (round-2: 470 ms, tile_h=128) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 1080x1920 \
  --splats 1048576 --binning flat --scan 6 --iters 3 2>&1 | tee -a "$LOG"

echo "=== 1080p 1M flat pixel-init (round-2: 592 ms, tile_h=32) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 1080x1920 \
  --splats 1048576 --binning flat --init-scale 1,2 --scan 6 --iters 3 \
  2>&1 | tee -a "$LOG"

echo "=== 4K 4M flat pixel-init (round-2: 2.73 s, tile_h=32) ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_step.py --size 2160x3840 \
  --splats 4194304 --binning flat --init-scale 1,2 --scan 4 --iters 2 \
  2>&1 | tee -a "$LOG"

echo "SWEEP DONE" | tee -a "$LOG"
