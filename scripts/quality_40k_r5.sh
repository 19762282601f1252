#!/bin/bash
# Round-5 capacity push: the 10 240-splat showcase is capacity-bound
# (BASELINE.md quality round 5 -- the decay tail asymptotes and the
# adaptive phase plateaus). Re-run the winning r5b schedule
# (densify-150 + reset-900, then two decay stages) at 4x capacity.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/quality_40k.log}
: > "$LOG"
OUT=runs/showcase_40k_r5
N=40960

echo "=== phase 1: 16000 adaptive iters, densify-150, reset-900 ===" | tee -a "$LOG"
timeout 4200 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats $N \
  --iters 16000 --densify-every 150 --optimize-opacity \
  --opacity-reset-every 900 --scan-chunk 50 --checkpoint-every 16000 \
  --log-every 2000 --out $OUT 2>&1 | tee -a "$LOG"

echo "=== phase 2: 4000 fine-tune iters, lr decay to 0.002 ===" | tee -a "$LOG"
timeout 1800 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats $N \
  --iters 4000 --resume --optimize-opacity --lr-decay-iters 19000 \
  --lr-final 0.002 --scan-chunk 50 --checkpoint-every 4000 \
  --log-every 1000 --out $OUT 2>&1 | tee -a "$LOG"

echo "=== phase 3: 3000 iters, decay to 0.0008 ===" | tee -a "$LOG"
timeout 1800 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats $N \
  --iters 3000 --resume --optimize-opacity --lr-decay-iters 22200 \
  --lr-final 0.0008 --scan-chunk 50 --checkpoint-every 3000 \
  --log-every 1000 --out $OUT 2>&1 | tee -a "$LOG"

echo "QUALITY 40K DONE" | tee -a "$LOG"
