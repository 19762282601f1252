#!/bin/bash
# Round-5 quality push (VERDICT item 4): the showcase sat at 37.16 dB
# since round 3 while iteration cost fell; re-search the schedule at the
# same ~285 s wall budget (denser densification + longer decay tail).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/quality_r5.log}
: > "$LOG"
OUT=runs/showcase_10k_r5

echo "=== phase 1: 16000 adaptive iters, densify-250, opacity resets ===" | tee -a "$LOG"
timeout 3600 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats 10240 \
  --iters 16000 --densify-every 250 --optimize-opacity \
  --opacity-reset-every 1000 --scan-chunk 50 --checkpoint-every 16000 \
  --log-every 2000 --out $OUT 2>&1 | tee -a "$LOG"

echo "=== phase 2: 4000 fine-tune iters, lr decay to 0.002 ===" | tee -a "$LOG"
timeout 1800 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats 10240 \
  --iters 4000 --resume --optimize-opacity --lr-decay-iters 19000 \
  --lr-final 0.002 --scan-chunk 50 --checkpoint-every 4000 \
  --log-every 1000 --out $OUT 2>&1 | tee -a "$LOG"

echo "=== phase 3: 3000 iters, decay to 0.0008 ===" | tee -a "$LOG"
timeout 1800 python -m gs2d_tpu.fit assets/squirrel_cls.jpg --splats 10240 \
  --iters 3000 --resume --optimize-opacity --lr-decay-iters 22200 \
  --lr-final 0.0008 --scan-chunk 50 --checkpoint-every 3000 \
  --log-every 1000 --out $OUT 2>&1 | tee -a "$LOG"

echo "=== mini budget revisit: 1024 splats ===" | tee -a "$LOG"
timeout 2400 python -m gs2d_tpu.fit assets/squirrel_cls_mini.jpg \
  --splats 1024 --iters 12000 --densify-every 100 --optimize-opacity \
  --opacity-reset-every 1000 --scan-chunk 50 --checkpoint-every 12000 \
  --log-every 2000 --out runs/showcase_mini_r5 2>&1 | tee -a "$LOG"
timeout 1200 python -m gs2d_tpu.fit assets/squirrel_cls_mini.jpg \
  --splats 1024 --iters 2000 --resume --optimize-opacity \
  --lr-decay-iters 13500 --lr-final 0.003 --scan-chunk 50 \
  --log-every 500 --out runs/showcase_mini_r5 2>&1 | tee -a "$LOG"

echo "QUALITY DONE" | tee -a "$LOG"
