#!/bin/bash
# Waits for the TPU tunnel to come back, then launches the round-3 training
# resume (512 lanes x 2 self-play batches = 1024 games/iter, continuing the
# round-2 run copied to /root/run_r3). One TPU process at a time: this owns
# the chip until its --iterations budget completes. Logs to /root/run_r3/.
set -u
cd /root/repo
ITERS="${AZTPU_WD_ITERS:-10}"
LOG=/root/run_r3/train.log
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) TPU alive — launching ${ITERS}-iteration chunk" | tee -a "$LOG"
    break
  fi
  echo "$(date -u +%H:%M:%S) TPU still down, retrying in 120s" >> "$LOG"
  sleep 120
done
exec python main.py train --checkpoint-dir /root/run_r3/checkpoints \
  --games 512 --selfplay-batches 2 --iterations "$ITERS" >> "$LOG" 2>&1
