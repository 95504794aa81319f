#!/bin/bash
# Hang watchdog for the round-5 trainer (docs/run-2026-08-19-r5.md).
#
# Same failure mode as round 4 (axon-tunnel stall: trainer futex-waits
# mid-iteration indefinitely). Iterations take ~200-280 s, so "no
# metrics.jsonl append for 16 min" is an unambiguous hang signature.
# Recovery is safe by design: resume is idempotent per-iteration
# (kill -9, relaunch the same command).
#
# Touch run_r5/PAUSE to suspend (e.g. for evals); remove it to re-arm.
# Set AZTPU_WATCHDOG_ITERS to the run's --iterations target and
# AZTPU_TRAIN_FLAGS to any extra trainer flags (e.g. --selfplay-quant
# static) so a restart reproduces the original command.
#
#   nohup bash scripts/watchdog_r5.sh >> run_r5/watchdog.log 2>&1 &

set -u
REPO=/root/repo
RUN=$REPO/run_r5
METRICS=$RUN/checkpoints/metrics.jsonl
STALL=960
ITERS=${AZTPU_WATCHDOG_ITERS:-200}
FLAGS=${AZTPU_TRAIN_FLAGS:-}

last_metrics_age() {
    [ -f "$METRICS" ] || { echo 0; return; }
    echo $(( $(date +%s) - $(stat -c %Y "$METRICS") ))
}

restart() {
    pid=$(cat "$RUN/train.pid" 2>/dev/null || echo "")
    [ -n "$pid" ] && kill -9 "$pid" 2>/dev/null
    sleep 5
    cd "$REPO"
    # shellcheck disable=SC2086
    setsid nohup python main.py train \
        --checkpoint-dir "$RUN/checkpoints" \
        --games 512 --selfplay-batches 2 --iterations "$ITERS" $FLAGS \
        >> "$RUN/train2.log" 2>&1 < /dev/null &
    sleep 10
    ps aux | grep -v grep | grep "main.py train" | awk '{print $2}' | \
        head -1 > "$RUN/train.pid"
    echo "$(date -u +%H:%M:%S) RESTARTED trainer pid $(cat "$RUN/train.pid")"
    # grace period so the resume (buffer reload + first iteration) lands
    sleep "$STALL"
}

done_iters() {
    ls -d "$RUN"/checkpoints/iteration_* 2>/dev/null | \
        sed 's/.*iteration_//' | sort -n | tail -1
}

while true; do
    sleep 60
    [ -f "$RUN/PAUSE" ] && continue
    # once the target iteration exists, a relaunched trainer resumes,
    # finds nothing to do, and stalls — stand down instead.
    latest=$(done_iters)
    if [ -n "$latest" ] && [ "$latest" -ge "$ITERS" ]; then
        echo "$(date -u +%H:%M:%S) training complete (iteration $latest >= $ITERS) — watchdog exiting"
        exit 0
    fi
    pid=$(cat "$RUN/train.pid" 2>/dev/null || echo "")
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
        echo "$(date -u +%H:%M:%S) trainer pid '$pid' gone"
        restart
        continue
    fi
    age=$(last_metrics_age)
    if [ "$age" -gt "$STALL" ]; then
        echo "$(date -u +%H:%M:%S) no iteration for ${age}s — hang, recycling"
        restart
    fi
done
