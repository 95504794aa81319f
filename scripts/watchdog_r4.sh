#!/bin/bash
# Hang watchdog for the round-4 trainer (docs/run-2026-08-18-r4.md).
#
# 2026-08-19 04:20: the trainer sat futex-waiting for ~1h50m mid
# iteration 30 — an axon-tunnel stall, the same failure mode that wasted
# round-3 chip time. Iterations take 275+-15 s, so "no metrics.jsonl
# append for 16 min" is an unambiguous hang signature. Recovery is safe
# by design: resume is idempotent per-iteration (kill -9, relaunch the
# same command).
#
# Touch run_r4/PAUSE to suspend the watchdog (e.g. for the eval
# campaign); remove it to re-arm.
#
#   nohup bash scripts/watchdog_r4.sh >> run_r4/watchdog.log 2>&1 &

set -u
REPO=/root/repo
RUN=$REPO/run_r4
METRICS=$RUN/checkpoints/metrics.jsonl
STALL=960
ITERS=${AZTPU_WATCHDOG_ITERS:-100}

last_metrics_age() {
    [ -f "$METRICS" ] || { echo 0; return; }
    echo $(( $(date +%s) - $(stat -c %Y "$METRICS") ))
}

restart() {
    pid=$(cat "$RUN/train.pid" 2>/dev/null || echo "")
    [ -n "$pid" ] && kill -9 "$pid" 2>/dev/null
    sleep 5
    cd "$REPO"
    setsid nohup python main.py train \
        --checkpoint-dir "$RUN/checkpoints" \
        --games 512 --selfplay-batches 2 --iterations "$ITERS" \
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
    # round-4 lesson: once the target iteration exists, a relaunched
    # trainer resumes, finds nothing to do, and stalls — looping a
    # ~10-min TPU resume forever. Stand down instead.
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
