#!/bin/bash
# Sidecar archiver for the round-5 training run (docs/run-2026-08-19-r5.md).
#
# Round 4's reset proved that even gitignored files inside /root/repo are
# destroyed — only COMMITTED content survives. This sidecar exports the
# newest completed iteration to artifacts/model_r5_latest.npz every 15 min
# (atomic tmp+mv, CPU-only so it never contends for the TPU) and snapshots
# metrics.jsonl; milestone commits make them durable.
#
#   nohup bash scripts/watch_r5.sh >> run_r5/watch.log 2>&1 &

set -u
REPO=/root/repo
CKPT=$REPO/run_r5/checkpoints
ART=$REPO/artifacts
mkdir -p "$ART"

while true; do
    latest=$(ls -d "$CKPT"/iteration_* 2>/dev/null | sed 's/.*iteration_//' |
             sort -n | tail -1)
    last=$(cat "$ART/.last_archived_r5" 2>/dev/null || echo "")
    if [ -n "$latest" ] && [ "$latest" != "$last" ]; then
        # np.savez appends ".npz" when missing — tmp name must end in .npz
        if python "$REPO/scripts/archive_model.py" export \
                "$CKPT/iteration_$latest" "$ART/model_r5_latest.tmp.npz"; then
            mv "$ART/model_r5_latest.tmp.npz" "$ART/model_r5_latest.npz"
            echo "$latest" > "$ART/.last_archived_r5"
            echo "$(date -u +%H:%M:%S) archived iteration_$latest"
        else
            rm -f "$ART/model_r5_latest.tmp.npz"
            echo "$(date -u +%H:%M:%S) export of iteration_$latest FAILED"
        fi
    fi
    [ -f "$CKPT/metrics.jsonl" ] && cp "$CKPT/metrics.jsonl" "$ART/metrics_r5.jsonl"
    sleep 900
done
