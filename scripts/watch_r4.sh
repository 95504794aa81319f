#!/bin/bash
# Sidecar archiver for the round-4 training run (docs/run-2026-08-18-r4.md).
#
# Container resets have destroyed /root/run_* twice; only /root/repo
# survives. The run dir already lives inside the repo now — this sidecar
# adds a second layer: every 15 min it exports the newest COMPLETED
# iteration checkpoint to artifacts/model_r4_latest.npz (atomic tmp+mv,
# CPU-only so it never contends for the TPU) and snapshots metrics.jsonl,
# so even if the gitignored run dir is lost, the committed-tree-adjacent
# artifacts/ copy holds the latest weights + full training curve.
#
#   nohup bash scripts/watch_r4.sh >> run_r4/watch.log 2>&1 &

set -u
REPO=/root/repo
CKPT=$REPO/run_r4/checkpoints
ART=$REPO/artifacts
mkdir -p "$ART"

while true; do
    latest=$(ls -d "$CKPT"/iteration_* 2>/dev/null | sed 's/.*iteration_//' |
             sort -n | tail -1)
    last=$(cat "$ART/.last_archived_r4" 2>/dev/null || echo "")
    if [ -n "$latest" ] && [ "$latest" != "$last" ]; then
        # NOTE: np.savez appends ".npz" when missing — the tmp name must
        # already end in .npz or the mv below misses the real output
        if python "$REPO/scripts/archive_model.py" export \
                "$CKPT/iteration_$latest" "$ART/model_r4_latest.tmp.npz"; then
            mv "$ART/model_r4_latest.tmp.npz" "$ART/model_r4_latest.npz"
            echo "$latest" > "$ART/.last_archived_r4"
            echo "$(date -u +%H:%M:%S) archived iteration_$latest"
        else
            rm -f "$ART/model_r4_latest.tmp.npz"
            echo "$(date -u +%H:%M:%S) export of iteration_$latest FAILED"
        fi
    fi
    [ -f "$CKPT/metrics.jsonl" ] && cp "$CKPT/metrics.jsonl" "$ART/metrics_r4.jsonl"
    sleep 900
done
