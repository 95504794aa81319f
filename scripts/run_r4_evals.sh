#!/bin/bash
# Round-4 post-training eval campaign (docs/run-2026-08-18-r4.md queue).
# Run AFTER stopping the trainer (kill -9 $(cat run_r4/train.pid)) —
# one TPU process at a time. Logs land in docs/logs/r4/ (committed).
#
#   bash scripts/run_r4_evals.sh [arena_rounds] [anchor_games] [quant_pairs]

set -u
REPO=/root/repo
CKPT=$REPO/run_r4/checkpoints
LOGS=$REPO/docs/logs/r4
ROUNDS=${1:-30}
GAMES=${2:-20}
PAIRS=${3:-16}
mkdir -p "$LOGS"
cd "$REPO"

if ps aux | grep -v grep | grep -q "main.py train"; then
    echo "trainer still running — stop it first (one TPU process at a time)" >&2
    exit 1
fi

# Suspend the hang watchdog for the whole campaign (it would otherwise
# see the trainer pid gone and relaunch it mid-eval — two TPU processes).
touch "$REPO/run_r4/PAUSE"
trap 'rm -f "$REPO/run_r4/PAUSE"' EXIT

# 1. Arena over a checkpoint subset (every 8th + the last): dense ELO
#    coverage per chip-minute; writes arena_state.json + model_best.
ARENA=$REPO/run_r4/arena
mkdir -p "$ARENA"
last=$(ls -d "$CKPT"/iteration_* | sed 's/.*iteration_//' | sort -n | tail -1)
for n in $(seq 8 8 "$last") "$last"; do
    [ -e "$ARENA/iteration_$n" ] || cp -r "$CKPT/iteration_$n" "$ARENA/"
done
# int8 calibration reads training_data.npz next to the checkpoint
[ -e "$ARENA/training_data.npz" ] || \
    ln -s "$CKPT/training_data.npz" "$ARENA/training_data.npz"
echo "=== arena: $(ls -d "$ARENA"/iteration_* | wc -l) models, $ROUNDS rounds"
python main.py arena --checkpoint-dir "$ARENA" --rounds "$ROUNDS" \
    2>&1 | tee "$LOGS/arena.log"
cp "$ARENA/arena_state.json" "$LOGS/arena_state.json"

BEST=$ARENA/model_best
[ -e "$BEST" ] || BEST=$ARENA/iteration_$last
echo "=== best model: $BEST"

# 2. Reference-budget strength anchor: >=GAMES games vs the classical
#    engine at 2000 ms/move (reference web.py:213), 4 shared opening
#    plies so deterministic players don't replay one game.
python scripts/eval_vs_baseline.py "$BEST" "$GAMES" 2000 4 \
    2>&1 | tee "$LOGS/anchor2000.log"

# 3. int8 evidence on the trained model: speed probe + strength gate +
#    CPU accuracy table.
python scripts/probe_quant.py "$BEST" 2>&1 | tee "$LOGS/probe_quant.log"
python scripts/eval_quant_match.py "$BEST" "$PAIRS" \
    2>&1 | tee "$LOGS/quant_match.log"
python scripts/quant_accuracy.py "$BEST" "$CKPT/training_data.npz" \
    2>&1 | tee "$LOGS/quant_accuracy.log"

# 4. Durable final archive.
python scripts/archive_model.py export "$BEST" \
    "$REPO/artifacts/model_r4_best.npz"
cp "$CKPT/metrics.jsonl" "$REPO/artifacts/metrics_r4.jsonl"

echo "=== campaign done; review $LOGS, then flip bench default if the"
echo "    gate passed and run: python bench.py"
