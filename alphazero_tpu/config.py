"""Central configuration.

One frozen (hashable) dataclass so configs can be jit static arguments.
Hyperparameter values reproduce the reference contract
(/root/reference/src/config.py:11-69): board geometry, net size, MCTS
constants, and the training schedule.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Config:
    # --- Game (Breakthrough) ---
    board_size: int = 8
    num_actions: int = 192          # 64 squares x 3 directions
    input_planes: int = 3           # mine / theirs / ones

    # --- Model ---
    num_blocks: int = 20
    num_filters: int = 128
    se_ratio: int = 8

    # --- MCTS ---
    num_simulations: int = 400
    num_simulations_inference: int = 200
    c_puct: float = 1.5
    fpu_reduction: float = 0.0      # FPU disabled: unvisited q = 0 (ref mcts.py:294-298)
    dirichlet_alpha: float = 0.35
    dirichlet_epsilon: float = 0.25
    temperature_threshold: int = 16  # tau=1 for the first N moves, then 0
    # Between-move tree reuse in self-play (reference
    # parallel_trainer.py:194-198 descends into the chosen child). Off by
    # default: fresh 400-sim searches per move are the benchmarked
    # configuration; flip on to reproduce the reference's reuse semantics
    # (doubles search-tree memory for subtree headroom).
    tree_reuse: bool = False

    # --- Training ---
    batch_size: int = 1024
    learning_rate: float = 1e-3
    lr_t_max: int = 200              # cosine period in learn() calls
    lr_eta_min: float = 1e-5
    weight_decay: float = 1e-4
    grad_clip_norm: float = 1.0
    parallel_games: int = 128
    selfplay_batches: int = 8
    buffer_size: int = 300_000
    training_epochs: int = 1

    # --- Self-play loop shape (TPU-specific; reference loops in Python) ---
    max_game_length: int = 512       # hard cap on moves per self-play game
    continuous_selfplay: bool = True  # auto-reset finished lanes (~2x games/hr)

    # --- Precision ---
    inference_dtype: str = "bfloat16"  # activations in search; params stay f32
    train_dtype: str = "float32"
    # Dtype of the fused Tree.rows (visits/values/priors/pointers).
    # CLOSED on-chip question (docs/value-dtype-closure.md): 16-bit trees
    # do NOT pay on TPU — Mosaic rejects float16 kernel operands outright,
    # and bfloat16 (which compiles) gained +0.6% while corrupting counters
    # past 256 visits. "float16" stays only for CPU numerics tests (exact
    # for integers <= 2048, i.e. <= 2047-slot trees) and raises at
    # init_tree on the TPU backend.
    value_dtype: str = "float32"

    # --- Self-play evaluator quantization (docs/quant-int8.md) ---
    # "off" (default): bf16 inference (inference_dtype). "static": int8
    # tower with activation scales calibrated per iteration on replay
    # samples (measured +56% sims/s on the v5e, the s8xs8->s32 MXU rate);
    # falls back to dynamic amax while the buffer is empty. "dynamic":
    # per-batch amax scales, no calibration. Training math is untouched —
    # this only changes the SELF-PLAY evaluator; adopt only with a passed
    # strength gate (scripts/eval_quant_match.py).
    selfplay_quant: str = "off"

    # --- Learn-phase data path ---
    # True (default): single-host learn() keeps the replay window resident
    # on device (re-uploaded once per buffer mutation) and runs each epoch
    # as ONE lax.scan program (learner.train_epoch) — removing the per-step
    # ~4 MB batch upload + dispatch latency that dominated learn wall-clock
    # on the tunneled TPU backend. False, or any multi-device/multi-host
    # run: the per-step host loop (train_step / sharded_train_step).
    device_replay: bool = True

    # --- Compile/runtime trade (docs/compile-latency.md) ---
    # True: residual tower as one nn.scan block -> 14x faster cold compile,
    # -5.8% search throughput. False (default): max throughput.
    scan_blocks: bool = False

    # --- Paths ---
    checkpoint_dir: str = "checkpoints"
    best_model: str = "model_best"
    data_file: str = "training_data.npz"
    arena_state: str = "arena_state.json"

    def checkpoint_path(self, filename: str) -> str:
        return os.path.join(self.checkpoint_dir, filename)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = Config()


def tiny_config(**kw) -> Config:
    """A small config for tests: 2-block/32-filter net, few sims."""
    base = dict(num_blocks=2, num_filters=32, num_simulations=16,
                parallel_games=8, batch_size=32, max_game_length=256)
    base.update(kw)
    return Config(**base)
