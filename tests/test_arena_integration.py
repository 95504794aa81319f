"""run_arena() integration test (VERDICT round-1 weak #8 / next #9).

Drives the full arena round over two real tiny checkpoints in tmp_path:
discover -> select -> load -> play paired matches -> record ELO ->
model_best sync (reference contract /root/reference/src/arena.py:427-495).
"""

import os

import jax
import numpy as np

from alphazero_tpu.arena.elo import ArenaState
from alphazero_tpu.arena.runner import run_arena
from alphazero_tpu.config import tiny_config
from alphazero_tpu.train import Trainer


def test_run_arena_one_round(tmp_path):
    cfg = tiny_config(
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_blocks=1, num_filters=8,
        num_simulations=8, num_simulations_inference=8,
        max_game_length=160,
    )
    # two real checkpoints with different weights
    for it, seed in ((1, 0), (2, 99)):
        Trainer(cfg, seed=seed).save(it)
    assert os.path.isdir(cfg.checkpoint_path("iteration_1"))
    assert os.path.isdir(cfg.checkpoint_path("iteration_2"))

    run_arena(cfg, max_rounds=1, seed=7)

    state = ArenaState(cfg)   # re-load persisted JSON from disk
    # discovery registered both models and one match was recorded
    assert set(state.ratings) == {"iteration_1", "iteration_2"}
    assert len(state.matches) == 1
    m = state.matches[0]
    assert {m["model_a"], m["model_b"]} == {"iteration_1", "iteration_2"}
    games = m["wins_a"] + m["wins_b"]
    assert games == 4   # 2 paired openings x 2 colors (arena.py:471-479)
    assert state.get_match_count("iteration_1", "iteration_2") == 4

    # ratings moved off the initial value unless the match was drawn 2-2
    ra, rb = state.ratings["iteration_1"], state.ratings["iteration_2"]
    if m["wins_a"] != m["wins_b"]:
        assert ra != 1000.0 and rb != 1000.0
    assert np.isclose(ra + rb, 2000.0)   # ELO is zero-sum at equal priors

    # best-model pointer synced to a real checkpoint copy
    assert state.best_model in ("iteration_1", "iteration_2")
    assert os.path.isdir(cfg.checkpoint_path(cfg.best_model))
