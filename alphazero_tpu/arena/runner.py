"""Arena daemon: continuous matchmaking over iteration checkpoints.

Reference loop (/root/reference/src/arena.py:365-495): discover models,
score all pairs with S = p(1-p) / (1 + sqrt(N_games)) * exp(lambda*z_top),
epsilon-greedy over the top-5 at 15%, then play 2 standard-start paired
games + 2 random-opening paired games (one lockstep batch of 4 here),
record ELO, print the leaderboard.
"""

from __future__ import annotations

import math
import random
import time
from itertools import combinations
from typing import Optional, Tuple

import jax
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.arena.elo import ArenaState
from alphazero_tpu.arena.match import play_paired_matches, random_opening
from alphazero_tpu.env import OracleGame
from alphazero_tpu.models import init_network
from alphazero_tpu.train import checkpoint as ckpt
from alphazero_tpu.train.learner import create_train_state
from alphazero_tpu.utils import setup_logging

log = setup_logging()

EXPLORATION_RATE = 0.15
TOP_K = 5
BIAS_LAMBDA = 0.15


def select_matchup(state: ArenaState,
                   rng: Optional[random.Random] = None
                   ) -> Optional[Tuple[str, str, float]]:
    """Pick the most informative pair (reference arena.py:365-425)."""
    rng = rng or random
    models = list(state.ratings.keys())
    if len(models) < 2:
        return None

    ratings = list(state.ratings.values())
    mu, sigma = float(np.mean(ratings)), float(np.std(ratings))

    scored = []
    for a, b in combinations(models, 2):
        ra, rb = state.get_rating(a), state.get_rating(b)
        p = 1.0 / (1.0 + 10.0 ** ((rb - ra) / 400.0))
        variance = p * (1.0 - p)
        n = state.get_match_count(a, b)
        base = variance / (1.0 + math.sqrt(n))
        z_top = (max(ra, rb) - mu) / (sigma + 1e-9)
        scored.append((a, b, base * math.exp(BIAS_LAMBDA * z_top)))
    scored.sort(key=lambda x: x[2], reverse=True)

    if rng.random() < EXPLORATION_RATE and len(scored) >= TOP_K:
        return rng.choice(scored[:TOP_K])
    return scored[0]


def load_model_variables(cfg: Config, path: str):
    """Rebuild (net, variables) from a checkpoint, honoring the arch stored
    with it (reference arena.py:216-229). The returned net computes at
    cfg.inference_dtype (params stay f32)."""
    import jax.numpy as jnp

    arch = ckpt.checkpoint_arch(path)
    model_cfg = cfg.replace(
        num_blocks=arch["num_blocks"],
        num_filters=arch["num_filters"],
        se_ratio=arch.get("se_ratio", cfg.se_ratio),
        # param layout follows the checkpoint, not the live config
        # (pre-round-3 checkpoints never used the scanned tower)
        scan_blocks=arch.get("scan_blocks", False))
    net, variables = init_network(model_cfg, jax.random.PRNGKey(0))
    template = create_train_state(model_cfg, net, variables)
    state = ckpt.load_checkpoint(path, template)
    net = net.clone(dtype=jnp.dtype(cfg.inference_dtype))
    return net, {"params": state.params, "batch_stats": state.batch_stats}


def run_arena(cfg: Config, max_rounds: Optional[int] = None,
              seed: Optional[int] = None) -> None:
    state = ArenaState(cfg)
    rng = random.Random(seed)
    rounds = 0

    log.info("arena started: continuous matchmaking (ctrl-c to stop)")
    while max_rounds is None or rounds < max_rounds:
        state.discover_models()
        matchup = select_matchup(state, rng)
        if matchup is None:
            log.info("waiting for at least 2 models...")
            time.sleep(30)
            continue

        name_a, name_b, score = matchup
        log.info("MATCHMAKING %s vs %s (score %.5f)", name_a, name_b, score)

        net_a, vars_a = load_model_variables(
            cfg, cfg.checkpoint_path(name_a))
        net_b, vars_b = load_model_variables(cfg, cfg.checkpoint_path(name_b))

        openings = [OracleGame(), random_opening(rng)]
        wins_a, wins_b = play_paired_matches(net_a, vars_a, net_b, vars_b,
                                             openings, cfg)
        log.info("result: %s %d-%d %s", name_a, wins_a, wins_b, name_b)
        state.record_match(name_a, name_b, wins_a, wins_b)

        for rank, (name, rating) in enumerate(state.leaderboard()[:10], 1):
            marker = " *" if name == state.best_model else ""
            log.info("  %d. %s: %.0f%s", rank, name, rating, marker)
        rounds += 1
