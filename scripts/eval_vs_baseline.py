"""Absolute strength anchor: trained AlphaZero vs the classical engine.

Plays N games (colors alternating) between a checkpoint (greedy
``num_simulations_inference``-sim search, no noise) and the baseline
alpha-beta engine at a fixed time budget, and reports the score.

    PYTHONPATH=. python scripts/eval_vs_baseline.py <checkpoint_dir> \
        [games] [baseline_ms] [opening_plies]

With ``opening_plies`` > 0, games run as color-swapped PAIRS sharing a
seeded random opening (the arena's protocol, reference arena.py:310-363;
pair 0 is the standard start) — de-correlating games that deterministic
players would otherwise repeat.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("AZTPU_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from alphazero_tpu.baseline import BitboardPosition, Search
from alphazero_tpu.config import Config
from alphazero_tpu.env import BLACK, WHITE, OracleGame
from alphazero_tpu.env.breakthrough import EnvState

ckpt_dir = sys.argv[1]
n_games = int(sys.argv[2]) if len(sys.argv) > 2 else 10
baseline_ms = int(sys.argv[3]) if len(sys.argv) > 3 else 500
opening_plies = int(sys.argv[4]) if len(sys.argv) > 4 else 0

cfg = Config(checkpoint_dir=ckpt_dir.rsplit("/", 1)[0] or ".")
name = ckpt_dir.rsplit("/", 1)[-1]

from alphazero_tpu.arena.runner import load_model_variables
from alphazero_tpu.search import (
    SearchSpec, make_net_evaluator, root_action_probs, search,
)

net, variables = load_model_variables(cfg, ckpt_dir)
eval_fn = make_net_evaluator(net, variables)
spec = SearchSpec(num_simulations=cfg.num_simulations_inference,
                  c_puct=cfg.c_puct)


@jax.jit
def az_move(states):
    tree = search(states, eval_fn, spec)
    return root_action_probs(tree, 0.0).argmax(-1)


def make_opening(pair: int) -> "OracleGame":
    if opening_plies == 0 or pair == 0:
        return OracleGame()
    import copy
    import random as _random

    from alphazero_tpu.arena.match import random_opening

    return random_opening(_random.Random(1000 + pair), opening_plies)


def play(az_is_white: bool, opening: "OracleGame"):
    import copy

    g = copy.deepcopy(opening)
    engine = Search(time_limit_ms=baseline_ms)
    import jax.numpy as jnp
    while not g.is_terminal() and g.move_count < 512:
        az_turn = (g.turn == WHITE) == az_is_white
        if az_turn:
            states = EnvState(
                board=jnp.asarray(g.board[None]),
                turn=jnp.asarray([g.turn], jnp.int8),
                winner=jnp.zeros((1,), jnp.int8),
                done=jnp.zeros((1,), bool),
                move_count=jnp.asarray([g.move_count], jnp.int32))
            a = int(np.asarray(az_move(states))[0])
            g.step_action(a)
        else:
            w = b = 0
            for r in range(8):
                for c in range(8):
                    v = g.board[r, c]
                    if v == WHITE:
                        w |= 1 << (r * 8 + c)
                    elif v == BLACK:
                        b |= 1 << (r * 8 + c)
            pos = BitboardPosition(w, b, g.turn)
            (frm, to), _, _ = engine.search(pos, time_ms=baseline_ms)
            g.step((frm // 8, frm % 8, to // 8, to % 8))
    wl = g.get_result()
    az_won = (wl[0] == 1.0) == az_is_white
    return az_won


wins = 0
t0 = time.time()
for i in range(n_games):
    az_white = i % 2 == 0
    opening = make_opening(i // 2)
    won = play(az_white, opening)
    wins += won
    tag = f"opening {i // 2}" if opening_plies else "standard start"
    print(f"game {i+1}/{n_games}: AZ as "
          f"{'White' if az_white else 'Black'} ({tag}) -> "
          f"{'WIN' if won else 'loss'}  (running {wins}/{i+1})", flush=True)

print(f"\n{name} ({cfg.num_simulations_inference} sims) vs baseline "
      f"({baseline_ms}ms, openings={opening_plies}): {wins}/{n_games} "
      f"({100*wins/n_games:.0f}%) in {time.time()-t0:.0f}s")
