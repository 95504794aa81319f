"""Batched model-vs-model matches.

The reference plays arena games one at a time, alternating two MCTS objects
(/root/reference/src/arena.py:231-363). TPU-native: all games of a match
run as ONE lockstep batch; each move runs a single batched search where a
per-game flag routes every leaf evaluation to the searching player's
network (both nets are evaluated in one fused forward and rows are
selected — cheaper than two half-batches and keeps one compiled program).

Match semantics preserved: greedy most-visited move, no Dirichlet noise,
``num_simulations_inference`` sims (arena.py:253-264), paired games from a
shared opening with colors swapped (arena.py:331-363), random 6-move
openings (arena.py:310-329).
"""

from __future__ import annotations

import functools
import random
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import OracleGame
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.models.network import policy_value_apply, wl_to_value
from alphazero_tpu.search import SearchSpec, root_action_probs, search

RANDOM_OPENING_MOVES = 6


def random_opening(rng: random.Random,
                   num_moves: int = RANDOM_OPENING_MOVES) -> OracleGame:
    """Random legal opening (reference arena.py:310-329)."""
    g = OracleGame()
    for _ in range(num_moves):
        if g.is_terminal():
            break
        moves = g.get_legal_actions()
        if not moves:
            break
        g.step_action(rng.choice(moves))
    return g


def make_pair_evaluator(net_a, vars_a, net_b, vars_b):
    """eval_fn(planes, a_to_move (B,) bool): evaluates both nets on the
    batch and selects rows — one compiled program, both models on MXU.
    The two models may have different architectures (reference loads each
    checkpoint with its own stored arch, arena.py:216-229)."""

    def eval_fn(planes, a_to_move):
        pa, va = policy_value_apply(net_a, vars_a, planes)
        pb, vb = policy_value_apply(net_b, vars_b, planes)
        sel = a_to_move[:, None]
        return (jnp.where(sel, pa, pb),
                jnp.where(a_to_move, va, vb))

    return eval_fn


@functools.partial(jax.jit, static_argnames=("eval_fn", "spec"))
def _match_move(states: env.EnvState, a_is_white: jax.Array, eval_fn,
                spec: SearchSpec) -> env.EnvState:
    """One greedy lockstep move for all games of a match."""
    a_to_move = jnp.where(states.turn == env.WHITE, a_is_white, ~a_is_white)
    tree = search(states, eval_fn, spec, eval_ctx=a_to_move)
    probs = root_action_probs(tree, 0.0)  # greedy most-visited
    actions = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    return env.step(states, actions)


def play_paired_matches(
    net_a,
    vars_a,
    net_b,
    vars_b,
    openings: List[OracleGame],
    cfg: Config,
    num_simulations: int | None = None,
    max_moves: int | None = None,
    pair_eval_fn=None,
) -> Tuple[int, int]:
    """Play each opening twice (colors swapped) in one lockstep batch.

    Returns (wins_a, wins_b). Game 2k: A as White; game 2k+1: B as White.
    ``pair_eval_fn(planes, a_to_move)`` overrides the default two-net
    evaluator — used to match different INFERENCE PATHS over the same
    weights (e.g. int8 vs bf16, scripts/eval_quant_match.py); nets/vars
    are ignored when it is given.
    """
    sims = num_simulations or cfg.num_simulations_inference
    spec = SearchSpec(num_simulations=sims, c_puct=cfg.c_puct,
                      fpu_reduction=cfg.fpu_reduction)
    max_moves = max_moves or cfg.max_game_length

    B = 2 * len(openings)
    boards = np.stack([g.board for g in openings for _ in range(2)])
    turns = np.asarray([g.turn for g in openings for _ in range(2)], np.int8)
    states = env.EnvState(
        board=jnp.asarray(boards, jnp.int8),
        turn=jnp.asarray(turns),
        winner=jnp.zeros((B,), jnp.int8),
        done=jnp.zeros((B,), jnp.bool_),
        move_count=jnp.zeros((B,), jnp.int32),
    )
    a_is_white = jnp.asarray([i % 2 == 0 for i in range(B)])

    eval_fn = pair_eval_fn or make_pair_evaluator(net_a, vars_a,
                                                  net_b, vars_b)
    for _ in range(max_moves):
        if bool(np.all(np.asarray(states.done))):
            break
        states = _match_move(states, a_is_white, eval_fn, spec)

    winners = np.asarray(states.winner)
    a_white = np.asarray(a_is_white)
    a_won = np.where(a_white, winners == env.WHITE, winners == env.BLACK)
    b_won = np.where(a_white, winners == env.BLACK, winners == env.WHITE)
    return int(a_won.sum()), int(b_won.sum())
