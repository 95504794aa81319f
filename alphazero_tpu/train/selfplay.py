"""Self-play actor: batched noisy MCTS games producing training examples.

Reproduces the reference's ``execute_parallel_episodes`` contract
(/root/reference/src/parallel_trainer.py:137-223):

- N games advance in lockstep; every move runs a full search with root
  Dirichlet noise
- temperature 1 for the first ``temperature_threshold`` moves of each game,
  then 0 (argmax)
- actions are sampled from the visit-count distribution
- finished games emit (state_planes, visit_probs, wl) examples where wl is
  (win, loss) from the perspective of the player who moved
  (parallel_trainer.py:205-210)

TPU-first structure: each move is ONE compiled program (search + sampling +
env step fused); the host loop only orchestrates move boundaries and example
extraction. Finished games are frozen no-ops instead of being removed from
the batch (fixed shapes), and their moves are masked out of the dataset.

Deliberate divergence: the reference reuses the chosen child's subtree as
the next move's root (parallel_trainer.py:194-198); this implementation
searches each move from a fresh root. Re-rooting a slot-allocated batched
tree would cost a full-tree compaction per move, and fresh 400-simulation
searches are strictly MORE compute per move than reference reuse at equal
sim counts, so training-signal quality is matched or better. The parity
configs (BASELINE.json 1-2) test single searches and are unaffected.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.search import (
    SearchSpec,
    root_action_probs,
    root_value,
    search,
)


@functools.partial(
    jax.jit, static_argnames=("eval_fn", "spec", "temperature_threshold"))
def selfplay_move(
    states: env.EnvState,
    rng: jax.Array,
    eval_fn,
    spec: SearchSpec,
    temperature_threshold: int,
):
    """One lockstep move for a batch of games.

    Returns (new_states, planes, probs, actions, root_values): the encoded
    position before the move, the visit-count policy actually recorded as a
    training target, and the sampled action applied.
    """
    k_noise, k_sample = jax.random.split(rng)
    planes = env.encoded_state(states)

    tree = search(states, eval_fn, spec, rng=k_noise, add_noise=True)

    temp = jnp.where(states.move_count < temperature_threshold, 1.0, 0.0)
    probs = root_action_probs(tree, temp)

    # Sample like the reference (np.random.choice(p=probs), also at temp 0
    # where probs are one-hot — parallel_trainer.py:189). Finished games have
    # no legal actions; give them a dummy action (step() freezes them).
    safe = jnp.where(states.done[:, None],
                     jnp.ones_like(probs) / probs.shape[-1], probs)
    actions = jax.random.categorical(
        k_sample, jnp.log(jnp.maximum(safe, 1e-30)))
    new_states = env.step(states, actions.astype(jnp.int32))
    return new_states, planes, probs, actions, root_value(tree)


def selfplay_games(
    eval_fn,
    cfg: Config,
    rng: jax.Array,
    num_games: int | None = None,
    max_moves: int | None = None,
    mesh=None,
) -> Tuple[List[Tuple[np.ndarray, np.ndarray, np.ndarray]], dict]:
    """Play ``num_games`` lockstep self-play games to completion.

    Returns (examples, stats): examples are (planes (3,8,8) f32,
    probs (192,) f32, wl (2,) f32) tuples matching the reference's training
    example format; stats carries throughput counters.
    """
    num_games = num_games or cfg.parallel_games
    max_moves = max_moves or cfg.max_game_length
    spec = SearchSpec(
        num_simulations=cfg.num_simulations,
        num_actions=cfg.num_actions,
        c_puct=cfg.c_puct,
        dirichlet_alpha=cfg.dirichlet_alpha,
        dirichlet_epsilon=cfg.dirichlet_epsilon,
    )

    states = env.initial_state((num_games,))
    if mesh is not None and num_games % mesh.devices.size == 0:
        from alphazero_tpu.parallel.mesh import shard_batch

        states = shard_batch(mesh, states)
    # per-game move history: (planes, probs, turn)
    history: List[List[Tuple[np.ndarray, np.ndarray, int]]] = [
        [] for _ in range(num_games)
    ]
    examples: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    total_moves = 0
    total_sims = 0

    for _ in range(max_moves):
        active_before = ~np.asarray(states.done)
        if not active_before.any():
            break
        rng, k = jax.random.split(rng)
        states, planes, probs, actions, _ = selfplay_move(
            states, k, eval_fn, spec, cfg.temperature_threshold)

        planes_h = np.asarray(planes)
        probs_h = np.asarray(probs)
        turns_h = np.asarray(states.turn)  # already flipped; mover = -turn
        done_h = np.asarray(states.done)
        winner_h = np.asarray(states.winner)

        n_active = int(active_before.sum())
        total_moves += n_active
        total_sims += n_active * spec.num_simulations

        for i in np.flatnonzero(active_before):
            history[i].append((planes_h[i], probs_h[i], int(-turns_h[i])))
            if done_h[i]:
                w = 1.0 if winner_h[i] == env.WHITE else 0.0
                l = 1.0 - w
                for s, p, mover in history[i]:
                    wl = (np.array([w, l], np.float32) if mover == env.WHITE
                          else np.array([l, w], np.float32))
                    examples.append((s, p, wl))
                history[i] = []

    stats = {
        "games": num_games,
        "moves": total_moves,
        "simulations": total_sims,
        "examples": len(examples),
    }
    return examples, stats
