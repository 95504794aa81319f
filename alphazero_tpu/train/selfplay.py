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

Between-move tree reuse (reference parallel_trainer.py:194-198) is
supported via ``Config.tree_reuse``: searches carry the chosen child's
subtree to the next move through ``advance_root`` (a once-per-move
compaction; see search/mcts.py). Default is OFF — fresh 400-simulation
searches per move: reuse semantics are pinned by parity tests against the
imported reference MCTS (tests/test_tree_reuse.py), and the fresh-vs-reuse
choice is a measured trade (docs/treereuse-ablation.md), not an assertion.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.search import (
    SearchSpec,
    Tree,
    advance_root,
    init_tree,
    root_action_probs,
    root_value,
    search,
)


def _searched_move(states, tree, rng, eval_fn, spec, temperature_threshold):
    """Search + sample + step core shared by all move variants. ``tree``
    is an existing tree rooted at ``states`` (reuse) or None (fresh)."""
    k_noise, k_sample = jax.random.split(rng)
    planes = env.encoded_state(states)

    tree = search(states, eval_fn, spec, rng=k_noise, add_noise=True,
                  tree=tree)

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
    return tree, planes, probs, actions, new_states


@functools.partial(
    jax.jit, static_argnames=("eval_fn", "spec", "temperature_threshold"))
def selfplay_move(
    states: env.EnvState,
    rng: jax.Array,
    eval_fn,
    spec: SearchSpec,
    temperature_threshold: int,
):
    """One lockstep move for a batch of games (fresh root per move).

    Returns (new_states, planes, probs, actions, root_values): the encoded
    position before the move, the visit-count policy actually recorded as a
    training target, and the sampled action applied.
    """
    tree, planes, probs, actions, new_states = _searched_move(
        states, None, rng, eval_fn, spec, temperature_threshold)
    return new_states, planes, probs, actions, root_value(tree)


@functools.partial(
    jax.jit, static_argnames=("eval_fn", "spec", "temperature_threshold"))
def selfplay_move_tree(
    states: env.EnvState,
    tree: Tree,
    rng: jax.Array,
    eval_fn,
    spec: SearchSpec,
    temperature_threshold: int,
):
    """One lockstep move WITH between-move tree reuse (reference
    parallel_trainer.py:194-198): searches the given tree (rooted at
    ``states``), then re-roots it at the chosen child for the next move.
    Returns (new_states, planes, probs, actions, root_values, new_tree)."""
    stree, planes, probs, actions, new_states = _searched_move(
        states, tree, rng, eval_fn, spec, temperature_threshold)
    values = root_value(stree)
    new_tree = advance_root(stree, actions.astype(jnp.int32), new_states,
                            spec)
    return new_states, planes, probs, actions, values, new_tree



def _initial_tree(states, spec: SearchSpec, mesh=None):
    """Fresh search tree for reuse mode (None when reuse is off)."""
    if not spec.tree_reuse:
        return None
    tree = init_tree(states, spec)
    if mesh is not None and states.turn.shape[0] % mesh.devices.size == 0:
        from alphazero_tpu.parallel.mesh import shard_batch

        tree = shard_batch(mesh, tree)
    return tree


def _emit_examples(planes_all, probs_all, mover_all, m_idx, g_idx, winners):
    """(state, pi, WL-from-mover) examples for the selected (move, game)
    pairs (reference parallel_trainer.py:205-210)."""
    white_won = (winners == env.WHITE).astype(np.float32)
    mover_is_white = (mover_all[m_idx, g_idx] == env.WHITE)
    win = np.where(mover_is_white, white_won, 1.0 - white_won)
    wls = np.stack([win, 1.0 - win], axis=-1).astype(np.float32)
    sel_planes = planes_all[m_idx, g_idx]
    sel_probs = probs_all[m_idx, g_idx]
    return [(sel_planes[j], sel_probs[j], wls[j]) for j in range(len(m_idx))]


def selfplay_games(
    eval_fn,
    cfg: Config,
    rng: jax.Array,
    num_games: int | None = None,
    max_moves: int | None = None,
    mesh=None,
) -> Tuple[List[Tuple[np.ndarray, np.ndarray, np.ndarray]], dict]:
    """Play ``num_games`` lockstep self-play games to completion.

    Returns (examples, stats): examples are (planes (3,8,8) uint8 0/1,
    probs (192,) f32, wl (2,) f32) tuples matching the reference's training
    example format (planes travel/store as uint8; consumers cast to f32);
    stats carries throughput counters.
    """
    num_games = num_games or cfg.parallel_games
    max_moves = max_moves or cfg.max_game_length
    spec = SearchSpec(
        num_simulations=cfg.num_simulations,
        num_actions=cfg.num_actions,
        c_puct=cfg.c_puct,
        fpu_reduction=cfg.fpu_reduction,
        tree_reuse=cfg.tree_reuse,
        dirichlet_alpha=cfg.dirichlet_alpha,
        dirichlet_epsilon=cfg.dirichlet_epsilon,
        value_dtype=jnp.dtype(cfg.value_dtype),
    )

    states = env.initial_state((num_games,))
    if mesh is not None and num_games % mesh.devices.size == 0:
        from alphazero_tpu.parallel.mesh import shard_batch

        states = shard_batch(mesh, states)
    tree = _initial_tree(states, spec, mesh)

    # Device-side episode recording: per-move outputs stay on device and the
    # host only syncs a done-flag every CHECK_EVERY moves, so move k+1
    # dispatches while move k executes (a per-move np.asarray stalls the
    # pipeline on every move — measured ~2x slower end-to-end). All
    # transfers and the (state, pi, WL) example extraction happen once at
    # the end, fully vectorized.
    CHECK_EVERY = 8
    rec_planes: List[jax.Array] = []
    rec_probs: List[jax.Array] = []
    rec_mover: List[jax.Array] = []
    rec_active: List[jax.Array] = []

    moves_played = 0
    for m in range(max_moves):
        pre_turn = states.turn
        pre_active = ~states.done
        rng, k = jax.random.split(rng)
        if spec.tree_reuse:
            states, planes, probs, actions, _, tree = selfplay_move_tree(
                states, tree, k, eval_fn, spec, cfg.temperature_threshold)
        else:
            states, planes, probs, actions, _ = selfplay_move(
                states, k, eval_fn, spec, cfg.temperature_threshold)
        rec_planes.append(planes)
        rec_probs.append(probs)
        rec_mover.append(pre_turn)
        rec_active.append(pre_active)
        moves_played = m + 1
        if (m + 1) % CHECK_EVERY == 0 and bool(np.asarray(states.done).all()):
            break

    # one bulk transfer of the whole episode batch; planes are 0/1 so they
    # travel as uint8 (4x fewer bytes over the tunneled device link — the
    # replay buffer and npz store uint8 anyway)
    planes_all = np.asarray(
        jnp.stack(rec_planes).astype(jnp.uint8))        # (M, B, 3, 8, 8)
    probs_all = np.asarray(jnp.stack(rec_probs))        # (M, B, A)
    mover_all = np.asarray(jnp.stack(rec_mover))        # (M, B)
    active_all = np.asarray(jnp.stack(rec_active))      # (M, B)
    winner = np.asarray(states.winner)                  # (B,)
    finished = np.asarray(states.done)                  # (B,)

    # Emit (state, pi, WL-from-mover) for every move of every FINISHED game
    # (the reference discards unfinished histories, parallel_trainer.py:201).
    emit = active_all & finished[None, :]               # (M, B)
    m_idx, g_idx = np.nonzero(emit)
    examples = _emit_examples(planes_all, probs_all, mover_all,
                              m_idx, g_idx, winner[g_idx])

    stats = {
        "games": int(finished.sum()),                   # completed games
        "moves": int(emit.sum()),                       # emitted moves
        # simulations that advanced a LIVE game. Frozen done-lanes still
        # dispatch masked no-op sims in lockstep, but counting those would
        # flatter sims/s vs the continuous path (where every lane is
        # always live) — so only active-lane sims count in both paths.
        "simulations": int(active_all.sum()) * spec.num_simulations,
        "examples": len(examples),
        "moves_played": moves_played,
    }
    return examples, stats


@functools.partial(
    jax.jit, static_argnames=("eval_fn", "spec", "temperature_threshold"))
def selfplay_move_autoreset(
    states: env.EnvState,
    rng: jax.Array,
    eval_fn,
    spec: SearchSpec,
    temperature_threshold: int,
):
    """One lockstep move where finished lanes immediately restart.

    The TPU idiom for variable-length games in a fixed-shape batch
    (SURVEY.md §7 hard part 3): instead of freezing finished games until the
    whole batch ends (wasting their lanes' compute on masked no-ops for the
    tail of the slowest game), a lane whose game just finished is reset to
    the initial position, so every network evaluation in every lane is
    always real work. Returns (new_states, planes, probs, ended, winner):
    ``ended`` flags lanes whose episode completed ON this move, with
    ``winner`` its result; new_states holds fresh games for those lanes.
    """
    new_states, planes, probs, actions, values = selfplay_move(
        states, rng, eval_fn, spec, temperature_threshold)
    ended = new_states.done
    winner = new_states.winner
    fresh = env.initial_state(states.turn.shape)

    def pick(f, old):
        m = ended.reshape(ended.shape + (1,) * (f.ndim - ended.ndim))
        return jnp.where(m, f, old)

    reset = jax.tree_util.tree_map(pick, fresh, new_states)
    return reset, planes, probs, ended, winner


@functools.partial(
    jax.jit, static_argnames=("eval_fn", "spec", "temperature_threshold"))
def selfplay_move_autoreset_tree(
    states: env.EnvState,
    tree: Tree,
    rng: jax.Array,
    eval_fn,
    spec: SearchSpec,
    temperature_threshold: int,
):
    """Auto-reset move variant with tree reuse: lanes whose episode ended
    restart at the initial position with an EMPTY root (force_fresh), all
    other lanes keep the chosen child's subtree."""
    stree, planes, probs, actions, new_states = _searched_move(
        states, tree, rng, eval_fn, spec, temperature_threshold)
    ended = new_states.done
    winner = new_states.winner
    fresh = env.initial_state(states.turn.shape)

    def pick(f, old):
        m = ended.reshape(ended.shape + (1,) * (f.ndim - ended.ndim))
        return jnp.where(m, f, old)

    reset = jax.tree_util.tree_map(pick, fresh, new_states)
    new_tree = advance_root(stree, actions.astype(jnp.int32), reset, spec,
                            force_fresh=ended)
    return reset, planes, probs, ended, winner, new_tree


def selfplay_games_continuous(
    eval_fn,
    cfg: Config,
    rng: jax.Array,
    num_games: int | None = None,
    max_moves: int | None = None,
    mesh=None,
) -> Tuple[List[Tuple[np.ndarray, np.ndarray, np.ndarray]], dict]:
    """Play AT LEAST ``num_games`` self-play games with auto-resetting lanes.

    Produces the same (state, pi, WL-from-mover) example distribution as
    ``selfplay_games`` — every completed episode contributes all of its
    moves; episodes still in flight when the target is reached are
    discarded, exactly like the reference discards unfinished histories.
    Lane utilization stays ~100% instead of decaying through the batch tail.
    """
    num_games = num_games or cfg.parallel_games
    max_moves = max_moves or cfg.max_game_length
    spec = SearchSpec(
        num_simulations=cfg.num_simulations,
        num_actions=cfg.num_actions,
        c_puct=cfg.c_puct,
        fpu_reduction=cfg.fpu_reduction,
        tree_reuse=cfg.tree_reuse,
        dirichlet_alpha=cfg.dirichlet_alpha,
        dirichlet_epsilon=cfg.dirichlet_epsilon,
        value_dtype=jnp.dtype(cfg.value_dtype),
    )
    B = min(num_games, cfg.parallel_games)

    states = env.initial_state((B,))
    if mesh is not None and B % mesh.devices.size == 0:
        from alphazero_tpu.parallel.mesh import shard_batch

        states = shard_batch(mesh, states)
    tree = _initial_tree(states, spec, mesh)

    CHECK_EVERY = 8
    rec_planes: List[jax.Array] = []
    rec_probs: List[jax.Array] = []
    rec_mover: List[jax.Array] = []
    rec_ended: List[jax.Array] = []
    rec_winner: List[jax.Array] = []

    # generous cap: resets keep lanes busy, so num_games episodes need about
    # (num_games / B) * avg_game_length lockstep moves
    move_cap = max_moves * (num_games // B + 2)
    moves_played = 0
    completed = 0
    for m in range(move_cap):
        pre_turn = states.turn
        rng, k = jax.random.split(rng)
        if spec.tree_reuse:
            (states, planes, probs, ended, winner,
             tree) = selfplay_move_autoreset_tree(
                states, tree, k, eval_fn, spec, cfg.temperature_threshold)
        else:
            states, planes, probs, ended, winner = selfplay_move_autoreset(
                states, k, eval_fn, spec, cfg.temperature_threshold)
        rec_planes.append(planes)
        rec_probs.append(probs)
        rec_mover.append(pre_turn)
        rec_ended.append(ended)
        rec_winner.append(winner)
        moves_played = m + 1
        if (m + 1) % CHECK_EVERY == 0:
            completed += int(np.asarray(
                jnp.stack(rec_ended[-CHECK_EVERY:]).sum()))
            if completed >= num_games:
                break

    mover_all = np.asarray(jnp.stack(rec_mover))        # (M, B)
    ended_all = np.asarray(jnp.stack(rec_ended))        # (M, B)
    winner_all = np.asarray(jnp.stack(rec_winner))      # (M, B)
    planes_all = np.asarray(
        jnp.stack(rec_planes).astype(jnp.uint8))        # (M, B, 3, 8, 8)
    probs_all = np.asarray(jnp.stack(rec_probs))        # (M, B, A)

    M = ended_all.shape[0]
    # Episode id per (move, lane): number of endings strictly BEFORE m.
    ep_id = np.zeros((M, B), np.int32)
    ep_id[1:] = np.cumsum(ended_all[:-1], axis=0)
    n_eps = ep_id[-1] + ended_all[-1]                   # completed per lane
    # winner per (lane, episode): recorded at its ending move
    max_eps = int(n_eps.max()) if M else 0
    winner_of = np.zeros((B, max_eps + 1), np.int8)
    em, eb = np.nonzero(ended_all)
    winner_of[eb, ep_id[em, eb]] = winner_all[em, eb]
    ended_flag = np.zeros((B, max_eps + 1), bool)
    ended_flag[eb, ep_id[em, eb]] = True

    # emit moves belonging to COMPLETED episodes only
    lane = np.broadcast_to(np.arange(B)[None, :], (M, B))
    emit = ended_flag[lane, ep_id]
    m_idx, g_idx = np.nonzero(emit)
    winners = winner_of[g_idx, ep_id[m_idx, g_idx]]
    examples = _emit_examples(planes_all, probs_all, mover_all,
                              m_idx, g_idx, winners)

    total_games = int(n_eps.sum())
    stats = {
        "games": total_games,
        "moves": int(emit.sum()),
        "simulations": moves_played * B * spec.num_simulations,
        "examples": len(examples),
        "moves_played": moves_played,
    }
    return examples, stats
