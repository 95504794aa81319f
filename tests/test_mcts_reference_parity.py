"""Differential test: on-device search vs the ACTUAL reference MCTS.

BASELINE.json config 2. The reference's ``MCTS`` (dict tree, python-float
math) is imported from /root/reference and driven with the same injected
evaluator as the device search (its ``_batch_evaluate`` is replaced on the
instance — no torch involved), so both sides see bit-identical leaf
evaluations. Visit counts must match exactly.

Runs the device tree in float64 so op-order rounding (~1e-16) cannot flip
PUCT comparisons; the full-mantissa evaluator excludes structural ties (the
reference iterates children in dict-insertion order, which differs from
ascending order for Black on exact ties only).
"""

import functools
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, reference_available
from tests.oracle_mcts import OracleMCTS
from tests.test_mcts import (
    fake_eval_game,
    fake_eval_jax,
    fake_eval_planes_np,
    random_midgame,
    states_from_games,
)

from alphazero_tpu.env import NUM_ACTIONS, OracleGame

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from src import game as ref_game  # noqa: PLC0415
    from src import mcts as ref_mcts  # noqa: PLC0415

    return ref_game, ref_mcts


def _inject_eval(ref_mcts_obj):
    """Replace the reference MCTS's torch evaluation with the shared
    deterministic evaluator (identical to the device search's eval_fn)."""

    def batch_evaluate(games):
        out = []
        for g in games:
            w, v = fake_eval_planes_np(g.get_encoded_state())
            out.append((w, float(v)))
        return out

    ref_mcts_obj._batch_evaluate = batch_evaluate
    return ref_mcts_obj


def test_device_search_matches_reference_mcts(ref):
    import jax
    import jax.numpy as jnp

    from alphazero_tpu.search import SearchSpec, root_child_visits, search

    ref_game_mod, ref_mcts_mod = ref
    rng = np.random.default_rng(2024)
    my_games = [OracleGame()] + [random_midgame(rng) for _ in range(31)]
    my_games = [g if not g.is_terminal() else OracleGame() for g in my_games]

    num_sims = 60
    spec = SearchSpec(num_simulations=num_sims,
                      value_dtype=jnp.dtype("float64"))
    with jax.enable_x64():
        tree = jax.jit(
            functools.partial(search, eval_fn=fake_eval_jax, spec=spec)
        )(states_from_games(my_games))
        device_visits = np.asarray(root_child_visits(tree))

    mcts = _inject_eval(ref_mcts_mod.MCTS(model=None,
                                          num_simulations=num_sims))
    ref_games = [
        ref_game_mod.BreakthroughGame(board=np.asarray(g.board), turn=g.turn)
        for g in my_games
    ]
    roots = mcts.search_batch(ref_games, add_noise=False)

    mismatches = []
    for i, root in enumerate(roots):
        expected = np.zeros(NUM_ACTIONS, np.int32)
        for a, child in root.children.items():
            expected[a] = child.visit_count
        if not np.array_equal(device_visits[i], expected):
            mismatches.append(
                (i, int(np.abs(device_visits[i] - expected).sum())))
    assert not mismatches, f"visit mismatches vs reference: {mismatches}"


def test_device_tree_reuse_matches_reference_mcts(ref):
    """Multi-move parity WITH tree reuse against the actual reference:
    both sides search, pick the argmax-visit move, descend into the chosen
    child (reference parallel_trainer.py:194-198 / device advance_root),
    and search again — visit counts must match at every move."""
    import jax
    import jax.numpy as jnp

    from alphazero_tpu.env import breakthrough as env
    from alphazero_tpu.search import (
        SearchSpec,
        advance_root,
        init_tree,
        root_child_visits,
        search,
    )

    ref_game_mod, ref_mcts_mod = ref
    rng = np.random.default_rng(77)
    my_games = [OracleGame()] + [random_midgame(rng) for _ in range(11)]
    my_games = [g if not g.is_terminal() else OracleGame() for g in my_games]

    num_sims, num_moves = 40, 4
    spec = SearchSpec(num_simulations=num_sims, tree_reuse=True,
                      value_dtype=jnp.dtype("float64"))

    mcts = _inject_eval(ref_mcts_mod.MCTS(model=None,
                                          num_simulations=num_sims))
    ref_games = [
        ref_game_mod.BreakthroughGame(board=np.asarray(g.board), turn=g.turn)
        for g in my_games
    ]
    roots = None
    alive = [True] * len(my_games)

    with jax.enable_x64():
        states = states_from_games(my_games)
        tree = init_tree(states, spec)
        jsearch = jax.jit(functools.partial(search, eval_fn=fake_eval_jax,
                                            spec=spec))
        jadvance = jax.jit(functools.partial(advance_root, spec=spec))
        jstep = jax.jit(env.step)

        for mv in range(num_moves):
            tree = jsearch(states, tree=tree)
            device_visits = np.asarray(root_child_visits(tree))

            roots = mcts.search_batch(ref_games, roots, add_noise=False)
            actions = np.zeros(len(my_games), np.int64)
            for i, root in enumerate(roots):
                if not alive[i]:
                    continue
                expected = np.zeros(NUM_ACTIONS, np.int32)
                for a, child in root.children.items():
                    expected[a] = child.visit_count
                np.testing.assert_array_equal(
                    device_visits[i], expected,
                    err_msg=f"game {i} move {mv}")
                actions[i] = int(np.argmax(expected))

            for i in range(len(my_games)):
                if not alive[i]:
                    continue
                a = int(actions[i])
                move = ref_games[i].decode_action(a)
                ref_games[i].step(move)
                roots[i] = roots[i].children.get(a)
                if ref_games[i].is_terminal():
                    alive[i] = False
                    # park a fresh game so search_batch stays well-defined;
                    # this lane is never compared again
                    ref_games[i] = ref_game_mod.BreakthroughGame()
                    roots[i] = None

            acts = jnp.asarray(actions, jnp.int32)
            states = jstep(states, acts)
            tree = jadvance(tree, acts, states)


def test_dict_oracle_matches_reference_mcts(ref):
    """Sanity for the in-repo oracle itself: same semantics as the actual
    reference implementation under the shared evaluator."""
    ref_game_mod, ref_mcts_mod = ref
    rng = np.random.default_rng(5)
    my_games = [random_midgame(rng) for _ in range(8)]
    my_games = [g if not g.is_terminal() else OracleGame() for g in my_games]

    num_sims = 40
    mcts = _inject_eval(ref_mcts_mod.MCTS(model=None,
                                          num_simulations=num_sims))
    oracle = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                        dtype=np.float64)
    for i, g in enumerate(my_games):
        ref_g = ref_game_mod.BreakthroughGame(
            board=np.asarray(g.board), turn=g.turn)
        ref_root = mcts.search_batch([ref_g], add_noise=False)[0]
        expected = np.zeros(NUM_ACTIONS, np.int32)
        for a, child in ref_root.children.items():
            expected[a] = child.visit_count
        mine = OracleMCTS.visit_counts(oracle.search(g))
        np.testing.assert_array_equal(mine, expected, err_msg=f"game {i}")
