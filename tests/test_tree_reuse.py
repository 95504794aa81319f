"""Between-move tree reuse tests (reference parallel_trainer.py:194-198).

Pins advance_root() semantics three ways:

1. float64 multi-move visit-count parity against the dict oracle driving
   the SAME reuse protocol (search -> argmax -> descend into child), with
   per-move injected root noise (the compounding-noise contract);
2. structural invariants of the compacted tree (counts, pointer closure,
   root stats == the reused edge's stats);
3. end-to-end self-play with Config.tree_reuse on (both generators).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import NUM_ACTIONS, OracleGame
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.models import init_network
from alphazero_tpu.search import (
    SearchSpec,
    advance_root,
    init_tree,
    make_net_evaluator,
    root_child_visits,
    search,
)
from tests.oracle_mcts import OracleMCTS
from tests.test_mcts import (
    fake_eval_game,
    fake_eval_jax,
    random_midgame,
    states_from_games,
)


def _device_reuse_rollout(games, num_sims, num_moves, noise_per_move=None):
    """Play ``num_moves`` argmax moves with tree reuse on device (float64).
    Returns per-move visit-count arrays and the action taken each move."""
    spec = SearchSpec(num_simulations=num_sims, tree_reuse=True,
                      value_dtype=jnp.dtype("float64"))
    jsearch = jax.jit(functools.partial(search, eval_fn=fake_eval_jax,
                                        spec=spec))
    jadvance = jax.jit(functools.partial(advance_root, spec=spec))
    jstep = jax.jit(env.step)

    visits_per_move, actions_per_move = [], []
    with jax.enable_x64():   # init inside: f64 demotes to f32 outside
        states = states_from_games(games)
        tree = init_tree(states, spec)
        for mv in range(num_moves):
            noise = (None if noise_per_move is None
                     else jnp.asarray(noise_per_move[mv]))
            tree = jsearch(states, rng=None, tree=tree, root_noise=noise)
            visits = np.asarray(root_child_visits(tree))
            actions = jnp.asarray(np.argmax(visits, axis=-1), jnp.int32)
            states = jstep(states, actions)
            tree = jadvance(tree, actions, states)
            visits_per_move.append(visits)
            actions_per_move.append(np.asarray(actions))
    return visits_per_move, actions_per_move, tree


class TestReuseOracleParity:
    @pytest.mark.parametrize("with_noise", [False, True])
    def test_multi_move_visit_parity(self, with_noise):
        rng = np.random.default_rng(31)
        games = [OracleGame()] + [random_midgame(rng, 20) for _ in range(7)]
        games = [g if not g.is_terminal() else OracleGame() for g in games]
        num_sims, num_moves = 40, 4

        noise = None
        if with_noise:
            noise = np.zeros((num_moves, len(games), NUM_ACTIONS), np.float64)
            # noise for every move/game over the legal actions of whatever
            # position it reaches — legality varies per rollout, so draw
            # dense positive noise and renormalize per game inside search
            noise[:] = rng.dirichlet([0.35] * NUM_ACTIONS,
                                     size=(num_moves, len(games)))

        dev_visits, dev_actions, _ = _device_reuse_rollout(
            games, num_sims, num_moves, noise)

        oracle = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                            dtype=np.float64)
        for i, g0 in enumerate(games):
            g = g0.clone()
            root = None
            for mv in range(num_moves):
                if g.is_terminal():
                    break
                root = oracle.search(
                    g, noise=None if noise is None else noise[mv, i],
                    root=root)
                expected = OracleMCTS.visit_counts(root)
                np.testing.assert_array_equal(
                    dev_visits[mv][i], expected,
                    err_msg=f"game {i} move {mv} (noise={with_noise})")
                a = int(np.argmax(expected))
                assert dev_actions[mv][i] == a
                g.step_action(a)
                root = root.children.get(a)

    def test_reused_root_carries_visits(self):
        """Second search's root visit budget accumulates on the reused
        subtree: total root-child visits = reused + num_sims."""
        games = [OracleGame() for _ in range(4)]
        num_sims = 30
        dev_visits, _, tree = _device_reuse_rollout(games, num_sims, 2)
        # move 2 root = move 1's chosen child; its visit count v0 persists
        v_move2 = dev_visits[1].sum(axis=-1)
        assert (v_move2 > num_sims - 1).all(), (
            "reused subtrees should push past a fresh search's visit total")


class TestAdvanceRootInvariants:
    def _searched_tree(self, num_sims=24, n_games=6, reuse=True):
        rng = np.random.default_rng(9)
        games = [OracleGame()] + [random_midgame(rng, 12)
                                  for _ in range(n_games - 1)]
        games = [g if not g.is_terminal() else OracleGame() for g in games]
        spec = SearchSpec(num_simulations=num_sims, tree_reuse=reuse)
        states = states_from_games(games)
        tree = jax.jit(functools.partial(
            search, eval_fn=fake_eval_jax, spec=spec))(
                states, tree=init_tree(states, spec))
        return tree, states, spec

    def test_pointer_closure_and_counts(self):
        tree, states, spec = self._searched_tree()
        visits = np.asarray(root_child_visits(tree))
        actions = jnp.asarray(np.argmax(visits, axis=-1), jnp.int32)
        new_states = jax.jit(env.step)(states, actions)
        adv = jax.jit(functools.partial(advance_root, spec=spec))(
            tree, actions, new_states)

        A = spec.num_actions
        B, M = adv.rows.shape[:2]
        flat = np.asarray(adv.rows.reshape(B, M, -1))
        counts = np.asarray(adv.node_count)
        for b in range(B):
            n = counts[b]
            # every child pointer inside the live region targets the live
            # region (closure survived renumbering), parents ascend
            ptrs = flat[b, :n, :A]
            real = ptrs[ptrs > 0.5]
            assert (real < n).all(), f"game {b}: pointer escapes live region"
            pars = np.asarray(adv.parents[b, :n])
            assert (pars[1:] < np.arange(1, n)).all()
        # root stats equal the chosen edge's stats from the old tree
        old_flat = np.asarray(tree.rows[:, 0].reshape(B, -1))
        a = np.asarray(actions)
        ev = old_flat[np.arange(B), 2 * A + a]
        np.testing.assert_array_equal(np.asarray(adv.root_visit),
                                      ev.astype(np.int32))
        # next search must fit
        assert int(adv.next_slot) + spec.num_simulations <= M - 1

    def test_fresh_fallback_on_unvisited_child(self):
        """Choosing an action whose child was never allocated restarts that
        game with an empty root (reference: roots[i] = None)."""
        tree, states, spec = self._searched_tree()
        visits = np.asarray(root_child_visits(tree))
        # pick the LEAST-visited legal action; make game 0 pick an
        # unvisited one if any exists
        legal = visits.sum(axis=-1, keepdims=True) >= 0
        actions = np.argmax(visits, axis=-1)
        unvisited = np.asarray(
            (np.asarray(tree.rows[:, 0].reshape(len(visits), -1))
             [:, :spec.num_actions] == -1.0) & (visits == 0))
        if unvisited[0].any():
            actions[0] = int(np.flatnonzero(unvisited[0])[0])
        actions = jnp.asarray(actions, jnp.int32)
        new_states = jax.jit(env.step)(states, actions)
        adv = jax.jit(functools.partial(advance_root, spec=spec))(
            tree, actions, new_states)
        if unvisited[0].any():
            assert int(adv.root_visit[0]) == 0
            assert int(adv.node_count[0]) == 1
            root0 = np.asarray(adv.rows[0, 0].reshape(-1))
            assert (root0[:spec.num_actions] == -2.0).all()

    def test_force_fresh_resets_lane(self):
        tree, states, spec = self._searched_tree()
        visits = np.asarray(root_child_visits(tree))
        actions = jnp.asarray(np.argmax(visits, axis=-1), jnp.int32)
        new_states = jax.jit(env.step)(states, actions)
        ff = jnp.asarray([True] + [False] * (visits.shape[0] - 1))
        adv = jax.jit(functools.partial(advance_root, spec=spec))(
            tree, actions, new_states, force_fresh=ff)
        assert int(adv.root_visit[0]) == 0 and int(adv.node_count[0]) == 1
        assert int(adv.node_count[1]) >= 1


class TestSelfplayWithReuse:
    @pytest.fixture(scope="class")
    def net_eval(self):
        cfg = tiny_config(num_blocks=2, num_filters=8, num_simulations=8,
                          parallel_games=8, tree_reuse=True,
                          max_game_length=128)
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        return cfg, make_net_evaluator(net, variables)

    def test_selfplay_games_reuse(self, net_eval):
        from alphazero_tpu.train.selfplay import selfplay_games

        cfg, eval_fn = net_eval
        examples, stats = selfplay_games(eval_fn, cfg, jax.random.PRNGKey(2))
        assert stats["games"] == 8
        assert stats["examples"] == len(examples) > 0
        for s, p, wl in examples[:32]:
            np.testing.assert_allclose(p.sum(), 1.0, atol=1e-4)
            assert sorted(wl.tolist()) == [0.0, 1.0]

    def test_selfplay_continuous_reuse(self, net_eval):
        from alphazero_tpu.train.selfplay import selfplay_games_continuous

        cfg, eval_fn = net_eval
        examples, stats = selfplay_games_continuous(
            eval_fn, cfg, jax.random.PRNGKey(3), num_games=10)
        assert stats["games"] >= 10
        assert stats["examples"] == len(examples) > 0
        w = np.mean([e[2][0] for e in examples])
        assert 0.2 < w < 0.8
