"""On-device MCTS tests.

Covers the reference's MCTS test surface (tests/test_mcts.py) plus the
BASELINE.json config-2 parity bar: batched search visit counts match a
reference-semantics dict MCTS bit-exactly under a shared float32-exact
evaluator.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import (
    NUM_ACTIONS,
    OracleGame,
    encoded_state,
    initial_state,
)
from alphazero_tpu.env.breakthrough import EnvState
from alphazero_tpu.models import init_network
from alphazero_tpu.search import (
    SearchSpec,
    init_tree,
    make_net_evaluator,
    root_action_probs,
    root_child_visits,
    root_value,
    search,
)
from tests.oracle_mcts import OracleMCTS

# ---------------------------------------------------------------------------
# A float32-exact deterministic evaluator computable identically in
# numpy (oracle) and jnp (device): full-mantissa random policy weights
# (doubled on occupied source squares — an exact operation) plus a
# piece-difference value. Every produced value is exactly representable and
# identical on both sides, and full mantissas avoid the rational-ratio
# coincidences that integer weights create (e.g. priors in a 3:2 ratio make
# PUCT scores mathematically equal and thus op-order sensitive).
# ---------------------------------------------------------------------------

_BASE_W = np.random.default_rng(12345).uniform(
    0.5, 2.0, NUM_ACTIONS).astype(np.float32)
_SQ_OF_ACTION = (np.arange(NUM_ACTIONS) // 3).astype(np.int32)


def fake_eval_planes_np(planes: np.ndarray):
    """planes (3,8,8) -> (weights (192,) f32, value f32)."""
    mine = planes[0].reshape(64)
    theirs = planes[1].reshape(64)
    w = _BASE_W * (1.0 + mine[_SQ_OF_ACTION]).astype(np.float32)
    value = np.float32((mine.sum() - theirs.sum()) / np.float32(16.0))
    return w.astype(np.float32), value


def fake_eval_game(game: OracleGame):
    return fake_eval_planes_np(game.get_encoded_state())


def fake_eval_jax(planes: jax.Array):
    """Batched jnp twin of fake_eval_planes_np."""
    B = planes.shape[0]
    mine = planes[:, 0].reshape(B, 64)
    theirs = planes[:, 1].reshape(B, 64)
    w = jnp.asarray(_BASE_W) * (1.0 + mine[:, jnp.asarray(_SQ_OF_ACTION)])
    value = (mine.sum(-1) - theirs.sum(-1)) / jnp.float32(16.0)
    return w.astype(jnp.float32), value.astype(jnp.float32)


def states_from_games(games):
    return EnvState(
        board=jnp.asarray(np.stack([g.board for g in games]), jnp.int8),
        turn=jnp.asarray([g.turn for g in games], jnp.int8),
        winner=jnp.asarray([g.winner for g in games], jnp.int8),
        done=jnp.asarray([g.is_terminal() for g in games], jnp.bool_),
        move_count=jnp.asarray([g.move_count for g in games], jnp.int32),
    )


def random_midgame(rng, max_plies=40):
    g = OracleGame()
    for _ in range(int(rng.integers(0, max_plies))):
        if g.is_terminal():
            break
        g.step_action(int(rng.choice(g.get_legal_actions())))
    return g


jit_search = jax.jit(search, static_argnames=("eval_fn", "spec", "add_noise"))


class TestSearchBasics:
    def test_root_visits_equal_sims(self):
        spec = SearchSpec(num_simulations=32)
        tree = jit_search(initial_state((4,)), fake_eval_jax, spec)
        np.testing.assert_array_equal(np.asarray(tree.root_visit), 32)
        # child visits sum to total sims too (every sim passes the root)
        np.testing.assert_array_equal(
            np.asarray(root_child_visits(tree).sum(-1)), 32)

    def test_children_only_on_legal_actions(self):
        spec = SearchSpec(num_simulations=32)
        tree = jit_search(initial_state((2,)), fake_eval_jax, spec)
        visits = np.asarray(root_child_visits(tree))
        legal = np.asarray(
            jax.jit(lambda s: s)(initial_state((2,)).board) is not None)
        g = OracleGame()
        legal_mask = g.get_legal_action_mask()
        assert np.all(visits[:, ~legal_mask] == 0)

    def test_action_probs(self):
        spec = SearchSpec(num_simulations=32)
        tree = jit_search(initial_state((4,)), fake_eval_jax, spec)
        p1 = np.asarray(root_action_probs(tree, 1.0))
        np.testing.assert_allclose(p1.sum(-1), 1.0, atol=1e-5)
        p0 = np.asarray(root_action_probs(tree, 0.0))
        assert np.all(p0.sum(-1) == 1.0)
        assert np.all((p0 == 0) | (p0 == 1))
        np.testing.assert_array_equal(
            p0.argmax(-1), np.asarray(root_child_visits(tree)).argmax(-1))

    def test_noise_perturbs_root_priors(self):
        spec = SearchSpec(num_simulations=4)
        s = initial_state((2,))
        t_clean = jit_search(s, fake_eval_jax, spec)
        t_noise = jit_search(s, fake_eval_jax, spec, add_noise=True,
                             rng=jax.random.PRNGKey(0))
        assert not np.allclose(np.asarray(t_clean.prior[:, 0]),
                               np.asarray(t_noise.prior[:, 0]))
        # noise only on legal actions
        legal = OracleGame().get_legal_action_mask()
        np.testing.assert_array_equal(
            np.asarray(t_noise.prior[0, 0])[~legal], 0.0)

    def test_terminal_root_does_not_crash(self):
        g = OracleGame()
        rng = np.random.default_rng(3)
        while not g.is_terminal():
            g.step_action(int(rng.choice(g.get_legal_actions())))
        spec = SearchSpec(num_simulations=8)
        tree = jit_search(states_from_games([g, OracleGame()]),
                          fake_eval_jax, spec)
        # terminal game: no children materialized, all visits at root
        assert int(tree.root_visit[0]) == 8
        assert int(tree.node_count[0]) == 1
        assert int(tree.node_count[1]) > 1

    def test_root_value_sign(self):
        # a position one move from a white win: white to move should see
        # strongly positive root value with enough sims
        board = np.zeros((8, 8), np.int8)
        board[6, 3] = 1
        board[6, 6] = 1
        board[7, 0] = -1
        g = OracleGame(board, 1)
        spec = SearchSpec(num_simulations=64)
        tree = jit_search(states_from_games([g]), fake_eval_jax, spec)
        assert float(root_value(tree)[0]) > 0.5


class TestParityWithDictOracle:
    """BASELINE.json config 2: batched on-device search visit counts match
    the reference-semantics dict MCTS exactly.

    Runs in float64 (jax.enable_x64): at 64-bit precision XLA op-order
    rounding cannot flip a PUCT comparison except on structural ties, which
    tie-break identically (lowest action) on both sides.
    """

    @pytest.mark.parametrize("num_sims", [16, 100])
    def test_visit_count_parity(self, num_sims):
        rng = np.random.default_rng(42)
        games = [OracleGame()] + [random_midgame(rng) for _ in range(63)]
        games = [g if not g.is_terminal() else OracleGame() for g in games]

        spec = SearchSpec(num_simulations=num_sims,
                          value_dtype=jnp.dtype("float64"))
        with jax.enable_x64():
            tree = jax.jit(
                functools.partial(search, eval_fn=fake_eval_jax, spec=spec)
            )(states_from_games(games))
            device_visits = np.asarray(root_child_visits(tree))

        oracle = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                            dtype=np.float64)
        mismatches = []
        for i, g in enumerate(games):
            root = oracle.search(g)
            expected = OracleMCTS.visit_counts(root)
            if not np.array_equal(device_visits[i], expected):
                mismatches.append(
                    (i, int(np.abs(device_visits[i] - expected).sum())))
        assert not mismatches, f"visit mismatches (game, L1): {mismatches}"

    def test_visit_count_parity_with_injected_noise(self):
        rng = np.random.default_rng(7)
        games = [random_midgame(rng) for _ in range(16)]
        games = [g if not g.is_terminal() else OracleGame() for g in games]
        num_sims = 50

        # external dirichlet noise injected into both searches
        noise = np.zeros((len(games), NUM_ACTIONS), np.float64)
        for i, g in enumerate(games):
            legal = np.flatnonzero(g.get_legal_action_mask())
            noise[i, legal] = rng.dirichlet([0.35] * len(legal))

        spec = SearchSpec(num_simulations=num_sims,
                          value_dtype=jnp.dtype("float64"))
        with jax.enable_x64():
            tree = jax.jit(
                functools.partial(search, eval_fn=fake_eval_jax, spec=spec)
            )(states_from_games(games), root_noise=jnp.asarray(noise))
            device_visits = np.asarray(root_child_visits(tree))

        oracle = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                            dtype=np.float64)
        for i, g in enumerate(games):
            root = oracle.search(g, noise=noise[i])
            np.testing.assert_array_equal(
                device_visits[i], OracleMCTS.visit_counts(root),
                err_msg=f"game {i}")

    def test_visit_count_parity_with_fpu(self):
        """fpu_reduction > 0 (the optional FPU mode, SearchSpec docstring)
        matches the oracle running the same parent_Q - reduction formula,
        and actually changes the search vs the q=0 default."""
        rng = np.random.default_rng(11)
        games = [OracleGame()] + [random_midgame(rng) for _ in range(15)]
        games = [g if not g.is_terminal() else OracleGame() for g in games]
        num_sims, fpu = 50, 0.2

        spec = SearchSpec(num_simulations=num_sims, fpu_reduction=fpu,
                          value_dtype=jnp.dtype("float64"))
        with jax.enable_x64():
            tree = jax.jit(
                functools.partial(search, eval_fn=fake_eval_jax, spec=spec)
            )(states_from_games(games))
            device_visits = np.asarray(root_child_visits(tree))

        oracle = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                            dtype=np.float64, fpu_reduction=fpu)
        base = OracleMCTS(fake_eval_game, num_simulations=num_sims,
                          dtype=np.float64)
        any_diff = False
        for i, g in enumerate(games):
            expected = OracleMCTS.visit_counts(oracle.search(g))
            np.testing.assert_array_equal(device_visits[i], expected,
                                          err_msg=f"game {i}")
            any_diff |= not np.array_equal(
                expected, OracleMCTS.visit_counts(base.search(g)))
        assert any_diff, "fpu_reduction=0.2 should change some search"


class TestWithRealNet:
    def test_search_with_tiny_net(self):
        cfg = tiny_config()
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        eval_fn = make_net_evaluator(net, variables)
        spec = SearchSpec(num_simulations=24)
        tree = jax.jit(
            functools.partial(search, eval_fn=eval_fn, spec=spec)
        )(initial_state((8,)))
        visits = np.asarray(root_child_visits(tree))
        assert visits.sum() == 24 * 8
        legal = OracleGame().get_legal_action_mask()
        assert np.all(visits[:, ~legal] == 0)
