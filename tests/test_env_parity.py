"""Differential parity tests against the actual reference implementation.

BASELINE.json config 1: 256 random-policy games, fixed seed, moves and
outcomes bit-exact vs /root/reference/src/game.py. The reference tree is
imported as a test oracle only (never vendored); tests skip if absent.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, reference_available

from alphazero_tpu.env import (
    BLACK,
    WHITE,
    OracleGame,
    encoded_state,
    initial_state,
    legal_action_mask,
    result_wl,
    step,
)
from tests.test_env import make_state

import jax

step = jax.jit(step)
legal_action_mask = jax.jit(legal_action_mask)
encoded_state = jax.jit(encoded_state)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_game_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from src import game as ref_game  # noqa: PLC0415

    return ref_game


def _assert_position_parity(ref, mine: OracleGame):
    np.testing.assert_array_equal(np.asarray(ref.board), mine.board)
    assert ref.turn == mine.turn
    assert ref.is_terminal() == mine.is_terminal()
    if ref.is_terminal():
        # (reference masks are unused/undefined on terminal states; ours are 0)
        assert ref.get_result() == mine.get_result()
    else:
        np.testing.assert_array_equal(
            ref.get_legal_action_mask(), mine.get_legal_action_mask())
        np.testing.assert_array_equal(
            ref.get_encoded_state(), mine.get_encoded_state())


def test_random_policy_games_bit_exact(ref_game_module):
    """256 fixed-seed random games: every position, mask, encoding, and
    outcome identical across reference / oracle / vectorized env."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1234)
    n_games, checked_positions = 256, 0
    for g_idx in range(n_games):
        ref = ref_game_module.BreakthroughGame()
        mine = OracleGame()
        move_no = 0
        while not ref.is_terminal():
            _assert_position_parity(ref, mine)
            acts = mine.get_legal_actions()
            a = int(rng.choice(acts))
            ref.step(ref.decode_action(a))
            mine.step_action(a)
            move_no += 1
            checked_positions += 1
            assert move_no < 512, "runaway game"
        _assert_position_parity(ref, mine)
    assert checked_positions > 10_000


def test_vectorized_env_matches_oracle_trajectories():
    """Batched JAX env stepped in lockstep matches per-game oracles."""
    import jax
    import jax.numpy as jnp

    B = 64
    rng = np.random.default_rng(99)
    oracles = [OracleGame() for _ in range(B)]
    state = initial_state((B,))
    jit_step = jax.jit(step)

    for ply in range(160):
        mask = np.asarray(legal_action_mask(state))
        actions = np.zeros(B, np.int32)
        for i, g in enumerate(oracles):
            if g.is_terminal():
                np.testing.assert_array_equal(mask[i], False)
                continue
            legal = np.flatnonzero(mask[i])
            np.testing.assert_array_equal(legal, g.get_legal_actions())
            actions[i] = rng.choice(legal)
        state = jit_step(state, jnp.asarray(actions))
        boards = np.asarray(state.board)
        winners = np.asarray(state.winner)
        for i, g in enumerate(oracles):
            if g.is_terminal():
                continue
            g.step_action(int(actions[i]))
            np.testing.assert_array_equal(boards[i], g.board)
            assert winners[i] == g.winner
        if all(g.is_terminal() for g in oracles):
            break
    assert all(g.is_terminal() for g in oracles)
    wl = np.asarray(result_wl(state))
    for i, g in enumerate(oracles):
        np.testing.assert_array_equal(wl[i], np.asarray(g.get_result()))


def test_reference_encode_decode_agreement(ref_game_module):
    """Action codes agree with the reference on random positions x turns."""
    rng = np.random.default_rng(7)
    for _ in range(30):
        ref = ref_game_module.BreakthroughGame()
        for _ in range(int(rng.integers(0, 30))):
            if ref.is_terminal():
                break
            moves = ref.get_legal_moves()
            ref.step(moves[int(rng.integers(len(moves)))])
        if ref.is_terminal():
            continue
        mine = OracleGame(np.asarray(ref.board), ref.turn)
        for move in ref.get_legal_moves():
            a_ref = ref.encode_action(move)
            assert mine.encode_action(move) == a_ref
            assert mine.decode_action(a_ref) == move
