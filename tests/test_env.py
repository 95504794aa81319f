"""Unit tests for the vectorized env + scalar oracle.

Mirrors the reference's env test coverage (tests/test_game.py): action
roundtrips, initial setup, move-gen properties, capture semantics, win
conditions, cloning, and state encoding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.env import (
    BLACK,
    EMPTY,
    NUM_ACTIONS,
    WHITE,
    EnvState,
    OracleGame,
    encoded_state,
    initial_state,
    legal_action_mask,
    result_wl,
    step,
)
from alphazero_tpu.env.breakthrough import (
    decode_action_to_move,
    encode_move_to_action,
)

# Always exercise the compiled path (eager per-primitive compiles are slow
# on first use; real code paths are always jitted).
step = jax.jit(step)
legal_action_mask = jax.jit(legal_action_mask)
encoded_state = jax.jit(encoded_state)


def make_state(board, turn):
    return EnvState(
        board=jnp.asarray(board, jnp.int8),
        turn=jnp.asarray(turn, jnp.int8),
        winner=jnp.zeros(np.shape(turn), jnp.int8),
        done=jnp.zeros(np.shape(turn), jnp.bool_),
        move_count=jnp.zeros(np.shape(turn), jnp.int32),
    )


class TestActionEncoding:
    def test_roundtrip_all_actions_white(self):
        for a in range(NUM_ACTIONS):
            move = decode_action_to_move(a, WHITE)
            assert encode_move_to_action(move, WHITE) == a

    def test_roundtrip_all_actions_black(self):
        for a in range(NUM_ACTIONS):
            move = decode_action_to_move(a, BLACK)
            assert encode_move_to_action(move, BLACK) == a

    def test_black_moves_decrease_row(self):
        r0, _, r1, _ = decode_action_to_move(8 * 3, BLACK)  # square (1,0), fwd
        assert r1 == r0 - 1


class TestInitialPosition:
    def test_setup(self):
        g = OracleGame()
        assert np.all(g.board[0:2] == WHITE)
        assert np.all(g.board[6:8] == BLACK)
        assert np.all(g.board[2:6] == EMPTY)
        assert g.turn == WHITE

    def test_initial_legal_move_count(self):
        # back row: 8 fwd blocked, diagonals blocked by own second row;
        # second row: 8 fwd + 7 dl + 7 dr = 22 moves
        g = OracleGame()
        assert len(g.get_legal_actions()) == 22
        s = initial_state()
        assert int(legal_action_mask(s).sum()) == 22

    def test_batched_initial_mask(self):
        s = initial_state((4,))
        m = legal_action_mask(s)
        assert m.shape == (4, NUM_ACTIONS)
        assert np.all(np.asarray(m.sum(-1)) == 22)


class TestMoveGen:
    def test_no_backward_moves(self):
        g = OracleGame()
        for fr_r, fr_c, to_r, to_c in g.get_legal_moves():
            assert to_r == fr_r + 1  # white moves up
        g.step(g.get_legal_moves()[0])
        for fr_r, fr_c, to_r, to_c in g.get_legal_moves():
            assert to_r == fr_r - 1  # black moves down

    def test_straight_capture_illegal_diag_capture_legal(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 3] = WHITE
        board[4, 3] = BLACK  # blocks forward
        board[4, 4] = BLACK  # diagonal capture available
        g = OracleGame(board, WHITE)
        moves = set(g.get_legal_moves())
        assert (3, 3, 4, 3) not in moves
        assert (3, 3, 4, 4) in moves
        assert (3, 3, 4, 2) in moves  # empty diagonal

        s = make_state(board, WHITE)
        mask = np.asarray(legal_action_mask(s))
        sq = 3 * 8 + 3
        assert not mask[sq * 3 + 0]
        assert mask[sq * 3 + 1] and mask[sq * 3 + 2]

    def test_own_piece_blocks_diagonal(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 3] = WHITE
        board[4, 4] = WHITE
        g = OracleGame(board, WHITE)
        assert (3, 3, 4, 4) not in g.get_legal_moves()

    def test_edge_columns(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 0] = WHITE
        board[3, 7] = WHITE
        board[7, 0] = BLACK  # keep black alive
        g = OracleGame(board, WHITE)
        moves = set(g.get_legal_moves())
        assert (3, 0, 4, 0) in moves and (3, 0, 4, 1) in moves
        assert all(m[3] >= 0 and m[3] < 8 for m in moves)
        assert (3, 7, 4, 7) in moves and (3, 7, 4, 6) in moves


class TestStep:
    def test_capture_removes_piece(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 3] = WHITE
        board[4, 4] = BLACK
        board[7, 0] = BLACK
        g = OracleGame(board, WHITE)
        g.step((3, 3, 4, 4))
        assert g.board[4, 4] == WHITE
        assert g.board[3, 3] == EMPTY
        assert g.turn == BLACK
        assert not g.is_terminal()

        s = make_state(board, WHITE)
        a = encode_move_to_action((3, 3, 4, 4), WHITE)
        s2 = step(s, jnp.asarray(a))
        np.testing.assert_array_equal(np.asarray(s2.board), g.board)
        assert int(s2.turn) == BLACK

    def test_white_win_by_home_row(self):
        board = np.zeros((8, 8), np.int8)
        board[6, 2] = WHITE
        board[7, 5] = BLACK
        g = OracleGame(board, WHITE)
        g.step((6, 2, 7, 2))
        assert g.is_terminal() and g.winner == WHITE
        assert g.get_result() == (1.0, 0.0)

        s2 = step(make_state(board, WHITE),
                  jnp.asarray(encode_move_to_action((6, 2, 7, 2), WHITE)))
        assert bool(s2.done) and int(s2.winner) == WHITE
        np.testing.assert_array_equal(np.asarray(result_wl(s2)), [1.0, 0.0])

    def test_black_win_by_home_row(self):
        board = np.zeros((8, 8), np.int8)
        board[1, 4] = BLACK
        board[0, 0] = WHITE
        g = OracleGame(board, BLACK)
        g.step((1, 4, 0, 4))
        assert g.winner == BLACK
        s2 = step(make_state(board, BLACK),
                  jnp.asarray(encode_move_to_action((1, 4, 0, 4), BLACK)))
        assert int(s2.winner) == BLACK

    def test_win_by_capture_all(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 3] = WHITE
        board[4, 4] = BLACK  # black's only piece
        g = OracleGame(board, WHITE)
        g.step((3, 3, 4, 4))
        assert g.winner == WHITE
        s2 = step(make_state(board, WHITE),
                  jnp.asarray(encode_move_to_action((3, 3, 4, 4), WHITE)))
        assert int(s2.winner) == WHITE

    def test_done_games_freeze(self):
        board = np.zeros((8, 8), np.int8)
        board[6, 2] = WHITE
        board[7, 5] = BLACK
        s = make_state(board, WHITE)
        a = jnp.asarray(encode_move_to_action((6, 2, 7, 2), WHITE))
        s2 = step(s, a)
        s3 = step(s2, jnp.asarray(0))  # arbitrary action on a finished game
        np.testing.assert_array_equal(np.asarray(s3.board), np.asarray(s2.board))
        assert int(s3.move_count) == int(s2.move_count)
        assert int(s3.winner) == WHITE


class TestEncoding:
    def test_white_perspective(self):
        g = OracleGame()
        planes = g.get_encoded_state()
        assert planes.shape == (3, 8, 8)
        assert np.all(planes[0][0:2] == 1.0)
        assert np.all(planes[1][6:8] == 1.0)
        assert np.all(planes[2] == 1.0)

    def test_black_perspective_flip(self):
        g = OracleGame()
        g.step(g.get_legal_moves()[0])
        planes = g.get_encoded_state()
        # black to move: its pieces (abs rows 6-7) appear on canonical rows 0-1
        assert np.all(planes[0][0:2] == 1.0)

    def test_jax_matches_oracle(self):
        rng = np.random.default_rng(0)
        g = OracleGame()
        for _ in range(10):
            acts = g.get_legal_actions()
            a = int(rng.choice(acts))
            sj = make_state(g.board, g.turn)
            np.testing.assert_array_equal(
                np.asarray(encoded_state(sj)), g.get_encoded_state())
            g.step_action(a)

    def test_clone_independence(self):
        g = OracleGame()
        h = g.clone()
        h.step(h.get_legal_moves()[0])
        assert np.any(g.board != h.board)
        assert g.turn == WHITE


class TestJit:
    def test_step_jits_and_batches(self):
        @jax.jit
        def play(s, actions):
            def body(s, a):
                return step(s, a), legal_action_mask(s)
            return jax.lax.scan(body, s, actions)

        B = 16
        s = initial_state((B,))
        rng = np.random.default_rng(1)
        # pick any always-legal-ish action sequence: forward from row 1
        acts = jnp.asarray(
            rng.integers(0, NUM_ACTIONS, size=(4, B)), jnp.int32)
        out, masks = play(s, acts)
        assert out.board.shape == (B, 8, 8)
        assert masks.shape == (4, B, NUM_ACTIONS)
