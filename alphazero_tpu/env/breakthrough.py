"""Vectorized Breakthrough environment for TPU.

Pure-functional, batch-agnostic rules kernels: every function operates on the
trailing (8, 8) board axes and broadcasts over arbitrary leading batch
dimensions, so the same code runs a single game or a million in lockstep
under ``jit``/``vmap``/``shard_map``.

Behavioral contract (matches the reference, /root/reference/src/game.py):

- 8x8 board, WHITE=+1 starts on rows 0-1 and moves toward row 7,
  BLACK=-1 starts on rows 6-7 and moves toward row 0 (game.py:90-99).
- Moves: one square straight-forward (target must be empty) or
  diagonal-forward (target must not be own piece; captures only happen
  diagonally) (game.py:109-150).
- Actions are encoded *canonically* — from the mover's perspective with the
  board rotated 180 degrees for Black: ``action = (row*8 + col)*3 + dir``
  with dir 0=forward, 1=diag-left, 2=diag-right (game.py:48-60,225-278).
- Win: reach the opponent's home row, or capture every opposing piece
  (game.py:175-187). A player with no legal moves loses
  (game.py:189-215).
- State encoding: 3 planes (mine, theirs, ones) from the mover's
  perspective, 180-degree flip for Black (game.py:280-307).

Design notes (TPU-first, not a translation):

- No scalar loops, no dynamic shapes. Legal-move generation is expressed as
  shifted boolean planes — the vector analogue of the reference's own
  bitboard formulation (baseline/state.py:90-274) — and compiles to a
  handful of VPU ops regardless of batch size.
- ``step`` applies the move via a 64-lane select instead of a scatter, so it
  fuses with surrounding work and never leaves registers/VMEM.
- Finished games are no-op stepped (state frozen once ``done``) so lockstep
  batches never need compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

WHITE = 1
BLACK = -1
EMPTY = 0
BOARD_SIZE = 8
NUM_SQUARES = 64
NUM_ACTIONS = 192
NUM_PLANES = 3

# dir -> column delta in the canonical frame (forward, diag-left, diag-right)
_DIR_DCOL = (0, -1, 1)


@struct.dataclass
class EnvState:
    """Struct-of-arrays game state; all fields share leading batch dims.

    board:      (..., 8, 8) int8, absolute orientation (+1 white, -1 black)
    turn:       (...,) int8, player to move (+1 / -1)
    winner:     (...,) int8, 0 while in progress
    done:       (...,) bool
    move_count: (...,) int32, plies played
    """

    board: jax.Array
    turn: jax.Array
    winner: jax.Array
    done: jax.Array
    move_count: jax.Array


def _initial_board_np():
    import numpy as np

    b = np.zeros((BOARD_SIZE, BOARD_SIZE), np.int8)
    b[0:2, :] = WHITE
    b[6:8, :] = BLACK
    return b


def initial_state(batch_shape: tuple = ()) -> EnvState:
    """Starting position, broadcast to ``batch_shape`` leading dims."""
    board = jnp.broadcast_to(
        jnp.asarray(_initial_board_np()), batch_shape + (BOARD_SIZE, BOARD_SIZE)
    ).astype(jnp.int8)
    return EnvState(
        board=board,
        turn=jnp.full(batch_shape, WHITE, jnp.int8),
        winner=jnp.zeros(batch_shape, jnp.int8),
        done=jnp.zeros(batch_shape, jnp.bool_),
        move_count=jnp.zeros(batch_shape, jnp.int32),
    )


# -----------------------------------------------------------------------------
# Canonical-frame plane algebra
# -----------------------------------------------------------------------------

def _canonical_board(board: jax.Array, turn: jax.Array) -> jax.Array:
    """Board rotated 180 degrees when Black is to move (mover's perspective)."""
    flipped = board[..., ::-1, ::-1]
    return jnp.where((turn == WHITE)[..., None, None], board, flipped)


def canonical_planes(state: EnvState) -> tuple[jax.Array, jax.Array]:
    """(mine, theirs) boolean planes in the canonical frame."""
    canon = _canonical_board(state.board, state.turn)
    t = state.turn[..., None, None]
    return canon == t, canon == -t


def _shift_fwd(x: jax.Array) -> jax.Array:
    """y[..., r, c] = x[..., r+1, c]; False past the far row."""
    pad = jnp.zeros_like(x[..., :1, :])
    return jnp.concatenate([x[..., 1:, :], pad], axis=-2)


def _shift_col(x: jax.Array, dc: int) -> jax.Array:
    """y[..., r, c] = x[..., r, c+dc]; False outside the board."""
    pad = jnp.zeros_like(x[..., :, :1])
    if dc == -1:
        return jnp.concatenate([pad, x[..., :, :-1]], axis=-1)
    return jnp.concatenate([x[..., :, 1:], pad], axis=-1)


def legal_action_mask(state: EnvState) -> jax.Array:
    """(..., 192) boolean mask over canonical actions.

    Forward needs an empty target; diagonals need a non-own target
    (empty or capture) — reference semantics at game.py:136-148. Terminal
    states report no legal actions.
    """
    mine, theirs = canonical_planes(state)
    empty = ~(mine | theirs)
    # "target not own piece" aligned at the source square; the shift helpers
    # pad with False so off-board targets are automatically illegal.
    open_fwd = _shift_fwd(~mine)

    fwd = mine & _shift_fwd(empty)
    dl = mine & _shift_col(open_fwd, -1)
    dr = mine & _shift_col(open_fwd, +1)

    mask = jnp.stack([fwd, dl, dr], axis=-1)  # (..., 8, 8, 3)
    mask = mask.reshape(mask.shape[:-3] + (NUM_ACTIONS,))
    return mask & ~state.done[..., None]


def num_legal_actions(state: EnvState) -> jax.Array:
    return jnp.sum(legal_action_mask(state), axis=-1)


# -----------------------------------------------------------------------------
# Transition
# -----------------------------------------------------------------------------

def step(state: EnvState, action: jax.Array) -> EnvState:
    """Apply canonical ``action`` (..., int32); no-op on finished games.

    Callers must supply actions drawn from ``legal_action_mask`` — like the
    reference (game.py:156-173), legality is not re-checked here, and an
    illegal action mutates the board nonsensically.

    Mirrors the reference move application and win ordering
    (game.py:156-187): piece moves (captures by overwrite), then win by
    far-row arrival, then win by elimination; finally the mover also wins if
    the opponent is left with no legal reply (game.py:189-215).
    """
    action = action.astype(jnp.int32)
    sq, d = action // 3, action % 3
    r, c = sq // BOARD_SIZE, sq % BOARD_SIZE
    dc = jnp.asarray(_DIR_DCOL, jnp.int32)[d]
    to_r, to_c = r + 1, c + dc

    is_black = state.turn == BLACK

    def to_abs(row, col):
        return (jnp.where(is_black, BOARD_SIZE - 1 - row, row),
                jnp.where(is_black, BOARD_SIZE - 1 - col, col))

    fr_r, fr_c = to_abs(r, c)
    tr_r, tr_c = to_abs(to_r, to_c)
    from_idx = fr_r * BOARD_SIZE + fr_c
    to_idx = tr_r * BOARD_SIZE + tr_c

    flat = state.board.reshape(state.board.shape[:-2] + (NUM_SQUARES,))
    lane = jnp.arange(NUM_SQUARES, dtype=jnp.int32)
    turn_b = state.turn[..., None]
    new_flat = jnp.where(lane == to_idx[..., None], turn_b, flat)
    new_flat = jnp.where(lane == from_idx[..., None], jnp.int8(EMPTY), new_flat)
    new_board = new_flat.reshape(state.board.shape)

    reached_home = to_r == (BOARD_SIZE - 1)  # canonical far row
    opp_alive = jnp.any(new_flat == -turn_b, axis=-1)
    winner = jnp.where(reached_home | ~opp_alive, state.turn, jnp.int8(0))

    new_turn = (-state.turn).astype(jnp.int8)
    moved = EnvState(
        board=new_board,
        turn=new_turn,
        winner=winner.astype(jnp.int8),
        done=winner != 0,
        move_count=state.move_count + 1,
    )

    # Stuck opponent loses (only checked when no winner yet).
    stuck = (moved.winner == 0) & (num_legal_actions(moved) == 0)
    moved = moved.replace(
        winner=jnp.where(stuck, state.turn, moved.winner).astype(jnp.int8),
        done=moved.done | stuck,
    )

    # Freeze finished games: lockstep batches step everything every ply.
    keep = state.done

    def sel(old, new):
        return jnp.where(keep.reshape(keep.shape + (1,) * (new.ndim - keep.ndim)), old, new)

    return EnvState(
        board=sel(state.board, moved.board),
        turn=sel(state.turn, moved.turn),
        winner=sel(state.winner, moved.winner),
        done=keep | moved.done,
        move_count=sel(state.move_count, moved.move_count),
    )


# -----------------------------------------------------------------------------
# Observations and results
# -----------------------------------------------------------------------------

def encoded_state(state: EnvState, dtype=jnp.float32) -> jax.Array:
    """(..., 3, 8, 8) network input planes: mine / theirs / ones
    (reference encoding, game.py:280-307)."""
    mine, theirs = canonical_planes(state)
    ones = jnp.ones_like(mine)
    return jnp.stack([mine, theirs, ones], axis=-3).astype(dtype)


def result_wl(state: EnvState) -> jax.Array:
    """(..., 2) (win, loss) from WHITE's perspective; zeros while in
    progress (game.py:196-215)."""
    w = (state.winner == WHITE).astype(jnp.float32)
    l = (state.winner == BLACK).astype(jnp.float32)
    return jnp.stack([w, l], axis=-1)


def terminal_value_for_player_to_move(state: EnvState) -> jax.Array:
    """Scalar value of a terminal state from the perspective of the player
    whose turn it is (reference convention, mcts.py:328-335)."""
    white_value = (state.winner == WHITE).astype(jnp.float32) - (
        state.winner == BLACK
    ).astype(jnp.float32)
    return jnp.where(state.turn == WHITE, white_value, -white_value)


# -----------------------------------------------------------------------------
# Host-side conversion helpers (web UI / interop)
# -----------------------------------------------------------------------------

def decode_action_to_move(action: int, turn: int) -> tuple[int, int, int, int]:
    """Canonical action -> absolute (from_row, from_col, to_row, to_col)."""
    sq, d = divmod(int(action), 3)
    r, c = divmod(sq, BOARD_SIZE)
    to_r, to_c = r + 1, c + _DIR_DCOL[d]
    if turn == BLACK:
        r, c = BOARD_SIZE - 1 - r, BOARD_SIZE - 1 - c
        to_r, to_c = BOARD_SIZE - 1 - to_r, BOARD_SIZE - 1 - to_c
    return r, c, to_r, to_c


def encode_move_to_action(move: tuple[int, int, int, int], turn: int) -> int:
    """Absolute move -> canonical action index."""
    fr_r, fr_c, to_r, to_c = move
    if turn == BLACK:
        fr_r, fr_c = BOARD_SIZE - 1 - fr_r, BOARD_SIZE - 1 - fr_c
        to_r, to_c = BOARD_SIZE - 1 - to_r, BOARD_SIZE - 1 - to_c
    dc = to_c - fr_c
    d = 0 if dc == 0 else (1 if dc == -1 else 2)
    return (fr_r * BOARD_SIZE + fr_c) * 3 + d
