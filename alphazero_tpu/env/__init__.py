from alphazero_tpu.env.breakthrough import (
    BLACK,
    BOARD_SIZE,
    EMPTY,
    NUM_ACTIONS,
    NUM_PLANES,
    WHITE,
    EnvState,
    encoded_state,
    initial_state,
    legal_action_mask,
    num_legal_actions,
    result_wl,
    step,
    terminal_value_for_player_to_move,
)
from alphazero_tpu.env.oracle import OracleGame

__all__ = [
    "BLACK", "BOARD_SIZE", "EMPTY", "NUM_ACTIONS", "NUM_PLANES", "WHITE",
    "EnvState", "encoded_state", "initial_state", "legal_action_mask",
    "num_legal_actions", "result_wl", "step",
    "terminal_value_for_player_to_move", "OracleGame",
]
