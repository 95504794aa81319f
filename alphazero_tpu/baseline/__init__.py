"""Classical Breakthrough engine (host-side alpha-beta).

The search recursion is control-flow-heavy and belongs on the host CPU, not
the TPU (SURVEY.md §7). Same capability set as the reference engine
(/root/reference/src/baseline/): bitboard state with Zobrist hashing,
iterative-deepening PVS with transposition table, aspiration windows,
null-move pruning, LMR, killer/history ordering, quiescence; hand-crafted
evaluation.
"""

from alphazero_tpu.baseline.constants import BLACK, SCORE_WIN, WHITE
from alphazero_tpu.baseline.engine import BitboardPosition, evaluate
from alphazero_tpu.baseline.search import Search, TranspositionTable

__all__ = ["BitboardPosition", "Search", "TranspositionTable", "evaluate",
           "WHITE", "BLACK", "SCORE_WIN"]
