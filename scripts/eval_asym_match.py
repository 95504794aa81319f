"""Equal-COMPUTE strength gate: int8-static at MORE sims vs bf16.

The equal-sims gate (scripts/eval_quant_match.py) measures quantization's
strength cost at a fixed node budget, but the production question is
strength per wall-second: int8-static searches ~1.5x more sims in the
same time (docs/quant-int8.md, docs/logs/r5/probe_quant.log: 277.7k vs
183.3k sims/s). This plays paired color-swapped games where player A
searches with the int8 evaluator at ``sims_a`` and player B with the
bf16 evaluator at ``sims_b`` — set sims_a/sims_b to the measured speed
ratio and the two players spend the SAME wall-clock per move. A >=50%
int8 score then means int8 is strictly better at any fixed time budget.

Unlike the arena's fused dual-net program, asymmetric sim counts need
two separate search programs (sims is a static loop bound); each ply
runs both on the full batch and selects per-lane by side-to-move — 2x
the eval compute, irrelevant for a strength measurement.

Usage:
    python scripts/eval_asym_match.py [checkpoint_dir] [pairs] \
        [sims_a] [sims_b]
    (defaults: 16 pairs = 32 games, 300 vs 200 sims;
     AZTPU_MATCH_SEED for the opening seed, AZTPU_CPU=1 +
     AZTPU_PROBE_BLOCKS/FILTERS for a CPU smoke)
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("AZTPU_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np

from alphazero_tpu.arena.match import random_opening
from alphazero_tpu.config import Config
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.models import init_network
from alphazero_tpu.models.quant import (
    calibrate,
    make_quant_evaluator,
    quantize_network,
)
from alphazero_tpu.search import (
    SearchSpec,
    make_net_evaluator,
    root_action_probs,
    search,
)

CKPT = sys.argv[1] if len(sys.argv) > 1 else "run_r5/checkpoints/iteration_101"
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SIMS_A = int(sys.argv[3]) if len(sys.argv) > 3 else 300
SIMS_B = int(sys.argv[4]) if len(sys.argv) > 4 else 200

cfg = Config(num_blocks=int(os.environ.get("AZTPU_PROBE_BLOCKS", "20")),
             num_filters=int(os.environ.get("AZTPU_PROBE_FILTERS", "128")))
if os.path.isdir(CKPT):
    from alphazero_tpu.arena.runner import load_model_variables
    net, variables = load_model_variables(
        cfg.replace(checkpoint_dir=os.path.dirname(CKPT)), CKPT)
    print(f"checkpoint: {CKPT}", flush=True)
else:
    net, variables = init_network(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    print("checkpoint not found -> random init (smoke only)", flush=True)

eval_bf16 = make_net_evaluator(net, variables, dtype=jnp.float32)

_npz = os.path.join(os.path.dirname(CKPT), "training_data.npz")
if os.path.isdir(CKPT) and os.path.exists(_npz):
    _d = np.load(_npz, mmap_mode="r")
    _ci = np.sort(np.random.RandomState(42).choice(
        len(_d["states"]), 512, replace=False))
    _cal = [jnp.asarray(np.asarray(_d["states"][_ci][i * 256:(i + 1) * 256]),
                        jnp.float32) for i in range(2)]
    print(f"calibration: 512 replay positions from {_npz}", flush=True)
else:
    _cal = [jnp.zeros((256, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)]
    print("calibration: opening positions only (no replay npz)", flush=True)
eval_int8 = make_quant_evaluator(
    net, variables,
    act_scales=calibrate(quantize_network(net, variables), _cal))


def spec_for(sims):
    return SearchSpec(num_simulations=sims, c_puct=cfg.c_puct,
                      fpu_reduction=cfg.fpu_reduction)


@functools.partial(jax.jit, static_argnames=("ev_a", "ev_b", "sp_a", "sp_b"))
def asym_move(states, a_is_white, ev_a, ev_b, sp_a, sp_b):
    """One greedy lockstep move: side A's and side B's search programs
    both run on the full batch; the action is selected per-lane by
    side-to-move (arena/match.py:_match_move, asymmetric-budget twin)."""
    a_to_move = jnp.where(states.turn == env.WHITE, a_is_white, ~a_is_white)
    acts_a = jnp.argmax(root_action_probs(
        search(states, ev_a, sp_a), 0.0), -1).astype(jnp.int32)
    acts_b = jnp.argmax(root_action_probs(
        search(states, ev_b, sp_b), 0.0), -1).astype(jnp.int32)
    return env.step(states, jnp.where(a_to_move, acts_a, acts_b))


rng = random.Random(int(os.environ.get("AZTPU_MATCH_SEED", "2026")))
openings = [random_opening(rng) for _ in range(PAIRS)]
B = 2 * len(openings)
boards = np.stack([g.board for g in openings for _ in range(2)])
turns = np.asarray([g.turn for g in openings for _ in range(2)], np.int8)
states = env.EnvState(
    board=jnp.asarray(boards, jnp.int8),
    turn=jnp.asarray(turns),
    winner=jnp.zeros((B,), jnp.int8),
    done=jnp.zeros((B,), jnp.bool_),
    move_count=jnp.zeros((B,), jnp.int32),
)
a_is_white = jnp.asarray([i % 2 == 0 for i in range(B)])

for _ in range(cfg.max_game_length):
    if bool(np.all(np.asarray(states.done))):
        break
    states = asym_move(states, a_is_white, eval_int8, eval_bf16,
                       spec_for(SIMS_A), spec_for(SIMS_B))

winners = np.asarray(states.winner)
aw = np.asarray(a_is_white)
wins_a = int(np.where(aw, winners == env.WHITE, winners == env.BLACK).sum())
wins_b = int(np.where(aw, winners == env.BLACK, winners == env.WHITE).sum())
draws = B - wins_a - wins_b
print(f"int8-static@{SIMS_A} {wins_a} - {wins_b} bf16@{SIMS_B} over {B} "
      f"games ({draws} unfinished); int8 equal-compute score "
      f"{100 * (wins_a + 0.5 * draws) / B:.1f}%", flush=True)
