"""Strength match: int8 evaluator vs bf16 evaluator, SAME checkpoint.

The decision rule for adopting int8 inference (docs/quant-int8.md) needs
head-to-head strength, not just visit-TV: this plays paired games
(shared random openings, colors swapped — the arena protocol,
arena/match.py) where player A searches with the int8-quantized net and
player B with the production bf16 net, both loaded from one checkpoint.
A 50% score means quantization is strength-neutral at this sim budget.

Usage:
    python scripts/eval_quant_match.py [checkpoint_dir] [pairs] [sims]
    (defaults: /root/run_r3/checkpoints/model_best, 16 pairs = 32 games,
     cfg.num_simulations_inference sims; AZTPU_CPU=1 forces CPU smoke,
     AZTPU_PROBE_BLOCKS/FILTERS shrink the net for it)
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

import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.arena.match import play_paired_matches, random_opening
from alphazero_tpu.models import init_network
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.models.quant import quantize_network, quant_apply, \
    make_quant_evaluator
from alphazero_tpu.search import make_net_evaluator

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/run_r3/checkpoints/model_best"
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SIMS = int(sys.argv[3]) if len(sys.argv) > 3 else None

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

# The flavor that ships is int8-STATIC (docs/quant-int8.md: +9% over
# dynamic on chip, accuracy-equal), so the strength gate defaults to it;
# AZTPU_QUANT_FLAVOR=dynamic selects the per-layer-amax variant.
FLAVOR = os.environ.get("AZTPU_QUANT_FLAVOR", "static")
if FLAVOR == "static":
    from alphazero_tpu.models.quant import calibrate, quantize_network

    _npz = os.path.join(os.path.dirname(CKPT), "training_data.npz")
    if os.path.isdir(CKPT) and os.path.exists(_npz):
        _d = np.load(_npz, mmap_mode="r")
        _ci = np.sort(np.random.RandomState(42).choice(
            len(_d["states"]), 512, replace=False))
        _cal = [jnp.asarray(np.asarray(_d["states"][_ci][i * 256:
                                                         (i + 1) * 256]),
                            jnp.float32) for i in range(2)]
        print(f"calibration: 512 replay positions from {_npz}", flush=True)
    else:
        _cal = [jnp.zeros((256, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)]
        print("calibration: opening positions only (no replay npz)",
              flush=True)
    eval_int8 = make_quant_evaluator(
        net, variables, act_scales=calibrate(quantize_network(
            net, variables), _cal))
else:
    eval_int8 = make_quant_evaluator(net, variables)
print(f"quant flavor: int8-{FLAVOR}", flush=True)


def pair_eval_fn(planes, a_to_move):
    pa, va = eval_int8(planes)
    pb, vb = eval_bf16(planes)
    sel = a_to_move[:, None]
    return jnp.where(sel, pa, pb), jnp.where(a_to_move, va, vb)


rng = random.Random(int(os.environ.get("AZTPU_MATCH_SEED", "2026")))
openings = [random_opening(rng) for _ in range(PAIRS)]
sims = SIMS or cfg.num_simulations_inference
wins_q, wins_f = play_paired_matches(
    net, variables, net, variables, openings, cfg,
    num_simulations=sims, pair_eval_fn=pair_eval_fn)
n = 2 * PAIRS
draws = n - wins_q - wins_f
print(f"int8-{FLAVOR} {wins_q} - {wins_f} bf16 over {n} games at {sims} "
      f"sims ({draws} unfinished); int8 score "
      f"{100 * (wins_q + 0.5 * draws) / n:.1f}%", flush=True)
