"""TPU probe: Tree.value_dtype — f32 vs 16-bit tree rows (VERDICT r2 #6).

The tree is the dominant non-param HBM consumer (512 games x 801 slots x
768 floats ~= 1.26 GB at f32) and its DMA traffic sets the tree-op cost
floor, so a 16-bit tree halves the bytes. But the fused row stores CHILD
POINTERS and VISIT COUNTS as floats of the same dtype:

- bfloat16 represents integers exactly only up to 256 -> at 800 sims both
  counters and pointers corrupt (an 800-sim search literally cannot count
  past 256). Expected INVALID; this probe measures the corruption.
- float16 is exact up to 2048 -> valid for <=2047-slot trees and <=2048
  visits per edge. The risk is vsum precision (ulp 0.25-0.5 at the root's
  few-hundred magnitude), measured here as policy-target TV vs f32.

Protocol: 512 games; positions = starts + 8 plies of f32-search play; for
each dtype run an 800-sim noiseless search on the same positions, check
visit-sum validity, compare visit distributions to the f32 arm (TV,
argmax agreement), and time 5 selfplay moves (800 sims, with noise).

Usage: python scripts/probe_value_dtype.py [games] [sims]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import initial_state
from alphazero_tpu.models import init_network
from alphazero_tpu.search import SearchSpec, make_net_evaluator, search
from alphazero_tpu.search.mcts import root_child_visits
from alphazero_tpu.train.selfplay import selfplay_move

GAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 800
# AZTPU_SCAN=1: scanned tower -> ~14x faster cold compiles for the dtype
# sweep; relative dtype deltas carry over (tree ops are outside the net).
SCAN = os.environ.get("AZTPU_SCAN", "0") == "1"

cfg = Config(num_simulations=SIMS, scan_blocks=SCAN)
net, variables = init_network(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16)
eval_fn = make_net_evaluator(net, variables, dtype=jnp.float32)


def spec_for(dtype):
    return SearchSpec(num_simulations=SIMS, c_puct=cfg.c_puct,
                      fpu_reduction=cfg.fpu_reduction,
                      dirichlet_alpha=cfg.dirichlet_alpha,
                      dirichlet_epsilon=cfg.dirichlet_epsilon,
                      value_dtype=dtype)


# --- fixed mid-game positions (f32 search, deterministic) -----------------
states = initial_state((GAMES,))
rng = jax.random.PRNGKey(7)
spec32 = spec_for(jnp.float32)
for _ in range(8):
    rng, k = jax.random.split(rng)
    states, *_ = selfplay_move(states, k, eval_fn, spec32,
                               cfg.temperature_threshold)
np.asarray(states.turn)
print(f"positions ready: {GAMES} games, 8 plies in", flush=True)

results = {}
for name, dtype in [("float32", jnp.float32), ("float16", jnp.float16),
                    ("bfloat16", jnp.bfloat16)]:
    spec = spec_for(dtype)
    try:
        # quality arm: noiseless search on the fixed positions
        tree = jax.jit(lambda s: root_child_visits(
            search(s, eval_fn, spec_for(dtype))))(states)
        visits = np.asarray(tree, np.int64)
        visit_sum = visits.sum(-1)
        valid = float((visit_sum == SIMS).mean())

        # perf arm: selfplay moves with noise (the bench program)
        cur, r2 = states, jax.random.PRNGKey(11)
        t0 = time.time()
        cur2, *_, actions, _ = selfplay_move(cur, r2, eval_fn, spec,
                                             cfg.temperature_threshold)
        np.asarray(actions)
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(4):
            r2, k = jax.random.split(r2)
            t0 = time.time()
            cur, *_, actions, _ = selfplay_move(cur, k, eval_fn, spec,
                                                cfg.temperature_threshold)
            np.asarray(actions)
            best = min(best, time.time() - t0)
        sims_s = GAMES * SIMS / best
        results[name] = dict(visits=visits, valid_frac=valid,
                             sims_per_sec=sims_s, compile_s=compile_s)
        print(f"{name}: valid(visit-sum=={SIMS}) {100*valid:.1f}% | "
              f"{sims_s:,.0f} sims/s (compile {compile_s:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        results[name] = dict(error=repr(e))
        print(f"{name}: FAILED {e!r}", flush=True)

ref = results.get("float32", {}).get("visits")
if ref is not None:
    p_ref = ref / np.maximum(ref.sum(-1, keepdims=True), 1)
    for name in ("float16", "bfloat16"):
        v = results.get(name, {}).get("visits")
        if v is None:
            continue
        p = v / np.maximum(v.sum(-1, keepdims=True), 1)
        tv = 0.5 * np.abs(p - p_ref).sum(-1)
        agree = (p.argmax(-1) == p_ref.argmax(-1)).mean()
        print(f"{name} vs float32: mean TV {tv.mean():.4f} "
              f"(p95 {np.percentile(tv, 95):.4f}), "
              f"argmax agreement {100*agree:.1f}%", flush=True)
