"""Measure lockstep max descent depth per simulation with the real net."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import initial_state
from alphazero_tpu.models import init_network
from alphazero_tpu.search import mcts as M
from alphazero_tpu.search import make_net_evaluator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 800

cfg = Config(num_simulations=SIMS)
net, variables = init_network(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
eval_fn = make_net_evaluator(net, variables, dtype=jnp.float32)
spec = M.SearchSpec(num_simulations=SIMS)

states = initial_state((B,))


@jax.jit
def run(states, rng):
    tree = M.init_tree(states, spec)
    # root expansion (copy of search() preamble)
    from alphazero_tpu.env import breakthrough as env
    root_state = tree.root_state
    policy, _ = eval_fn(env.encoded_state(root_state))
    legal = env.legal_action_mask(root_state)
    vdt = spec.value_dtype
    A = spec.num_actions
    child_row = jnp.where(legal, M.UNALLOCATED, M.ILLEGAL).astype(vdt)
    prior_row = M._renorm_priors(policy, legal, vdt)
    Bq = legal.shape[0]
    tree = tree.replace(rows=tree.rows.at[:, 0, :2 * A // 128].set(
        jnp.concatenate([child_row, prior_row], axis=-1).reshape(
            Bq, 2 * A // 128, 128)))
    tree = M._add_root_noise(tree, rng, spec)

    def body(i, carry):
        tree, dmax, dmean = carry
        (_, _, needs_alloc, depth, pn, pa) = M._descend(
            tree.rows, tree.root_state, tree.root_visit, spec)
        dmax = jax.lax.dynamic_update_slice(
            dmax, jnp.max(depth)[None], (i,))
        dmean = jax.lax.dynamic_update_slice(
            dmean, jnp.mean(depth.astype(jnp.float32))[None], (i,))
        # redo the rest of the sim via the real helper (recompute descent
        # inside — fine for instrumentation accuracy of depth only)
        tree = M._simulate_once(tree, eval_fn, spec)
        return tree, dmax, dmean

    dmax0 = jnp.zeros((SIMS,), jnp.int32)
    dmean0 = jnp.zeros((SIMS,), jnp.float32)
    tree, dmax, dmean = jax.lax.fori_loop(
        0, SIMS, body, (tree, dmax0, dmean0))
    return dmax, dmean


t0 = time.time()
dmax, dmean = jax.block_until_ready(run(states, jax.random.PRNGKey(1)))
print(f"ran in {time.time()-t0:.1f}s (includes double descent)")
dmax = np.asarray(dmax)
dmean = np.asarray(dmean)
for lo in range(0, SIMS, 100):
    hi = min(lo + 100, SIMS)
    print(f"sims {lo:4d}-{hi:4d}: max-depth mean {dmax[lo:hi].mean():6.1f} "
          f"p95 {np.percentile(dmax[lo:hi], 95):6.1f} "
          f"| per-game mean depth {dmean[lo:hi].mean():5.1f}")
print(f"overall: lockstep max-depth mean {dmax.mean():.1f}, "
      f"game-mean depth {dmean.mean():.1f}")
