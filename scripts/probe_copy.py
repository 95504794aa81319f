"""Probe whether per-sim cost scales with tree capacity (copy hypothesis)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from alphazero_tpu.env import initial_state
from alphazero_tpu.search import mcts as M
from alphazero_tpu.search import search

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def triv_eval(planes):
    pol = jnp.full((planes.shape[0], 192), 1.0 / 192, jnp.float32)
    return pol, jnp.zeros((planes.shape[0],), jnp.float32)


states = initial_state((B,))
for sims in (100, 200, 400, 800):
    spec = M.SearchSpec(num_simulations=sims)

    @jax.jit
    def prog(states, noise):
        tree = search(states, triv_eval, spec, root_noise=noise)
        return M.root_child_visits(tree)

    key = jax.random.PRNGKey(0)
    def mknoise(k):
        g = jax.random.uniform(k, (B, 192))
        return g / g.sum(-1, keepdims=True)

    import numpy as np
    np.asarray(prog(states, mknoise(key)))
    best = float("inf")
    for r in range(2):
        key, k = jax.random.split(key)
        n = jax.block_until_ready(mknoise(k))
        t0 = time.time()
        np.asarray(prog(states, n))
        best = min(best, time.time() - t0)
    print(f"sims={sims:4d}: {best:7.3f}s total, {best/sims*1e6:8.1f} us/sim",
          flush=True)
