"""Profile split: NN eval time vs tree-op time per simulation on TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from alphazero_tpu.config import Config
from alphazero_tpu.env import initial_state, encoded_state, legal_action_mask
from alphazero_tpu.models import init_network
from alphazero_tpu.search import SearchSpec, make_net_evaluator, search
from alphazero_tpu.search.mcts import root_action_probs

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 800


def log(*a):
    print(*a, flush=True)


cfg = Config(num_simulations=SIMS)
net, variables = init_network(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
eval_fn = make_net_evaluator(net, variables, dtype=jnp.float32)
spec = SearchSpec(num_simulations=SIMS, c_puct=cfg.c_puct,
                  dirichlet_alpha=cfg.dirichlet_alpha,
                  dirichlet_epsilon=cfg.dirichlet_epsilon)

states = initial_state((B,))
planes0 = encoded_state(states)
log(f"device={jax.devices()[0]} B={B} sims={SIMS}")

# --- 1. NN-only loop: SIMS sequential evals -------------------------------
@jax.jit
def nn_loop(planes):
    def body(i, p):
        pol, val = eval_fn(p)
        # dependency chain to prevent folding
        return p + (val[:, None, None, None] * 0).astype(p.dtype)
    return jax.lax.fori_loop(0, SIMS, body, planes)

t0 = time.time(); jax.block_until_ready(nn_loop(planes0))
log(f"nn_loop compile+run: {time.time()-t0:.1f}s")
for _ in range(2):
    t0 = time.time(); jax.block_until_ready(nn_loop(planes0))
    dt = time.time()-t0
    log(f"nn_loop: {dt:.3f}s -> {B*SIMS/dt:,.0f} evals/s ({dt/SIMS*1e3:.3f} ms/eval)")

# --- 2. tree-only search: trivial evaluator --------------------------------
def triv_eval(planes):
    pol = jnp.full((planes.shape[0], 192), 1.0/192, jnp.float32)
    return pol, jnp.zeros((planes.shape[0],), jnp.float32)

@jax.jit
def tree_only(states, rng):
    tree = search(states, triv_eval, spec, rng=rng, add_noise=True)
    return root_action_probs(tree, jnp.float32(1.0))

rng = jax.random.PRNGKey(1)
t0 = time.time(); jax.block_until_ready(tree_only(states, rng))
log(f"tree_only compile+run: {time.time()-t0:.1f}s")
for _ in range(2):
    t0 = time.time(); jax.block_until_ready(tree_only(states, rng))
    dt = time.time()-t0
    log(f"tree_only: {dt:.3f}s -> {B*SIMS/dt:,.0f} sims/s ({dt/SIMS*1e3:.3f} ms/sim)")

# --- 3. full search ---------------------------------------------------------
@jax.jit
def full(states, rng):
    tree = search(states, eval_fn, spec, rng=rng, add_noise=True)
    return root_action_probs(tree, jnp.float32(1.0))

t0 = time.time(); jax.block_until_ready(full(states, rng))
log(f"full compile+run: {time.time()-t0:.1f}s")
for _ in range(2):
    t0 = time.time(); jax.block_until_ready(full(states, rng))
    dt = time.time()-t0
    log(f"full: {dt:.3f}s -> {B*SIMS/dt:,.0f} sims/s ({dt/SIMS*1e3:.3f} ms/sim)")
