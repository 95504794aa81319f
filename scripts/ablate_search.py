"""Ablation study of the MCTS simulation loop on TPU.

Builds variants of _simulate_once with stages disabled to locate the cost.
"""
import functools
import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.env import initial_state
from alphazero_tpu.search import mcts as M

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 800

spec = M.SearchSpec(num_simulations=SIMS)
states = initial_state((B,))


def triv_eval(planes):
    pol = jnp.full((planes.shape[0], 192), 1.0 / 192, jnp.float32)
    return pol, jnp.zeros((planes.shape[0],), jnp.float32)


def run_variant(name, sim_fn):
    @jax.jit
    def prog(states):
        tree = M.init_tree(states, spec)
        root_state = M._gather_states(tree.states,
                                      jnp.zeros_like(tree.node_count))
        policy, _ = triv_eval(env.encoded_state(root_state))
        tree = jax.vmap(functools.partial(M._expand, spec=spec))(
            tree, jnp.zeros_like(tree.node_count), policy,
            ~root_state.done)
        tree = jax.lax.fori_loop(0, SIMS, lambda i, t: sim_fn(t), tree)
        return M.root_child_visits(tree)

    jax.block_until_ready(prog(states))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(prog(states))
        best = min(best, time.time() - t0)
    print(f"{name:35s} {best:7.3f}s  {best/SIMS*1e3:7.3f} ms/sim", flush=True)


# ---- full (baseline) --------------------------------------------------------
def sim_full(tree):
    return M._simulate_once(tree, triv_eval, spec)

# ---- select only ------------------------------------------------------------
def sim_select(tree):
    leaf0, parent, action, needs_alloc = jax.vmap(
        functools.partial(M._select_leaf, spec=spec))(tree)
    # touch outputs so nothing is DCE'd; tiny fake update to visit
    return tree.replace(
        visit=tree.visit.at[:, 0].add(
            (leaf0 + parent + action + needs_alloc).astype(jnp.int32) * 0 + 1))

# ---- select + alloc ---------------------------------------------------------
def sim_alloc(tree):
    leaf0, parent, action, needs_alloc = jax.vmap(
        functools.partial(M._select_leaf, spec=spec))(tree)
    tree, new_idx = jax.vmap(M._alloc_node)(tree, parent, action, needs_alloc)
    return tree.replace(
        visit=tree.visit.at[:, 0].add(new_idx.astype(jnp.int32) * 0 + 1))

# ---- select + alloc + eval + expand (no backprop) ---------------------------
def sim_expand(tree):
    leaf0, parent, action, needs_alloc = jax.vmap(
        functools.partial(M._select_leaf, spec=spec))(tree)
    tree, new_idx = jax.vmap(M._alloc_node)(tree, parent, action, needs_alloc)
    leaf = jnp.where(needs_alloc, new_idx, leaf0)
    leaf_states = M._gather_states(tree.states, leaf)
    policy, value = triv_eval(env.encoded_state(leaf_states))
    tree = jax.vmap(functools.partial(M._expand, spec=spec))(
        tree, leaf, policy, ~leaf_states.done)
    # minimal visit bump so select descends like real search (roughly)
    return tree.replace(visit=tree.visit.at[:, 0].add(1))

# ---- full minus select: descent replaced by "always root" -------------------
def sim_noselect(tree):
    Bn = tree.visit.shape[0]
    leaf = jnp.zeros((Bn,), jnp.int32)
    value = jnp.zeros((Bn,), jnp.float32)
    tree = jax.vmap(functools.partial(M._backprop, spec=spec))(
        tree, leaf, value)
    return tree

run_variant("select only", sim_select)
run_variant("select+alloc", sim_alloc)
run_variant("select+alloc+eval+expand", sim_expand)
run_variant("backprop only (root)", sim_noselect)
run_variant("FULL", sim_full)
