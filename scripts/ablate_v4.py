"""Ablate sim-loop stages to find the O(N) per-sim cost."""
import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.env import initial_state
from alphazero_tpu.search import mcts as M

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def triv_eval(planes):
    return (jnp.full((planes.shape[0], 192), 1.0/192, jnp.float32),
            jnp.zeros((planes.shape[0],), jnp.float32))


def run(name, sim_fn, sims):
    spec = M.SearchSpec(num_simulations=sims)

    def prog(states, noise):
        tree = M.init_tree(states, spec)
        policy, _ = triv_eval(env.encoded_state(tree.root_state))
        legal = env.legal_action_mask(tree.root_state)
        vdt = spec.value_dtype
        tree = tree.replace(
            child=tree.child.at[0].set(
                jnp.where(legal, M.UNALLOCATED, M.ILLEGAL).astype(vdt)),
            prior_=tree.prior_.at[0].set(
                M._renorm_priors(policy * (1 + noise), legal, vdt)))
        tree = jax.lax.fori_loop(
            0, sims, lambda i, t: sim_fn(t, spec), tree)
        return M.root_child_visits(tree)

    progj = jax.jit(prog)
    states = initial_state((B,))
    key = jax.random.PRNGKey(0)
    mk = lambda k: jax.random.uniform(k, (B, 192)) * 0.01
    np.asarray(progj(states, mk(key)))
    best = float("inf")
    for r in range(2):
        key, k = jax.random.split(key)
        n = jax.block_until_ready(mk(k))
        t0 = time.time()
        np.asarray(progj(states, n))
        best = min(best, time.time() - t0)
    print(f"{name:28s} sims={sims:4d}: {best:7.3f}s  {best/sims*1e6:8.1f} us/sim",
          flush=True)


def sim_full(tree, spec):
    return M._simulate_once(tree, triv_eval, spec)


def sim_no_backprop(tree, spec):
    B_ = tree.root_visit.shape[0]
    vdt = spec.value_dtype
    s = tree.next_slot
    (child_t, prior_t, visit_t, vsum_t, needs_alloc, depth,
     path_nodes, path_actions) = M._descend(tree, spec)
    leaf_state = M._replay_to_leaf(tree.root_state, path_actions, depth)
    planes = env.encoded_state(leaf_state)
    policy, value = triv_eval(planes)
    legal = env.legal_action_mask(leaf_state)
    priors = M._renorm_priors(policy, legal, vdt)
    do_expand = (needs_alloc & ~leaf_state.done)[:, None]
    child_row = jnp.where(do_expand, jnp.where(legal, M.UNALLOCATED,
                                               M.ILLEGAL), M.ILLEGAL).astype(vdt)
    prior_row = jnp.where(do_expand, priors, 0).astype(vdt)
    z = jnp.zeros_like(s)
    child_t = jax.lax.dynamic_update_slice(child_t, child_row[None], (s, z, z))
    prior_t = jax.lax.dynamic_update_slice(prior_t, prior_row[None], (s, z, z))
    # fake "visits" on root row so descent branches (dense write, no scatter)
    visit_t = visit_t.at[0].add(jnp.ones_like(child_row) * 0.001)
    return tree.replace(child=child_t, prior_=prior_t, visit_=visit_t,
                        vsum=vsum_t,
                        root_visit=tree.root_visit + 1,
                        node_count=tree.node_count + needs_alloc.astype(jnp.int32),
                        next_slot=s + 1)


def sim_no_expand(tree, spec):
    B_ = tree.root_visit.shape[0]
    vdt = spec.value_dtype
    s = tree.next_slot
    (child_t, prior_t, visit_t, vsum_t, needs_alloc, depth,
     path_nodes, path_actions) = M._descend(tree, spec)
    leaf_state = M._replay_to_leaf(tree.root_state, path_actions, depth)
    planes = env.encoded_state(leaf_state)
    policy, value = triv_eval(planes)
    value = value.astype(vdt)
    sign0 = jnp.where(depth % 2 == 1, 1.0, -1.0).astype(vdt)
    max_depth = jnp.max(depth)
    trash = jnp.int32(tree.child.shape[0] - 1)

    def bcond(c):
        return c[0] < max_depth

    def bbody(c):
        d, flip, child_t, visit_t, vsum_t = c
        zz = jnp.zeros_like(d)
        node = jax.lax.dynamic_slice(path_nodes, (zz, d), (B_, 1))[:, 0]
        act = jax.lax.dynamic_slice(path_actions, (zz, d), (B_, 1))[:, 0]
        active = d < depth
        tgt = jnp.where(active, node, trash)
        is_alloc_edge = active & needs_alloc & (d == depth - 1)
        child_t = M._edge_add(child_t, jnp.where(is_alloc_edge, tgt, trash),
                              act, jnp.where(is_alloc_edge,
                                             s.astype(vdt) + 1,
                                             jnp.zeros((), vdt)))
        visit_t = M._edge_add(visit_t, tgt, act, active.astype(vdt))
        vsum_t = M._edge_add(vsum_t, tgt, act,
                             jnp.where(active, sign0 * flip * value,
                                       jnp.zeros((), vdt)))
        return (d + 1, -flip, child_t, visit_t, vsum_t)

    _, _, child_t, visit_t, vsum_t = jax.lax.while_loop(
        bcond, bbody, (jnp.int32(0), jnp.ones((), vdt), child_t, visit_t,
                       vsum_t))
    return tree.replace(child=child_t, prior_=prior_t, visit_=visit_t,
                        vsum=vsum_t, root_visit=tree.root_visit + 1,
                        next_slot=s + 1)


def sim_descend_only(tree, spec):
    (child_t, prior_t, visit_t, vsum_t, needs_alloc, depth,
     path_nodes, path_actions) = M._descend(tree, spec)
    return tree.replace(child=child_t, prior_=prior_t, visit_=visit_t,
                        vsum=vsum_t,
                        root_visit=tree.root_visit + 1 + depth * 0,
                        next_slot=tree.next_slot + 1)


for sims in (100, 800):
    run("descend only", sim_descend_only, sims)
for sims in (100, 800):
    run("no backprop (desc+expand)", sim_no_backprop, sims)
for sims in (100, 800):
    run("no expand (desc+backprop)", sim_no_expand, sims)
for sims in (100, 800):
    run("FULL", sim_full, sims)
