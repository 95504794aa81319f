"""Batched on-device MCTS (PUCT) for TPU.

A from-scratch re-design of the reference's dict-of-Nodes search
(/root/reference/src/mcts.py) as fixed-size arrays + XLA control flow, so an
entire N-simulation search over thousands of games compiles to ONE program:

- Tree = struct-of-arrays with a static node capacity (num_sims + 1); node 0
  is the root, children slots are materialized lazily on first traversal.
- Each simulation: (1) per-game PUCT descent (pure ``while_loop``, vmapped),
  (2) one fused batched network evaluation of all leaves (the MXU hot path),
  (3) expansion + backprop along parent pointers.
- The environment is stepped exactly once per new node, from the parent's
  stored state.

Search semantics reproduce the reference contract exactly
(SURVEY.md §2 quirks 1-7):

- FPU disabled: unvisited children get q = 0            (mcts.py:294-298)
- u = c_puct * prior * sqrt(max(1, N_parent))/(1+N_child) (mcts.py:288,304)
- priors renormalized over legal actions, uniform fallback (mcts.py:273-279)
- value sign flips every ply; terminal values are computed for the player to
  move at the terminal node                             (mcts.py:328-342)
- Dirichlet noise mixes into root priors on every search call when enabled,
  including reused roots                                (mcts.py:141-144,314-326)
- root expansion before the first simulation does not count a visit

Tie-breaking: scores tie-break to the lowest action index (``argmax``
first-max). The reference iterates children in dict-insertion order, which is
ascending action order for White but descending-square order for Black
(game.py:117-148); on exact float ties for Black the two can differ. Ties
have measure zero with real-network priors; visit-count parity is asserted
against a float64 oracle in tests.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.env import breakthrough as env

Evaluator = Callable[..., Tuple[jax.Array, jax.Array]]
# eval_fn(planes (B,3,8,8) f32[, ctx]) -> (policy_probs (B,192) f32,
# value (B,) f32). ``ctx`` is an optional per-game pytree (row-aligned with
# the batch) for evaluators that dispatch per game — e.g. arena matches
# where each game's searching player uses a different network.

NO_CHILD = jnp.int32(-1)
NO_PARENT = jnp.int32(-1)


@struct.dataclass
class SearchSpec:
    """Static search hyperparameters (jit-hashable)."""

    num_simulations: int = struct.field(pytree_node=False, default=400)
    num_actions: int = struct.field(pytree_node=False, default=192)
    c_puct: float = struct.field(pytree_node=False, default=1.5)
    dirichlet_alpha: float = struct.field(pytree_node=False, default=0.35)
    dirichlet_epsilon: float = struct.field(pytree_node=False, default=0.25)
    value_dtype: jnp.dtype = struct.field(pytree_node=False,
                                          default=jnp.float32)

    @property
    def capacity(self) -> int:
        return self.num_simulations + 1


@struct.dataclass
class Tree:
    """Batched search tree; leading dim B games, N = capacity nodes.

    visit:         (B, N) int32   node visit counts
    value_sum:     (B, N) value_dtype   sum of backed-up values (node POV)
    prior:         (B, N, A)      priors assigned to each node's children
    children:      (B, N, A) int32 child slot per action (-1 until created)
    parent:        (B, N) int32   parent slot (-1 for root)
    expanded:      (B, N) bool    node has priors (was evaluated)
    node_count:    (B,) int32     next free slot
    states:        EnvState with batch shape (B, N)
    """

    visit: jax.Array
    value_sum: jax.Array
    prior: jax.Array
    children: jax.Array
    parent: jax.Array
    expanded: jax.Array
    node_count: jax.Array
    states: env.EnvState


def init_tree(root_states: env.EnvState, spec: SearchSpec) -> Tree:
    """Fresh tree batch with the given root states at slot 0."""
    B = root_states.turn.shape[0]
    N, A = spec.capacity, spec.num_actions

    def tile(x):
        return jnp.broadcast_to(
            x[:, None, ...], (B, N) + x.shape[1:]
        ).astype(x.dtype)

    # Every slot starts as a copy of the root state; allocation overwrites.
    states = jax.tree_util.tree_map(tile, root_states)
    return Tree(
        visit=jnp.zeros((B, N), jnp.int32),
        value_sum=jnp.zeros((B, N), spec.value_dtype),
        prior=jnp.zeros((B, N, A), spec.value_dtype),
        children=jnp.full((B, N, A), NO_CHILD, jnp.int32),
        parent=jnp.full((B, N), NO_PARENT, jnp.int32),
        expanded=jnp.zeros((B, N), jnp.bool_),
        node_count=jnp.ones((B,), jnp.int32),
        states=states,
    )


# -----------------------------------------------------------------------------
# PUCT selection
# -----------------------------------------------------------------------------

def _puct_scores(tree_b: Tree, node: jax.Array, spec: SearchSpec) -> jax.Array:
    """(A,) PUCT scores of one node in one game; illegal actions -> -inf."""
    vdt = spec.value_dtype
    child = tree_b.children[node]                      # (A,)
    has_child = child != NO_CHILD
    safe = jnp.where(has_child, child, 0)
    c_visit = jnp.where(has_child, tree_b.visit[safe], 0)
    c_sum = jnp.where(has_child, tree_b.value_sum[safe],
                      jnp.zeros((), vdt))

    visited = c_visit > 0
    # q from the parent's perspective; unvisited q = 0 (FPU disabled)
    q = jnp.where(visited, -c_sum / jnp.maximum(c_visit, 1).astype(vdt),
                  jnp.zeros((), vdt))
    sqrt_parent = jnp.sqrt(jnp.maximum(tree_b.visit[node], 1).astype(vdt))
    # Evaluation order is load-bearing for bit-exact parity tests: combine
    # the scalars first — XLA reassociates c*(prior*sqrt) into this form
    # anyway, and the host oracle mirrors it.
    cs = jnp.asarray(spec.c_puct, vdt) * sqrt_parent
    u = tree_b.prior[node] * cs / (1 + c_visit).astype(vdt)

    legal = env.legal_action_mask(
        jax.tree_util.tree_map(lambda x: x[node], tree_b.states))
    return jnp.where(legal, q + u, jnp.asarray(-jnp.inf, vdt))


def _select_leaf(tree_b: Tree, spec: SearchSpec):
    """Descend one game's tree to a frontier.

    Returns (leaf, parent, action, needs_alloc):
      - needs_alloc: the walk hit a never-traversed edge (parent, action);
        a node must be allocated there. ``leaf`` is undefined in that case.
      - otherwise ``leaf`` is an existing node that is terminal or
        unexpanded; evaluate/backprop it directly.
    """
    def cond(c):
        return ~c[1]

    def body(c):
        cur, _, _, _, _ = c
        live = tree_b.expanded[cur] & ~tree_b.states.done[cur]
        a = jnp.argmax(_puct_scores(tree_b, cur, spec)).astype(jnp.int32)
        child = tree_b.children[cur, a]
        needs_alloc = live & (child == NO_CHILD)
        stop = ~live | needs_alloc
        nxt = jnp.where(live & (child != NO_CHILD), child, cur)
        return (nxt, stop,
                jnp.where(needs_alloc, cur, NO_PARENT),
                jnp.where(needs_alloc, a, jnp.int32(0)),
                needs_alloc)

    init = (jnp.int32(0), jnp.bool_(False), NO_PARENT, jnp.int32(0),
            jnp.bool_(False))
    cur, _, parent, action, needs_alloc = jax.lax.while_loop(cond, body, init)
    return cur, parent, action, needs_alloc


# -----------------------------------------------------------------------------
# Expansion / backprop (per game, vmapped)
# -----------------------------------------------------------------------------

def _alloc_node(tree_b: Tree, parent: jax.Array, action: jax.Array,
                needs_alloc: jax.Array) -> Tuple[Tree, jax.Array]:
    """Materialize the child at (parent, action) in one game's tree."""
    new_idx = tree_b.node_count[0] if tree_b.node_count.ndim else tree_b.node_count
    parent_state = jax.tree_util.tree_map(
        lambda x: x[parent], tree_b.states)
    child_state = env.step(parent_state, action)

    def write(old_leaf, new_leaf):
        return old_leaf.at[new_idx].set(
            jnp.where(needs_alloc, new_leaf, old_leaf[new_idx]))

    states = jax.tree_util.tree_map(write, tree_b.states, child_state)
    children = tree_b.children.at[parent, action].set(
        jnp.where(needs_alloc, new_idx, tree_b.children[parent, action]))
    return tree_b.replace(
        states=states,
        children=children,
        parent=tree_b.parent.at[new_idx].set(
            jnp.where(needs_alloc, parent, tree_b.parent[new_idx])),
        node_count=tree_b.node_count + needs_alloc.astype(jnp.int32),
    ), new_idx


def _expand(tree_b: Tree, leaf: jax.Array, policy: jax.Array,
            do_expand: jax.Array, spec: SearchSpec) -> Tree:
    """Set a leaf's child priors: policy masked to legal actions and
    renormalized; uniform fallback when the legal mass is zero."""
    vdt = spec.value_dtype
    leaf_state = jax.tree_util.tree_map(lambda x: x[leaf], tree_b.states)
    legal = env.legal_action_mask(leaf_state)
    masked = jnp.where(legal, policy.astype(vdt), jnp.zeros((), vdt))
    total = masked.sum()
    n_legal = jnp.maximum(legal.sum(), 1).astype(vdt)
    priors = jnp.where(total > 0,
                       masked / jnp.maximum(total, jnp.asarray(1e-30, vdt)),
                       legal.astype(vdt) / n_legal)
    return tree_b.replace(
        prior=tree_b.prior.at[leaf].set(
            jnp.where(do_expand, priors, tree_b.prior[leaf])),
        expanded=tree_b.expanded.at[leaf].set(
            tree_b.expanded[leaf] | do_expand),
    )


def _backprop(tree_b: Tree, leaf: jax.Array, value: jax.Array,
              spec: SearchSpec) -> Tree:
    """Add ``value`` (leaf mover's POV) up the parent chain, flipping sign
    each ply (reference mcts.py:337-342)."""
    def cond(c):
        return c[0] != NO_PARENT

    def body(c):
        node, v, visit, vsum = c
        visit = visit.at[node].add(1)
        vsum = vsum.at[node].add(v)
        return (tree_b.parent[node], -v, visit, vsum)

    _, _, visit, vsum = jax.lax.while_loop(
        cond, body,
        (leaf, value.astype(spec.value_dtype), tree_b.visit,
         tree_b.value_sum))
    return tree_b.replace(visit=visit, value_sum=vsum)


# -----------------------------------------------------------------------------
# Top-level search
# -----------------------------------------------------------------------------

def _gather_states(states: env.EnvState, idx: jax.Array) -> env.EnvState:
    """states[b, idx[b]] -> batch EnvState."""
    return jax.tree_util.tree_map(
        lambda x: jax.vmap(lambda xb, ib: xb[ib])(x, idx), states)


def _simulate_once(tree: Tree, eval_fn: Evaluator, spec: SearchSpec,
                   eval_ctx=None) -> Tree:
    # (1) selection — per game
    leaf0, parent, action, needs_alloc = jax.vmap(
        functools.partial(_select_leaf, spec=spec))(tree)

    # (2) allocate new frontier nodes
    tree, new_idx = jax.vmap(_alloc_node)(tree, parent, action, needs_alloc)
    leaf = jnp.where(needs_alloc, new_idx, leaf0)

    # (3) one batched evaluation of all leaves (the MXU step)
    leaf_states = _gather_states(tree.states, leaf)
    planes = env.encoded_state(leaf_states)
    policy, value = (eval_fn(planes) if eval_ctx is None
                     else eval_fn(planes, eval_ctx))
    is_term = leaf_states.done
    value = jnp.where(
        is_term, env.terminal_value_for_player_to_move(leaf_states),
        value.astype(jnp.float32))

    # (4) expand non-terminal leaves, then backprop
    tree = jax.vmap(functools.partial(_expand, spec=spec))(
        tree, leaf, policy, ~is_term)
    tree = jax.vmap(functools.partial(_backprop, spec=spec))(
        tree, leaf, value)
    return tree


def search(
    root_states: env.EnvState,
    eval_fn: Evaluator,
    spec: SearchSpec,
    rng: jax.Array | None = None,
    add_noise: bool = False,
    tree: Tree | None = None,
    root_noise: jax.Array | None = None,
    eval_ctx=None,
) -> Tree:
    """Run ``spec.num_simulations`` simulations for a batch of games.

    Equivalent to the reference's ``MCTS.search_batch`` (mcts.py:94-189)
    from fresh roots. ``eval_fn`` receives encoded planes and returns
    (policy_probs, scalar value) — inject a network or a test evaluator.
    ``root_noise`` (B, A) overrides on-device Dirichlet sampling (tests).
    """
    if tree is None:
        tree = init_tree(root_states, spec)

    # Root expansion (does not count a visit — mcts.py:128-138).
    root_state = _gather_states(tree.states, jnp.zeros_like(tree.node_count))
    root_planes = env.encoded_state(root_state)
    policy, _ = (eval_fn(root_planes) if eval_ctx is None
                 else eval_fn(root_planes, eval_ctx))
    need_root = ~tree.expanded[:, 0] & ~root_state.done
    tree = jax.vmap(functools.partial(_expand, spec=spec))(
        tree, jnp.zeros_like(tree.node_count), policy, need_root)

    if add_noise or root_noise is not None:
        if root_noise is None:
            assert rng is not None, "add_noise requires an rng key"
        tree = _add_root_noise(tree, rng, spec, noise=root_noise)

    def body(_, t):
        return _simulate_once(t, eval_fn, spec, eval_ctx=eval_ctx)

    return jax.lax.fori_loop(0, spec.num_simulations, body, tree)


def _add_root_noise(tree: Tree, rng: jax.Array | None, spec: SearchSpec,
                    noise: jax.Array | None = None) -> Tree:
    """Mix Dirichlet(alpha) noise over legal root actions into root priors:
    prior <- (1-eps)*prior + eps*noise (reference mcts.py:314-326).

    Sampling gamma(alpha) per action and normalizing over the legal subset
    is exactly a Dirichlet draw on that subset.
    """
    B, _, A = tree.prior.shape
    vdt = spec.value_dtype
    root_prior = tree.prior[:, 0]                                # (B, A)
    root_state = _gather_states(tree.states, jnp.zeros((B,), jnp.int32))
    legal = env.legal_action_mask(root_state)
    if noise is None:
        gammas = jax.random.gamma(
            rng, spec.dirichlet_alpha, (B, A)).astype(vdt)
        gammas = jnp.where(legal, gammas, jnp.zeros((), vdt))
        denom = jnp.maximum(gammas.sum(-1, keepdims=True),
                            jnp.asarray(1e-30, vdt))
        noise = gammas / denom
    else:
        noise = noise.astype(vdt)
    eps = jnp.asarray(spec.dirichlet_epsilon, vdt)
    mixed = jnp.where(legal, (1 - eps) * root_prior + eps * noise, root_prior)
    return tree.replace(prior=tree.prior.at[:, 0].set(mixed))


# -----------------------------------------------------------------------------
# Reading results
# -----------------------------------------------------------------------------

def root_child_visits(tree: Tree) -> jax.Array:
    """(B, A) visit counts of the root's children (0 for absent edges)."""
    child = tree.children[:, 0]                                  # (B, A)
    has = child != NO_CHILD
    safe = jnp.where(has, child, 0)
    visits = jax.vmap(lambda v, i: v[i])(tree.visit, safe)
    return jnp.where(has, visits, 0)


def root_value(tree: Tree) -> jax.Array:
    """(B,) mean value of the root node (mover's perspective)."""
    v = tree.visit[:, 0]
    return jnp.where(
        v > 0, tree.value_sum[:, 0] / jnp.maximum(v, 1), 0
    ).astype(jnp.float32)


def root_action_probs(tree: Tree, temperature: jax.Array) -> jax.Array:
    """Visit-count policy with temperature (reference mcts.py:191-225).

    temperature may be a scalar or (B,): 0 -> one-hot argmax (first max),
    otherwise visits^(1/t) normalized; uniform-over-children fallback when
    all visits are zero.
    """
    visits = root_child_visits(tree).astype(jnp.float32)        # (B, A)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                         visits.shape[:1])[:, None]
    greedy = jax.nn.one_hot(jnp.argmax(visits, -1), visits.shape[-1],
                            dtype=jnp.float32)
    powed = jnp.power(visits, 1.0 / jnp.where(t == 0, 1.0, t))
    total = powed.sum(-1, keepdims=True)
    has_edge = (tree.children[:, 0] != NO_CHILD).astype(jnp.float32)
    n_edges = jnp.maximum(has_edge.sum(-1, keepdims=True), 1)
    tempered = jnp.where(total > 0, powed / jnp.maximum(total, 1e-30),
                         has_edge / n_edges)
    return jnp.where(t == 0, greedy, tempered)


def make_net_evaluator(net, variables, dtype=jnp.float32) -> Evaluator:
    """Evaluator closure over a Flax net: softmax policy + WL scalar value
    (reference mcts.py:245-258)."""
    from alphazero_tpu.models.network import policy_value_apply

    def eval_fn(planes: jax.Array):
        return policy_value_apply(net, variables, planes.astype(dtype))

    return eval_fn
