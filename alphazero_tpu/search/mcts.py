"""Batched on-device MCTS (PUCT) for TPU.

A from-scratch re-design of the reference's dict-of-Nodes search
(/root/reference/src/mcts.py) as fixed-size arrays + XLA control flow, so an
entire N-simulation search over thousands of games compiles to ONE program.

Layout (v2), driven by measured TPU cost asymmetries (scripts/microbench_*):
scatter/gather ops with *per-game varying* indices cost ~50us each at B=256
(lane-serialized), while dynamic updates at a *batch-uniform* index are free
(<1us). The design therefore:

- allocates node slots in simulation order — the slot for simulation ``i``
  is ``i+1`` for every game — so node-state, prior, and child-mask writes
  are batch-uniform dynamic-update-slices (free), never scatters;
- stores per-node data as ONE fused row ``rows[b, n] : (4, A)`` holding
  [child-pointer | prior | edge-visit | edge-value-sum] so each descent
  level issues exactly ONE varying-index row read;
- keeps the child pointer in the same row as the edge statistics and
  encodes it additively (-1 == unallocated, pointer write == add ``s+1``)
  so backprop's per-level scatter-add updates pointer+visit+value in ONE
  scatter op, and the separate child-pointer scatter disappears;
- records the descent path in (B, depth) buffers written at the loop
  counter (batch-uniform — free) so backprop never re-walks parent
  pointers with varying-index reads.

Per simulation the only lane-serialized ops are: one row-read per descent
level, one node-state read at the leaf, and one fused scatter-add per
backprop level. Everything else is dense vector math or batch-uniform
slices.

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

# Child-pointer plane sentinels (stored as floats; slots <= capacity are
# exactly representable in every value dtype used).
ILLEGAL = -2.0       # action illegal at this node
UNALLOCATED = -1.0   # legal action whose child node does not exist yet

# Plane indices within a fused node row.
P_CHILD, P_PRIOR, P_VISIT, P_VSUM = 0, 1, 2, 3

# Packed node-state row: board (64) | turn | winner | done | move_count.
STATE_WIDTH = 68


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
    """Batched search tree; B games, N = capacity node slots.

    rows:        (B, N+1, 4, A) value_dtype — fused per-node rows
                 [child ptr | prior | edge visit | edge value-sum]; child
                 pointers use the ILLEGAL/UNALLOCATED sentinels; slot N is a
                 write-only trash row targeted by masked scatter updates.
    node_states: (B, N, STATE_WIDTH) int32 — packed game state per node
    root_visit:  (B,) int32 — root visit count (the root has no incoming
                 edge, so its stats live outside the rows)
    root_vsum:   (B,) value_dtype
    node_count:  (B,) int32 — real allocated nodes (including the root)
    next_slot:   () int32 — next fresh slot, advanced once per simulation
                 uniformly across the batch
    """

    rows: jax.Array
    node_states: jax.Array
    root_visit: jax.Array
    root_vsum: jax.Array
    node_count: jax.Array
    next_slot: jax.Array

    @property
    def prior(self) -> jax.Array:
        """(B, N, A) priors (0 on illegal actions, like the reference)."""
        return self.rows[:, :-1, P_PRIOR, :]

    @property
    def child_visit(self) -> jax.Array:
        """(B, N, A) per-edge visit counts."""
        return self.rows[:, :-1, P_VISIT, :]


def pack_state(s: env.EnvState) -> jax.Array:
    """EnvState -> (..., STATE_WIDTH) int32 row."""
    flat = s.board.reshape(s.board.shape[:-2] + (64,)).astype(jnp.int32)
    extras = jnp.stack(
        [s.turn.astype(jnp.int32), s.winner.astype(jnp.int32),
         s.done.astype(jnp.int32), s.move_count.astype(jnp.int32)], axis=-1)
    return jnp.concatenate([flat, extras], axis=-1)


def unpack_state(row: jax.Array) -> env.EnvState:
    """(..., STATE_WIDTH) int32 row -> EnvState."""
    board = row[..., :64].astype(jnp.int8)
    board = board.reshape(board.shape[:-1] + (8, 8))
    return env.EnvState(
        board=board,
        turn=row[..., 64].astype(jnp.int8),
        winner=row[..., 65].astype(jnp.int8),
        done=row[..., 66].astype(jnp.bool_),
        move_count=row[..., 67],
    )


def init_tree(root_states: env.EnvState, spec: SearchSpec) -> Tree:
    """Fresh tree batch with the given root states at slot 0."""
    B = root_states.turn.shape[0]
    N, A = spec.capacity, spec.num_actions
    vdt = spec.value_dtype
    rows = jnp.concatenate(
        [jnp.full((B, N + 1, 1, A), ILLEGAL, vdt),
         jnp.zeros((B, N + 1, 3, A), vdt)], axis=2)
    node_states = jnp.zeros((B, N, STATE_WIDTH), jnp.int32)
    node_states = node_states.at[:, 0, :].set(pack_state(root_states))
    return Tree(
        rows=rows,
        node_states=node_states,
        root_visit=jnp.zeros((B,), jnp.int32),
        root_vsum=jnp.zeros((B,), vdt),
        node_count=jnp.ones((B,), jnp.int32),
        next_slot=jnp.asarray(1, jnp.int32),
    )


def _renorm_priors(policy: jax.Array, legal: jax.Array, vdt) -> jax.Array:
    """Mask policy to legal actions and renormalize; uniform fallback when
    the legal mass is zero (reference mcts.py:273-279)."""
    masked = jnp.where(legal, policy.astype(vdt), jnp.zeros((), vdt))
    total = masked.sum(-1, keepdims=True)
    n_legal = jnp.maximum(legal.sum(-1, keepdims=True), 1).astype(vdt)
    return jnp.where(total > 0,
                     masked / jnp.maximum(total, jnp.asarray(1e-30, vdt)),
                     legal.astype(vdt) / n_legal)


def _row_read(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[b, idx[b]] — ONE varying-index row read per game."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


# -----------------------------------------------------------------------------
# One simulation: descend -> allocate -> evaluate -> expand -> backprop
# -----------------------------------------------------------------------------

def _descend(tree: Tree, spec: SearchSpec):
    """PUCT descent for every game in lockstep.

    Returns (cur, needs_alloc, alloc_action, depth, path_nodes,
    path_actions): ``cur`` is the node whose edge (cur, alloc_action) needs
    a new child when ``needs_alloc``, else an existing leaf (terminal or
    unexpanded root). ``depth`` counts recorded path edges; the path buffers
    are written at batch-uniform column indices (free).
    """
    B = tree.root_visit.shape[0]
    N = tree.node_states.shape[1]
    A = spec.num_actions
    vdt = spec.value_dtype
    iota_a = jnp.arange(A)
    neg_inf = jnp.asarray(-jnp.inf, vdt)

    def cond(c):
        return jnp.any(~c[2])

    def body(c):
        (cur, n_cur, stopped, needs_alloc, alloc_action, depth,
         path_nodes, path_actions, d) = c

        row = _row_read(tree.rows, cur)                       # (B, 4, A)
        child = row[:, P_CHILD]
        legal = child > (ILLEGAL + 0.5)
        live = jnp.any(legal, axis=-1) & ~stopped

        ev = row[:, P_VISIT]
        visited = ev > 0
        q = jnp.where(visited,
                      -row[:, P_VSUM] / jnp.maximum(ev, 1),
                      jnp.zeros((), vdt))
        cs = jnp.asarray(spec.c_puct, vdt) * jnp.sqrt(
            jnp.maximum(n_cur, 1))
        u = row[:, P_PRIOR] * cs[:, None] / (1 + ev)
        score = jnp.where(legal, q + u, neg_inf)
        a = jnp.argmax(score, axis=-1).astype(jnp.int32)      # (B,)

        onehot = iota_a[None, :] == a[:, None]
        child_a = jnp.sum(jnp.where(onehot, child, 0), axis=-1)
        ev_a = jnp.sum(jnp.where(onehot, ev, 0), axis=-1)

        alloc_here = live & (child_a < (UNALLOCATED + 0.5))
        descend = live & (child_a > -0.5)

        # Record the traversed edge at batch-uniform column d. Stopped games
        # write garbage here — harmless, backprop masks on per-game depth.
        z = jnp.zeros_like(d)
        path_nodes = jax.lax.dynamic_update_slice(
            path_nodes, cur[:, None], (z, d))
        path_actions = jax.lax.dynamic_update_slice(
            path_actions, a[:, None], (z, d))

        return (
            jnp.where(descend, child_a.astype(jnp.int32), cur),
            jnp.where(descend, ev_a, n_cur),
            stopped | ~live | alloc_here,
            needs_alloc | alloc_here,
            jnp.where(alloc_here, a, alloc_action),
            depth + live.astype(jnp.int32),
            path_nodes, path_actions, d + 1,
        )

    init = (
        jnp.zeros((B,), jnp.int32),                 # cur = root
        tree.root_visit.astype(vdt),                # N_parent at root
        jnp.zeros((B,), jnp.bool_),                 # stopped
        jnp.zeros((B,), jnp.bool_),                 # needs_alloc
        jnp.zeros((B,), jnp.int32),                 # alloc_action
        jnp.zeros((B,), jnp.int32),                 # depth (edges)
        jnp.zeros((B, N), jnp.int32),               # path_nodes
        jnp.zeros((B, N), jnp.int32),               # path_actions
        jnp.int32(0),                               # level counter
    )
    (cur, _, _, needs_alloc, alloc_action, depth,
     path_nodes, path_actions, _) = jax.lax.while_loop(cond, body, init)
    return cur, needs_alloc, alloc_action, depth, path_nodes, path_actions


def _simulate_once(tree: Tree, eval_fn: Evaluator, spec: SearchSpec,
                   eval_ctx=None) -> Tree:
    B = tree.root_visit.shape[0]
    N = tree.node_states.shape[1]
    vdt = spec.value_dtype
    s = tree.next_slot                       # this simulation's fresh slot
    trash = jnp.int32(N)                     # masked updates land here

    # (1) selection
    (cur, needs_alloc, alloc_action, depth,
     path_nodes, path_actions) = _descend(tree, spec)

    # (2) leaf state: step the parent state for new nodes; existing leaves
    # (terminal nodes / unexpanded roots) keep their stored state.
    cur_state = unpack_state(_row_read(tree.node_states, cur))
    stepped = env.step(cur_state, alloc_action)
    sel = needs_alloc

    def pick(new, old):
        m = sel.reshape(sel.shape + (1,) * (new.ndim - sel.ndim))
        return jnp.where(m, new, old)

    leaf_state = jax.tree_util.tree_map(pick, stepped, cur_state)
    z = jnp.zeros_like(s)
    node_states = jax.lax.dynamic_update_slice(
        tree.node_states, pack_state(leaf_state)[:, None, :], (z, s, z))

    # (3) one batched network evaluation (the MXU step)
    planes = env.encoded_state(leaf_state)
    policy, value = (eval_fn(planes) if eval_ctx is None
                     else eval_fn(planes, eval_ctx))
    is_term = leaf_state.done
    value = jnp.where(
        is_term, env.terminal_value_for_player_to_move(leaf_state),
        value.astype(jnp.float32)).astype(vdt)

    # (4) expand the fresh slot (batch-uniform row write; games that did not
    # allocate write the slot's initial values back — their slot is unused).
    legal = env.legal_action_mask(leaf_state)
    priors = _renorm_priors(policy, legal, vdt)
    do_expand = (needs_alloc & ~is_term)[:, None]
    child_row = jnp.where(do_expand,
                          jnp.where(legal, UNALLOCATED, ILLEGAL),
                          ILLEGAL).astype(vdt)
    prior_row = jnp.where(do_expand, priors, 0).astype(vdt)
    rows = jax.lax.dynamic_update_slice(
        tree.rows, jnp.stack([child_row, prior_row], axis=1)[:, None],
        (z, s, z, z))

    # (5) backprop: walk the recorded path top-down; each level is ONE fused
    # scatter-add updating [child ptr | prior | visit | vsum] together. The
    # child pointer write rides the last edge's update: the plane holds -1
    # (UNALLOCATED), so adding s+1 turns it into the slot index.
    # Edge d's child accumulates value * (-1)^(L-1-d) (leaf mover's POV at
    # d = L-1, flipping each ply toward the root — mcts.py:337-342).
    sign0 = jnp.where(depth % 2 == 1, 1.0, -1.0).astype(vdt)
    max_depth = jnp.max(depth)

    def bcond(c):
        return c[0] < max_depth

    def bbody(c):
        d, flip, rows = c
        zz = jnp.zeros_like(d)
        node = jax.lax.dynamic_slice(path_nodes, (zz, d), (B, 1))[:, 0]
        act = jax.lax.dynamic_slice(path_actions, (zz, d), (B, 1))[:, 0]
        active = d < depth
        tgt = jnp.where(active, node, trash)
        is_alloc_edge = active & needs_alloc & (d == depth - 1)
        upd = jnp.stack([
            jnp.where(is_alloc_edge, s.astype(vdt) + 1, 0),
            jnp.zeros((B,), vdt),
            active.astype(vdt),
            jnp.where(active, sign0 * flip * value, 0),
        ], axis=-1)                                           # (B, 4)
        rows = jax.vmap(
            lambda r, n, a, u: r.at[n, :, a].add(u))(rows, tgt, act, upd)
        return (d + 1, -flip, rows)

    _, _, rows = jax.lax.while_loop(
        bcond, bbody, (jnp.int32(0), jnp.ones((), vdt), rows))

    # Root stats (the root has no incoming edge): value reaches the root
    # flipped ``depth`` times.
    root_add = -sign0 * value
    return tree.replace(
        rows=rows,
        node_states=node_states,
        root_visit=tree.root_visit + 1,
        root_vsum=tree.root_vsum + root_add,
        node_count=tree.node_count + needs_alloc.astype(jnp.int32),
        next_slot=s + 1,
    )


# -----------------------------------------------------------------------------
# Top-level search
# -----------------------------------------------------------------------------

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

    Passing an existing ``tree`` continues the same search (more
    simulations); the tree must have been built with enough capacity for
    the total simulation count.
    """
    if tree is None:
        tree = init_tree(root_states, spec)
    vdt = spec.value_dtype

    # Root expansion (does not count a visit — mcts.py:128-138).
    root_state = unpack_state(tree.node_states[:, 0])
    root_planes = env.encoded_state(root_state)
    policy, _ = (eval_fn(root_planes) if eval_ctx is None
                 else eval_fn(root_planes, eval_ctx))
    legal = env.legal_action_mask(root_state)
    expanded = jnp.any(tree.rows[:, 0, P_CHILD, :] > (ILLEGAL + 0.5), -1)
    need_root = (~expanded & ~root_state.done)[:, None]
    child_row = jnp.where(
        need_root, jnp.where(legal, UNALLOCATED, ILLEGAL).astype(vdt),
        tree.rows[:, 0, P_CHILD, :])
    prior_row = jnp.where(need_root, _renorm_priors(policy, legal, vdt),
                          tree.rows[:, 0, P_PRIOR, :])
    rows = tree.rows.at[:, 0, P_CHILD, :].set(child_row)
    rows = rows.at[:, 0, P_PRIOR, :].set(prior_row)
    tree = tree.replace(rows=rows)

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
    vdt = spec.value_dtype
    root_prior = tree.rows[:, 0, P_PRIOR, :]                     # (B, A)
    legal = tree.rows[:, 0, P_CHILD, :] > (ILLEGAL + 0.5)
    if noise is None:
        B, A = root_prior.shape
        gammas = jax.random.gamma(
            rng, spec.dirichlet_alpha, (B, A)).astype(vdt)
        gammas = jnp.where(legal, gammas, jnp.zeros((), vdt))
        denom = jnp.maximum(gammas.sum(-1, keepdims=True),
                            jnp.asarray(1e-30, vdt))
        noise = gammas / denom
    else:
        noise = noise.astype(vdt)
    eps = jnp.asarray(spec.dirichlet_epsilon, vdt)
    mixed = jnp.where(legal, (1 - eps) * root_prior + eps * noise,
                      root_prior)
    return tree.replace(rows=tree.rows.at[:, 0, P_PRIOR, :].set(mixed))


# -----------------------------------------------------------------------------
# Reading results
# -----------------------------------------------------------------------------

def root_child_visits(tree: Tree) -> jax.Array:
    """(B, A) visit counts of the root's children (0 for unvisited/illegal
    actions)."""
    return tree.rows[:, 0, P_VISIT, :].astype(jnp.int32)


def root_value(tree: Tree) -> jax.Array:
    """(B,) mean value of the root node (mover's perspective)."""
    v = tree.root_visit
    return jnp.where(
        v > 0, tree.root_vsum / jnp.maximum(v, 1).astype(tree.root_vsum.dtype),
        0).astype(jnp.float32)


def root_action_probs(tree: Tree, temperature: jax.Array) -> jax.Array:
    """Visit-count policy with temperature (reference mcts.py:191-225).

    temperature may be a scalar or (B,): 0 -> one-hot argmax (first max),
    otherwise visits^(1/t) normalized; uniform-over-legal-children fallback
    when all visits are zero (the reference's children are exactly the legal
    actions — mcts.py:260-279).
    """
    visits = tree.rows[:, 0, P_VISIT, :].astype(jnp.float32)     # (B, A)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                         visits.shape[:1])[:, None]
    greedy = jax.nn.one_hot(jnp.argmax(visits, -1), visits.shape[-1],
                            dtype=jnp.float32)
    powed = jnp.power(visits, 1.0 / jnp.where(t == 0, 1.0, t))
    total = powed.sum(-1, keepdims=True)
    legal = (tree.rows[:, 0, P_CHILD, :] > (ILLEGAL + 0.5)).astype(
        jnp.float32)
    n_legal = jnp.maximum(legal.sum(-1, keepdims=True), 1)
    tempered = jnp.where(total > 0, powed / jnp.maximum(total, 1e-30),
                         legal / n_legal)
    return jnp.where(t == 0, greedy, tempered)


def make_net_evaluator(net, variables, dtype=jnp.float32) -> Evaluator:
    """Evaluator closure over a Flax net: softmax policy + WL scalar value
    (reference mcts.py:245-258)."""
    from alphazero_tpu.models.network import policy_value_apply

    def eval_fn(planes: jax.Array):
        return policy_value_apply(net, variables, planes.astype(dtype))

    return eval_fn
