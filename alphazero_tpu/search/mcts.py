"""Batched on-device MCTS (PUCT) for TPU.

A from-scratch re-design of the reference's dict-of-Nodes search
(/root/reference/src/mcts.py) as fixed-size arrays + XLA control flow, so an
entire N-simulation search over thousands of games compiles to ONE program.

Layout, driven by measured TPU cost asymmetries (scripts/microbench_*)
and optimized-HLO inspection:

- scatter/gather ops with *per-game varying* indices are lane-serialized
  while dynamic updates at a *batch-uniform* index are free — so node slots
  are allocated in simulation order (the slot for simulation ``i`` is
  ``i+1`` for every game) and the expansion write is ONE batch-uniform
  dynamic-update-slice, never a scatter;
- per-node data is ONE fused row ``rows[b, n] : (4A,)`` holding the
  [child ptr | prior | edge visit | edge vsum] blocks, and BOTH
  varying-index accesses (the descent row read and the backprop edge
  update) are Pallas DMA kernels (search/kernels.py). Expressed as XLA
  gather/scatter they demand different operand layouts and XLA
  transpose-copies the whole tree every simulation; the custom calls
  remove every layout demand from the XLA graph;
- child pointers are encoded additively (-1 == unallocated, pointer write
  == add ``s+1``) so the pointer write rides the backprop edge update for
  the final edge — no read-modify-write gather;
- the descent path is recorded in (B, depth) buffers written at the loop
  counter (batch-uniform — free) and backprop walks it top-down, so parent
  pointers never need varying-index re-reads;
- NO per-node game state is stored: the leaf state is recomputed by
  folding the vectorized ``env.step`` over the recorded path actions from
  the root state — a handful of dense vector ops per level.

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

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.search import kernels

Evaluator = Callable[..., Tuple[jax.Array, jax.Array]]
# eval_fn(planes (B,3,8,8) f32[, ctx]) -> (policy_probs (B,192) f32,
# value (B,) f32). ``ctx`` is an optional per-game pytree (row-aligned with
# the batch) for evaluators that dispatch per game — e.g. arena matches
# where each game's searching player uses a different network.

# Child-pointer sentinels (stored as floats; slots <= capacity are exactly
# representable in every value dtype used).
ILLEGAL = -2.0       # action illegal at this node
UNALLOCATED = -1.0   # legal action whose child node does not exist yet


@struct.dataclass
class SearchSpec:
    """Static search hyperparameters (jit-hashable)."""

    num_simulations: int = struct.field(pytree_node=False, default=400)
    num_actions: int = struct.field(pytree_node=False, default=192)
    c_puct: float = struct.field(pytree_node=False, default=1.5)
    # First-play urgency: unvisited children score q = parent_Q - reduction
    # instead of q = 0. Default 0.0 reproduces the reference exactly
    # (FPU disabled, mcts.py:294-298); the reference's commented-out
    # alternative (mcts.py:297, README.md:83) is this formula.
    fpu_reduction: float = struct.field(pytree_node=False, default=0.0)
    # Between-move tree reuse (reference parallel_trainer.py:194-198):
    # advance_root() re-roots the tree at the chosen child, preserving its
    # subtree's visits/values for the next search. Doubles tree capacity
    # for headroom; when a reused subtree plus the next search would not
    # fit, the whole batch falls back to fresh roots for that move.
    tree_reuse: bool = struct.field(pytree_node=False, default=False)
    dirichlet_alpha: float = struct.field(pytree_node=False, default=0.35)
    dirichlet_epsilon: float = struct.field(pytree_node=False, default=0.25)
    value_dtype: jnp.dtype = struct.field(pytree_node=False,
                                          default=jnp.float32)

    @property
    def capacity(self) -> int:
        return (2 * self.num_simulations + 1 if self.tree_reuse
                else self.num_simulations + 1)


def _row_sublanes(A: int, vdt) -> int:
    """Sublane count of the fused per-node row: ceil(4A/128), rounded up to
    a whole 8-sublane tile for sub-32-bit dtypes. Mosaic packs 16-bit
    sublanes two per 32-bit word and rejects DMA slices that do not span
    whole (8, 128) tiles ("Slice shape along dimension 2 must be aligned to
    tiling (8)"), so a float16 tree pads the 768-wide row to 1024 — still
    2/3 the bytes of the f32 row."""
    rs = -(-4 * A // 128)
    if jnp.dtype(vdt).itemsize < 4:
        rs = -(-rs // 8) * 8
    return rs


@struct.dataclass
class Tree:
    """Batched search tree; B games, N = capacity node slots.

    rows:        (B, N+1, RS, 128) value_dtype fused per-node rows
                 (RS = _row_sublanes(A, dtype)); flattening the trailing
                 dims gives blocks
                 [child ptr | prior | edge visit | edge vsum] of width A
                 (plus zero tail padding for 16-bit dtypes).
                 Child pointers use the ILLEGAL/UNALLOCATED sentinels; slot
                 N is a write-only trash row targeted by masked updates.
                 The trailing (r, 128) split keeps the Pallas-DMA'd slice
                 dims untiled, and the array is never reshaped inside the
                 simulation loop (that would break in-place aliasing).
    root_state:  EnvState with batch shape (B,) — the search root position
                 (node states are otherwise not stored; leaf states are
                 replayed from here along the descent path)
    root_visit:  (B,) int32 — root visit count (the root has no incoming
                 edge, so its stats live outside the rows)
    root_vsum:   (B,) value_dtype
    node_count:  (B,) int32 — real allocated nodes (including the root)
    next_slot:   () int32 — next fresh slot, advanced once per simulation
                 uniformly across the batch
    parents:     (B, N+1) int32 — each slot's parent slot (0 for the root,
                 for unallocated slots, and for games that skipped that
                 simulation's allocation — 0 is never inside a chosen
                 subtree, so stale entries self-exclude in advance_root)
    """

    rows: jax.Array
    root_state: env.EnvState
    root_visit: jax.Array
    root_vsum: jax.Array
    node_count: jax.Array
    next_slot: jax.Array
    parents: jax.Array
    # static: not recoverable from rows.shape once 16-bit rows are padded,
    # so it is REQUIRED — omitting it must be a TypeError, never a silent
    # wrong action count
    n_actions: int = struct.field(pytree_node=False)

    @property
    def num_actions(self) -> int:
        return self.n_actions

    def _flat_rows(self) -> jax.Array:
        B, M = self.rows.shape[:2]
        return self.rows.reshape(B, M, -1)

    @property
    def prior(self) -> jax.Array:
        """(B, N, A) priors (0 on illegal actions, like the reference)."""
        A = self.num_actions
        return self._flat_rows()[:, :-1, A:2 * A]

    @property
    def child_visit(self) -> jax.Array:
        """(B, N, A) per-edge visit counts."""
        A = self.num_actions
        return self._flat_rows()[:, :-1, 2 * A:3 * A]


def init_tree(root_states: env.EnvState, spec: SearchSpec) -> Tree:
    """Fresh tree batch with the given root states at slot 0."""
    B = root_states.turn.shape[0]
    N, A = spec.capacity, spec.num_actions
    vdt = spec.value_dtype
    # The fused row stores child POINTERS and VISIT COUNTS in vdt, so vdt
    # must represent every integer up to capacity/num_simulations exactly:
    # float16 is exact to 2048, bfloat16 only to 256 (an 800-sim bf16
    # search literally cannot count past 256 — scripts/probe_value_dtype.py
    # measures the corruption). Reject invalid combinations at trace time.
    if jnp.dtype(vdt).itemsize < 4:
        max_exact = 256 if jnp.dtype(vdt) == jnp.bfloat16 else 2048
        if N + 1 > max_exact or spec.num_simulations >= max_exact:
            raise ValueError(
                f"value_dtype={jnp.dtype(vdt).name} represents integers "
                f"exactly only up to {max_exact}; capacity {N + 1} / "
                f"{spec.num_simulations} sims would corrupt visit counts "
                f"and child pointers")
        if jnp.dtype(vdt) == jnp.float16 and jax.default_backend() == "tpu":
            # Measured dead end, not a missing feature: Mosaic rejects f16
            # pallas_call operands outright ("Only arguments with float8...,
            # bfloat16 or 32-bit element types are supported"), and bf16 —
            # which does compile — gains only +0.6% sims/s because the tree
            # ops are latency-, not bandwidth-bound at these row sizes.
            # Full evidence: docs/value-dtype-closure.md.
            raise ValueError(
                "value_dtype=float16 cannot compile on the TPU backend: "
                "Mosaic does not support float16 kernel operands (see "
                "docs/value-dtype-closure.md for the on-chip evidence and "
                "why 16-bit trees are a measured dead end). float16 remains "
                "available on CPU for numerics tests only.")
    RS = _row_sublanes(A, vdt)
    rows = jnp.concatenate(
        [jnp.full((B, N + 1, A), ILLEGAL, vdt),
         jnp.zeros((B, N + 1, RS * 128 - A), vdt)], axis=2
    ).reshape(B, N + 1, RS, 128)
    return Tree(
        rows=rows,
        n_actions=A,
        root_state=root_states,
        root_visit=jnp.zeros((B,), jnp.int32),
        root_vsum=jnp.zeros((B,), vdt),
        node_count=jnp.ones((B,), jnp.int32),
        next_slot=jnp.asarray(1, jnp.int32),
        parents=jnp.zeros((B, N + 1), jnp.int32),
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


# -----------------------------------------------------------------------------
# One simulation: descend -> replay leaf state -> evaluate -> expand -> backprop
# -----------------------------------------------------------------------------

def _descend(rows: jax.Array, root_state: env.EnvState,
             root_visit: jax.Array, root_vsum: jax.Array,
             spec: SearchSpec):
    """PUCT descent for every game in lockstep.

    ``rows`` is threaded through the loop and returned so downstream stages
    consume this loop's output. The game state is stepped alongside the
    walk, so the loop's final state IS the leaf state (for an allocating
    walk, the NEW child's state) — no separate path replay. Returns
    (rows, leaf_state, needs_alloc, depth, path_nodes, path_actions): the
    walked edges are (path_nodes[d], path_actions[d]) for d < depth; when
    ``needs_alloc`` the last edge is the one that needs a new child,
    otherwise the walk stopped on an existing leaf (terminal node or
    unexpanded root).
    """
    B = root_visit.shape[0]
    N = rows.shape[1] - 1
    A = spec.num_actions
    vdt = spec.value_dtype
    iota_a = jnp.arange(A)
    neg_inf = jnp.asarray(-jnp.inf, vdt)

    def cond(c):
        return jnp.any(~c[5])       # c[5] == stopped

    def body(c):
        (rows, state, cur, n_cur, parent_q, stopped, needs_alloc, depth,
         path_nodes, path_actions, d) = c

        row = kernels.fetch_rows(rows, cur)                   # (B, 4A)
        child = row[:, :A]
        prior = row[:, A:2 * A]
        ev = row[:, 2 * A:3 * A]
        evs = row[:, 3 * A:4 * A]

        legal = child > (ILLEGAL + 0.5)
        live = jnp.any(legal, axis=-1) & ~stopped

        # Unvisited-child q: 0 with FPU disabled (the reference default,
        # mcts.py:294-298); parent_Q - reduction when enabled. The branch
        # is static, so fpu_reduction == 0.0 compiles to the exact
        # reference-parity program.
        if spec.fpu_reduction:
            q_unvisited = (parent_q
                           - jnp.asarray(spec.fpu_reduction, vdt))[:, None]
        else:
            q_unvisited = jnp.zeros((), vdt)
        q = jnp.where(ev > 0, -evs / jnp.maximum(ev, 1), q_unvisited)
        cs = jnp.asarray(spec.c_puct, vdt) * jnp.sqrt(
            jnp.maximum(n_cur, 1))
        u = prior * cs[:, None] / (1 + ev)
        score = jnp.where(legal, q + u, neg_inf)
        a = jnp.argmax(score, axis=-1).astype(jnp.int32)      # (B,)

        onehot = iota_a[None, :] == a[:, None]
        child_a = jnp.sum(jnp.where(onehot, child, 0), axis=-1)
        ev_a = jnp.sum(jnp.where(onehot, ev, 0), axis=-1)

        alloc_here = live & (child_a < (UNALLOCATED + 0.5))
        descend = live & (child_a > -0.5)

        if spec.fpu_reduction:
            # The descended-into child becomes next level's parent; its Q
            # from its own mover's perspective is +evs/ev (edge stats are
            # stored leaf-mover-side, see backprop).
            evs_a = jnp.sum(jnp.where(onehot, evs, 0), axis=-1)
            child_q = jnp.where(ev_a > 0, evs_a / jnp.maximum(ev_a, 1),
                                jnp.zeros((), vdt))
            parent_q = jnp.where(descend, child_q, parent_q)

        # Record the traversed edge at batch-uniform column d. Stopped games
        # write garbage here — harmless, backprop masks on per-game depth.
        z = jnp.zeros_like(d)
        path_nodes = jax.lax.dynamic_update_slice(
            path_nodes, cur[:, None], (z, d))
        path_actions = jax.lax.dynamic_update_slice(
            path_actions, a[:, None], (z, d))

        # Step the carried state along the taken edge (dense vector math);
        # exactly the edges recorded above, so the final state is the leaf.
        stepped = env.step(state, a)

        def pick(new, old):
            m = live.reshape(live.shape + (1,) * (new.ndim - live.ndim))
            return jnp.where(m, new, old)

        state = jax.tree_util.tree_map(pick, stepped, state)

        return (
            rows, state,
            jnp.where(descend, child_a.astype(jnp.int32), cur),
            jnp.where(descend, ev_a, n_cur),
            parent_q,
            stopped | ~live | alloc_here,
            needs_alloc | alloc_here,
            depth + live.astype(jnp.int32),
            path_nodes, path_actions, d + 1,
        )

    root_q = jnp.where(root_visit > 0,
                       root_vsum / jnp.maximum(root_visit, 1).astype(vdt),
                       jnp.zeros((), vdt)).astype(vdt)
    init = (
        rows,
        root_state,                                 # carried game state
        jnp.zeros((B,), jnp.int32),                 # cur = root
        root_visit.astype(vdt),                     # N_parent at root
        root_q,                                     # parent Q (FPU)
        jnp.zeros((B,), jnp.bool_),                 # stopped
        jnp.zeros((B,), jnp.bool_),                 # needs_alloc
        jnp.zeros((B,), jnp.int32),                 # depth (edges)
        jnp.zeros((B, N), jnp.int32),               # path_nodes
        jnp.zeros((B, N), jnp.int32),               # path_actions
        jnp.int32(0),                               # level counter
    )
    (rows, leaf_state, _, _, _, _, needs_alloc, depth,
     path_nodes, path_actions, _) = jax.lax.while_loop(cond, body, init)
    return rows, leaf_state, needs_alloc, depth, path_nodes, path_actions


def _simulate_once(tree: Tree, eval_fn: Evaluator, spec: SearchSpec,
                   eval_ctx=None) -> Tree:
    B = tree.root_visit.shape[0]
    A = spec.num_actions
    vdt = spec.value_dtype
    s = tree.next_slot                       # this simulation's fresh slot
    trash = jnp.int32(tree.rows.shape[1] - 1)   # slot N

    # (1) selection + in-loop state stepping (the final carried state is
    # the leaf state — no per-node state storage, no separate replay)
    (rows, leaf_state, needs_alloc, depth,
     path_nodes, path_actions) = _descend(
        tree.rows, tree.root_state, tree.root_visit, tree.root_vsum, spec)

    # (2) one batched network evaluation (the MXU step)
    planes = env.encoded_state(leaf_state)
    policy, value = (eval_fn(planes) if eval_ctx is None
                     else eval_fn(planes, eval_ctx))
    is_term = leaf_state.done
    value = jnp.where(
        is_term, env.terminal_value_for_player_to_move(leaf_state),
        value.astype(jnp.float32)).astype(vdt)

    # (3) expand the fresh slot (batch-uniform row write; games that did
    # not allocate write the slot's initial values back — slot unused).
    # child+prior = 2A = 384 = 3*128 flat entries: an aligned 4-D box.
    legal = env.legal_action_mask(leaf_state)
    priors = _renorm_priors(policy, legal, vdt)
    do_expand = (needs_alloc & ~is_term)[:, None]
    child_row = jnp.where(do_expand,
                          jnp.where(legal, UNALLOCATED, ILLEGAL),
                          ILLEGAL).astype(vdt)
    prior_row = jnp.where(do_expand, priors, 0).astype(vdt)
    z = jnp.zeros_like(s)
    if spec.tree_reuse:
        # With reuse, slots between a game's compacted node count and the
        # batch-uniform next_slot hold stale rows from the compaction
        # gather — so expansion must clear the visit/vsum blocks too
        # (without reuse every slot starts zeroed by init_tree).
        RS = _row_sublanes(A, vdt)
        upd_rows = jnp.concatenate(
            [child_row, prior_row, jnp.zeros((B, RS * 128 - 2 * A), vdt)],
            axis=-1).reshape(B, 1, RS, 128)
    else:
        upd_rows = jnp.concatenate([child_row, prior_row], axis=-1).reshape(
            B, 1, 2 * A // 128, 128)
    rows = jax.lax.dynamic_update_slice(rows, upd_rows, (z, s, z, z))

    if spec.tree_reuse:
        # record the fresh slot's parent edge for advance_root: the node
        # the allocating edge originated from (path position depth-1).
        # Games that did not allocate record parent 0 = self-excluding.
        d_last = jnp.maximum(depth - 1, 0)[:, None]
        par = jnp.take_along_axis(path_nodes, d_last, axis=1)[:, 0]
        parents = jax.lax.dynamic_update_slice(
            tree.parents, jnp.where(needs_alloc, par, 0)[:, None], (z, s))
    else:
        parents = tree.parents

    # (4) backprop: walk the recorded path top-down; each level commits
    # [child ptr? | visit += 1 | vsum += signed value] for one edge per
    # game in a single Pallas row read-modify-write. The child-pointer
    # write rides the last edge's update: the block holds -1 (UNALLOCATED),
    # so adding s+1 turns it into the slot index. Edge d's child
    # accumulates value * (-1)^(L-1-d) (leaf mover's POV at d = L-1,
    # flipping each ply toward the root — mcts.py:337-342).
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
            jnp.where(is_alloc_edge, s.astype(vdt) + 1, jnp.zeros((), vdt)),
            active.astype(vdt),
            jnp.where(active, sign0 * flip * value, jnp.zeros((), vdt)),
        ], axis=-1)                                           # (B, 3)
        rows = kernels.commit_edges(rows, tgt, act, upd,
                                    offsets=(0, 2 * A, 3 * A))
        return (d + 1, -flip, rows)

    _, _, rows = jax.lax.while_loop(
        bcond, bbody, (jnp.int32(0), jnp.ones((), vdt), rows))

    # Root stats (the root has no incoming edge): value reaches the root
    # flipped ``depth`` times.
    root_add = -sign0 * value
    return tree.replace(
        rows=rows,
        root_visit=tree.root_visit + 1,
        root_vsum=tree.root_vsum + root_add,
        node_count=tree.node_count + needs_alloc.astype(jnp.int32),
        next_slot=s + 1,
        parents=parents,
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
    A = spec.num_actions

    # Root expansion (does not count a visit — mcts.py:128-138).
    root_planes = env.encoded_state(tree.root_state)
    policy, _ = (eval_fn(root_planes) if eval_ctx is None
                 else eval_fn(root_planes, eval_ctx))
    legal = env.legal_action_mask(tree.root_state)
    B = legal.shape[0]
    root_flat = tree.rows[:, 0].reshape(B, -1)
    root_child = root_flat[:, :A]
    root_prior = root_flat[:, A:2 * A]
    expanded = jnp.any(root_child > (ILLEGAL + 0.5), -1)
    need_root = (~expanded & ~tree.root_state.done)[:, None]
    child_row = jnp.where(
        need_root, jnp.where(legal, UNALLOCATED, ILLEGAL).astype(vdt),
        root_child)
    prior_row = jnp.where(need_root, _renorm_priors(policy, legal, vdt),
                          root_prior)
    tree = tree.replace(rows=tree.rows.at[:, 0, :2 * A // 128].set(
        jnp.concatenate([child_row, prior_row], axis=-1).reshape(
            B, 2 * A // 128, 128)))

    if add_noise or root_noise is not None:
        if root_noise is None:
            assert rng is not None, "add_noise requires an rng key"
        tree = _add_root_noise(tree, rng, spec, noise=root_noise)

    def body(_, t):
        return _simulate_once(t, eval_fn, spec, eval_ctx=eval_ctx)

    return jax.lax.fori_loop(0, spec.num_simulations, body, tree)


def advance_root(
    tree: Tree,
    actions: jax.Array,
    new_root_state: env.EnvState,
    spec: SearchSpec,
    force_fresh: jax.Array | None = None,
) -> Tree:
    """Re-root the tree at the chosen child, preserving its subtree.

    The reference descends into ``root.children[action]`` between moves
    (parallel_trainer.py:194-198) so the next search starts from the
    child's accumulated visits/values. For the slot-allocated batched tree
    this is a once-per-move compaction: mark the chosen child's subtree
    (binary lifting over the recorded parent pointers — O(log N) vectorized
    gathers on small int arrays), renumber kept slots in ascending old-slot
    order (children stay after parents, preserving the allocation
    invariant), and gather the kept rows to the front. The per-game-varying
    whole-tree gather happens ONCE per move — outside the simulation loop —
    so the Pallas-kernel layout discipline of the hot path is untouched.

    Games whose chosen action has no allocated child (never visited), plus
    any ``force_fresh`` lanes (e.g. auto-reset), restart with an empty
    root. If the largest kept subtree plus the next search's allocations
    would overflow capacity, the WHOLE batch falls back to fresh roots for
    this move (slot allocation is batch-uniform, so per-game reuse depth
    cannot diverge).
    """
    assert spec.tree_reuse, "advance_root requires spec.tree_reuse"
    vdt = spec.value_dtype
    A = spec.num_actions
    B, M = tree.rows.shape[:2]
    slots = jnp.arange(M, dtype=jnp.int32)

    root_flat = tree.rows[:, 0].reshape(B, -1)
    onehot = (jnp.arange(A)[None, :] == actions[:, None])
    child_a = jnp.sum(jnp.where(onehot, root_flat[:, :A], 0), axis=-1)
    ev_a = jnp.sum(jnp.where(onehot, root_flat[:, 2 * A:3 * A], 0), axis=-1)
    evs_a = jnp.sum(jnp.where(onehot, root_flat[:, 3 * A:4 * A], 0),
                    axis=-1)

    fresh = ~(child_a > 0.5)              # no allocated child to reuse
    if force_fresh is not None:
        fresh = fresh | force_fresh
    r0 = jnp.where(fresh, -1, child_a).astype(jnp.int32)

    # subtree membership: keep[s] iff the parent chain of s hits r0.
    # Descendants always have larger slots than their parents (allocation
    # order), parents of the root / of unallocated or skipped slots are 0,
    # and slot 0 is never a chosen child — stale entries self-exclude.
    keep = slots[None, :] == r0[:, None]
    anc = tree.parents
    for _ in range(max(1, (M - 1).bit_length())):
        keep = keep | jnp.take_along_axis(keep, anc, axis=1)
        anc = jnp.take_along_axis(anc, anc, axis=1)

    keepi = keep.astype(jnp.int32)
    new_idx = jnp.cumsum(keepi, axis=1) - keepi        # exclusive prefix
    new_count = keepi.sum(axis=1)
    count_eff = jnp.where(fresh, 1, jnp.maximum(new_count, 1))

    # kept slots first, ascending old-slot order; r0 lands at slot 0
    old_of = jnp.argsort(~keep, axis=1, stable=True).astype(jnp.int32)
    flat = tree.rows.reshape(B, M, -1)
    new_flat = jnp.take_along_axis(flat, old_of[:, :, None], axis=1)

    # remap child pointers (>0.5 = real slot) through the renumbering
    ptr = new_flat[:, :, :A]
    vi = jnp.clip(ptr, 0, M - 1).astype(jnp.int32)
    mapped = jnp.take_along_axis(
        new_idx, vi.reshape(B, -1), axis=1).reshape(B, M, A).astype(vdt)
    new_ptr = jnp.where(ptr > 0.5, mapped, ptr)

    # fresh games restart with an empty, unexpanded root row
    empty_root = jnp.concatenate(
        [jnp.full((B, A), ILLEGAL, vdt),
         jnp.zeros((B, tree.rows.shape[2] * 128 - A), vdt)], -1)
    row0 = jnp.where(fresh[:, None],
                     empty_root,
                     jnp.concatenate([new_ptr[:, 0], new_flat[:, 0, A:]],
                                     axis=-1))
    body = jnp.concatenate([new_ptr[:, 1:], new_flat[:, 1:, A:]], axis=-1)
    new_rows = jnp.concatenate([row0[:, None], body], axis=1).reshape(
        tree.rows.shape)

    # compact + remap parent metadata; zero it beyond each game's count so
    # garbage rows can never chain into a future subtree
    par_g = jnp.take_along_axis(tree.parents, old_of, axis=1)
    par_new = jnp.take_along_axis(new_idx, jnp.clip(par_g, 0, M - 1), axis=1)
    valid = slots[None, :] < jnp.where(fresh, 1, new_count)[:, None]
    par_new = jnp.where(valid, par_new, 0).astype(jnp.int32)

    next_slot = jnp.maximum(jnp.max(count_eff), 1).astype(jnp.int32)
    compacted = Tree(
        rows=new_rows,
        n_actions=A,
        root_state=new_root_state,
        root_visit=jnp.where(fresh, 0, ev_a.astype(jnp.int32)),
        root_vsum=jnp.where(fresh, jnp.zeros((), vdt), evs_a.astype(vdt)),
        node_count=count_eff,
        next_slot=next_slot,
        parents=par_new,
    )

    # capacity check: slots 0..M-2 usable (M-1 is the trash row); the next
    # search allocates num_simulations slots starting at next_slot
    overflow = next_slot + spec.num_simulations > M - 1
    fresh_tree = init_tree(new_root_state, spec)
    return jax.tree_util.tree_map(
        lambda f, c: jnp.where(overflow, f, c), fresh_tree, compacted)


def _add_root_noise(tree: Tree, rng: jax.Array | None, spec: SearchSpec,
                    noise: jax.Array | None = None) -> Tree:
    """Mix Dirichlet(alpha) noise over legal root actions into root priors:
    prior <- (1-eps)*prior + eps*noise (reference mcts.py:314-326).

    Sampling gamma(alpha) per action and normalizing over the legal subset
    is exactly a Dirichlet draw on that subset.
    """
    vdt = spec.value_dtype
    A = spec.num_actions
    B = tree.root_visit.shape[0]
    root_flat = tree.rows[:, 0].reshape(B, -1)
    root_prior = root_flat[:, A:2 * A]                           # (B, A)
    legal = root_flat[:, :A] > (ILLEGAL + 0.5)
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
    mixed = jnp.where(legal, (1 - eps) * root_prior + eps * noise,
                      root_prior)
    # prior block = flat [A, 2A) = rows [A//128, 2A//128+...): A=192 is not
    # 128-aligned, so write via the flat view of the single root row.
    new_root = root_flat.at[:, A:2 * A].set(mixed).reshape(
        B, tree.rows.shape[2], tree.rows.shape[3])
    return tree.replace(rows=tree.rows.at[:, 0].set(new_root))


# -----------------------------------------------------------------------------
# Reading results
# -----------------------------------------------------------------------------

def root_child_visits(tree: Tree) -> jax.Array:
    """(B, A) visit counts of the root's children (0 for unvisited/illegal
    actions)."""
    A = tree.num_actions
    B = tree.root_visit.shape[0]
    return tree.rows[:, 0].reshape(B, -1)[:, 2 * A:3 * A].astype(jnp.int32)


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
    A = tree.num_actions
    B = tree.root_visit.shape[0]
    root_flat = tree.rows[:, 0].reshape(B, -1)
    visits = root_flat[:, 2 * A:3 * A].astype(jnp.float32)       # (B, A)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                         visits.shape[:1])[:, None]
    greedy = jax.nn.one_hot(jnp.argmax(visits, -1), visits.shape[-1],
                            dtype=jnp.float32)
    powed = jnp.power(visits, 1.0 / jnp.where(t == 0, 1.0, t))
    total = powed.sum(-1, keepdims=True)
    legal = (root_flat[:, :A] > (ILLEGAL + 0.5)).astype(jnp.float32)
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
