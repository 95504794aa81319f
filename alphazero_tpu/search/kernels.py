"""Pallas TPU kernels for the MCTS tree's varying-index row accesses.

Why these exist: the search tree is a few-hundred-MB array, and each
simulation needs (a) one row read per descent level and (b) one
read-modify-write of 3 scalars per backprop level, both at per-game varying
node indices. Expressed as XLA gather/scatter, the two ops demand
*different* operand layouts ({node-major, game-adjacent} vs {game-major}),
and XLA reconciles them by transpose-copying the whole tree every
simulation — measured as a per-simulation cost growing linearly with tree
capacity (scripts/probe_copy.py), ~1.3ms/sim at 800-simulation capacity.

A Pallas custom call takes its operands in the default layout, so doing the
row traffic with explicit per-game DMAs removes every layout demand from the
XLA graph: the tree keeps ONE layout and all updates stay in place. The
kernels are software-pipelined over games (SLOTS outstanding DMAs).

Both kernels have an XLA fallback (used on CPU, where tests run and where
none of the TPU layout pathology exists).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Outstanding DMAs per pipeline; 16 measured best on v5e (8: -1.7%, 32: -1%).
SLOTS = int(os.environ.get("AZTPU_DMA_SLOTS", "16"))


def _tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# -----------------------------------------------------------------------------
# fetch_rows: out[b] = rows[b, node[b]]
# -----------------------------------------------------------------------------

def _fetch_rows_xla(rows: jax.Array, node: jax.Array) -> jax.Array:
    B = node.shape[0]
    return jax.vmap(lambda r, n: r[n])(rows, node).reshape(B, -1)


@functools.partial(jax.jit, static_argnames=())
def _fetch_rows_tpu(rows: jax.Array, node: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, M, RS, L = rows.shape
    R = RS * L
    S = min(SLOTS, B)

    def kernel(node_ref, rows_ref, out_ref, sems):
        def get_dma(b):
            slot = jax.lax.rem(b, S)
            return pltpu.make_async_copy(
                rows_ref.at[b, node_ref[b]], out_ref.at[b], sems.at[slot])

        def warm(i, carry):
            get_dma(i).start()
            return carry

        jax.lax.fori_loop(0, S, warm, 0)

        def body(b, carry):
            @pl.when(b + S < B)
            def _():
                get_dma(b + S).start()

            get_dma(b).wait()
            return carry

        jax.lax.fori_loop(0, B, body, 0)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, RS, L), rows.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(node, rows)
    return out.reshape(B, R)


def fetch_rows(rows: jax.Array, node: jax.Array) -> jax.Array:
    """(B, R) node rows gathered from (B, M, RS, 128) at per-game node
    indices (R = RS*128). The tree stays 4-D so the DMA-sliced dims are
    untiled and the array is NEVER reshaped (a reshape between the XLA
    carry and the aliased kernel operand breaks in-place aliasing and
    XLA copies the whole tree)."""
    if _tpu():
        return _fetch_rows_tpu(rows, node)
    return _fetch_rows_xla(rows, node)


# -----------------------------------------------------------------------------
# commit_edges: rows[b, node[b], offsets[k] + act[b]] += upd[b, k]
# -----------------------------------------------------------------------------

def _commit_edges_xla(rows, node, act, upd, offsets):
    # Numerics mirror the TPU kernel exactly: the touched row accumulates
    # all K updates in float32 and rounds back to rows.dtype ONCE, so the
    # CPU tests (float64-oracle parity) pin the shipped TPU semantics even
    # for sub-32-bit trees.
    L = rows.shape[-1]
    dtype = rows.dtype

    def one(r, n, a, u):
        row = r[n].astype(jnp.float32)
        for k, off in enumerate(offsets):
            p = off + a
            row = row.at[p // L, p % L].add(u[k])
        return r.at[n].set(row.astype(dtype))

    return jax.vmap(one)(rows, node, act, upd)


def _commit_edges_tpu(rows, node, act, upd, offsets):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, M, RS, L = rows.shape
    K = len(offsets)
    S = min(SLOTS, B)
    dtype = rows.dtype

    def kernel(node_ref, act_ref, upd_ref, rows_in, rows_out,
               in_scratch, out_scratch, sems_in, sems_out):
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (RS, L), 0)
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (RS, L), 1)

        def in_dma(b):
            slot = jax.lax.rem(b, S)
            return pltpu.make_async_copy(
                rows_in.at[b, node_ref[b]], in_scratch.at[slot],
                sems_in.at[slot])

        def out_dma(b):
            slot = jax.lax.rem(b, S)
            return pltpu.make_async_copy(
                out_scratch.at[slot], rows_out.at[b, node_ref[b]],
                sems_out.at[slot])

        def warm(i, carry):
            in_dma(i).start()
            return carry

        jax.lax.fori_loop(0, S, warm, 0)

        def body(b, carry):
            slot = jax.lax.rem(b, S)

            # out_scratch[slot] was last used by game b-S; its write-back
            # must have finished before we overwrite it.
            @pl.when(b >= S)
            def _():
                out_dma(b - S).wait()

            in_dma(b).wait()
            a = act_ref[b]
            # Mask arithmetic stays f32 (upd is staged f32 in SMEM — 16-bit
            # scalars are not SMEM types — and Mosaic cannot relayout the
            # unpacked int32 iota masks against packed 16-bit vregs); the
            # row round-trips through f32, exact for counts the dtype guard
            # in init_tree already enforces.
            add = jnp.zeros((RS, L), jnp.float32)
            for k, off in enumerate(offsets):
                p = off + a
                hit = (iota_row == p // L) & (iota_col == p % L)
                add = add + jnp.where(hit, upd_ref[b, k],
                                      jnp.zeros((), jnp.float32))
            out_scratch[slot] = (in_scratch[slot].astype(jnp.float32)
                                 + add).astype(dtype)
            out_dma(b).start()

            # in_scratch[slot] is free once consumed above.
            @pl.when(b + S < B)
            def _():
                in_dma(b + S).start()

            return carry

        jax.lax.fori_loop(0, B, body, 0)

        def drain(i, carry):
            b = B - S + i

            @pl.when(b >= 0)
            def _():
                out_dma(b).wait()

            return carry

        jax.lax.fori_loop(0, S, drain, 0)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node
            pl.BlockSpec(memory_space=pltpu.SMEM),   # act
            pl.BlockSpec(memory_space=pltpu.SMEM),   # upd
            pl.BlockSpec(memory_space=pltpu.ANY),    # rows (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(rows.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((S, RS, L), dtype),
            pltpu.VMEM((S, RS, L), dtype),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(node, act, upd, rows)
    return out


def commit_edges(rows: jax.Array, node: jax.Array, act: jax.Array,
                 upd: jax.Array, offsets: tuple) -> jax.Array:
    """In-place per-game edge update on the fused tree array.

    rows: (B, M, RS, 128); node/act: (B,) int32; upd: (B, K) is cast to
    float32 (16-bit scalars are not SMEM types on TPU) and accumulated in
    f32 before rounding back to rows.dtype — identically on both paths;
    offsets: K static intra-row flat offsets. Row ``rows[b, node[b]]`` gets
    ``upd[b, k]`` added at flat position ``offsets[k] + act[b]``. Rows
    touched by different games never collide (the leading dim separates
    them)."""
    if _tpu():
        return _commit_edges_tpu(rows, node, act,
                                 upd.astype(jnp.float32), tuple(offsets))
    return _commit_edges_xla(rows, node, act, upd.astype(jnp.float32),
                             tuple(offsets))
