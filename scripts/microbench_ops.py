"""Micro-benchmarks of the tree-op primitives on TPU.

Measures per-iteration cost of the building blocks the MCTS inner loop uses,
to decide the tree layout redesign.
"""
import sys
import time

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = 801
A = 192
ITERS = 800
DEPTH = 12


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.time() - t0)
    per = best / ITERS * 1e6
    print(f"{name:45s} {best:7.3f}s  {per:9.2f} us/iter", flush=True)


key = jax.random.PRNGKey(0)
arr_f = jax.random.normal(key, (B, N, A), jnp.float32)
arr_i = jnp.zeros((B, N, A), jnp.int32)
vec_f = jnp.zeros((B, N), jnp.float32)
idx0 = jax.random.randint(key, (B,), 0, N)

print(f"B={B} N={N} A={A} iters={ITERS} depth={DEPTH}", flush=True)

# 1. vmapped row scatter-set into (B,N,A) f32
def row_scatter(arr, idx):
    def body(i, c):
        a, ix = c
        ix = (ix * 37 + i) % N
        row = jnp.full((A,), 0.5, jnp.float32) * i
        a = jax.vmap(lambda ab, ib: ab.at[ib].set(row))(a, ix)
        return (a, ix)
    return jax.lax.fori_loop(0, ITERS, body, (arr, idx))[0]

bench("row scatter-set (B,N,A)f32", row_scatter, arr_f, idx0)

# 2. vmapped single-element scatter-add into (B,N) f32, DEPTH per iter
def elem_scatter(vec, idx):
    def body(i, c):
        v, ix = c
        def inner(d, c2):
            v2, ix2 = c2
            ix2 = (ix2 * 31 + d) % N
            v2 = jax.vmap(lambda vb, ib: vb.at[ib].add(1.0))(v2, ix2)
            return (v2, ix2)
        return jax.lax.fori_loop(0, DEPTH, inner, (v, ix))
    return jax.lax.fori_loop(0, ITERS, body, (vec, idx))[0]

bench(f"elem scatter-add (B,N)f32 x{DEPTH}", elem_scatter, vec_f, idx0)

# 3. vmapped row dynamic-slice read of (B,N,A), DEPTH per iter
def row_read(arr, idx):
    def body(i, c):
        acc, ix = c
        def inner(d, c2):
            acc2, ix2 = c2
            row = jax.vmap(lambda ab, ib: ab[ib])(arr, ix2)   # (B, A)
            ix2 = (jnp.argmax(row, -1).astype(jnp.int32) + ix2) % N
            return (acc2 + row.sum(), ix2)
        return jax.lax.fori_loop(0, DEPTH, inner, (acc, ix))
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx))[0]

bench(f"row dyn-slice read (B,N,A) x{DEPTH}", row_read, arr_f, idx0)

# 4. vmapped 192-element gather from (B,N) per level (old layout)
def elem_gather(arr, vec, idx):
    gidx = jnp.abs(arr[:, 0, :]).astype(jnp.int32) % N       # (B, A)
    def body(i, c):
        acc, ix = c
        def inner(d, c2):
            acc2, ix2 = c2
            g = jax.vmap(lambda vb, ib: vb[ib])(vec, (gidx + ix2[:, None]) % N)
            ix2 = (ix2 + jnp.argmax(g, -1).astype(jnp.int32)) % N
            return (acc2 + g.sum(), ix2)
        return jax.lax.fori_loop(0, DEPTH, inner, (acc, ix))
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx))[0]

bench(f"192-gather from (B,N) x{DEPTH}", elem_gather, arr_f, vec_f, idx0)

# 5. empty while-style loop overhead: DEPTH nested trivial iterations
def loop_only(idx):
    def body(i, c):
        acc, ix = c
        def inner(d, c2):
            acc2, ix2 = c2
            return (acc2 + 1.0, (ix2 + 1) % N)
        return jax.lax.fori_loop(0, DEPTH, inner, (acc, ix))
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx))[0]

bench(f"empty nested loop x{DEPTH}", loop_only, idx0)

# 6. pair scatter-add (B,N,A,2)-style: one scatter of 2 contiguous floats
pair = jnp.zeros((B, N, 2), jnp.float32)
def pair_scatter(vec, idx):
    def body(i, c):
        v, ix = c
        def inner(d, c2):
            v2, ix2 = c2
            ix2 = (ix2 * 31 + d) % N
            upd = jnp.stack([jnp.float32(1.0), jnp.float32(0.5)])
            v2 = jax.vmap(lambda vb, ib: vb.at[ib].add(upd))(v2, ix2)
            return (v2, ix2)
        return jax.lax.fori_loop(0, DEPTH, inner, (v, ix))
    return jax.lax.fori_loop(0, ITERS, body, (vec, idx))[0]

bench(f"pair scatter-add (B,N,2)f32 x{DEPTH}", pair_scatter, pair, idx0)
