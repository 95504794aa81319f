"""Microbench candidate primitives for the MCTS tree redesign."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best:7.3f}s  {best/ITERS*1e6:8.1f} us/iter",
          flush=True)


key = jax.random.PRNGKey(0)
idx0 = jax.random.randint(key, (B,), 0, N)
stats = jax.random.normal(key, (B, N), jnp.float32)
bigf = jax.random.normal(key, (B, N, A), jnp.float32)
children = jax.random.randint(key, (B, N, A), 0, N)
print(f"B={B} N={N} A={A} iters={ITERS}", flush=True)

# 1. uniform-slot dynamic_update_slice on (B,N,A): write row i for all games
def uniform_slot(arr):
    def body(i, a):
        row = jnp.full((B, 1, A), 0.5, jnp.float32) * i
        return jax.lax.dynamic_update_slice(a, row, (0, i % N, 0))
    return jax.lax.fori_loop(0, ITERS, body, arr)

bench("uniform-slot DUS (B,N,A)f32 row", uniform_slot, bigf)

# 2. per-game varying single-element scatter-add (B,N) f32 (baseline)
def scat1(s, ix):
    def body(i, c):
        s, ix = c
        ix = (ix * 37 + i) % N
        s = jax.vmap(lambda sb, ib: sb.at[ib].add(1.0))(s, ix)
        return (s, ix)
    return jax.lax.fori_loop(0, ITERS, body, (s, idx0))[0]

bench("scatter-add 1 elem (B,N)f32", scat1, stats, idx0)

# 3. dense one-hot add on (B,N) f32 (select-based update)
def dense1(s, ix):
    iota = jnp.arange(N)[None, :]
    def body(i, c):
        s, ix = c
        ix = (ix * 37 + i) % N
        s = s + (iota == ix[:, None]).astype(jnp.float32)
        return (s, ix)
    return jax.lax.fori_loop(0, ITERS, body, (s, idx0))[0]

bench("dense one-hot add (B,N)f32", dense1, stats, idx0)

# 4. row gather: per game 192 random indices from (B,N) f32
def gath(s, ix):
    def body(i, c):
        acc, ix = c
        cidx = jax.vmap(lambda cb, ib: cb[ib])(children, ix)   # (B, A)
        g = jax.vmap(lambda sb, cb: sb[cb])(s, cidx)           # (B, A)
        ix = (ix + jnp.argmax(g, -1).astype(jnp.int32)) % N
        return (acc + g.sum(), ix)
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx0))[1]

bench("gather 192 elems from (B,N)f32", gath, stats, idx0)

# 5. one-hot matmul gather: onehot(cidx) @ stats_row
def gath_mm(s, ix):
    def body(i, c):
        acc, ix = c
        cidx = jax.vmap(lambda cb, ib: cb[ib])(children, ix)   # (B, A)
        oh = jax.nn.one_hot(cidx, N, dtype=jnp.bfloat16)       # (B, A, N)
        g = jnp.einsum("ban,bn->ba", oh, s.astype(jnp.bfloat16))
        ix = (ix + jnp.argmax(g, -1).astype(jnp.int32)) % N
        return (acc + g.sum().astype(jnp.float32), ix)
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx0))[1]

bench("one-hot matmul gather (B,A,N)bf16", gath_mm, stats, idx0)

# 6. dense equality lookup: find slot with parent==cur & action==a, (B,N) scan
parent = jax.random.randint(key, (B, N), 0, N)
pact = jax.random.randint(key, (B, N), 0, A)
def lookup(ix):
    def body(i, c):
        acc, ix = c
        a = (ix * 7 + i) % A
        match = (parent == ix[:, None]) & (pact == a[:, None])   # (B,N)
        child = jnp.argmax(match, -1).astype(jnp.int32)
        ix = (ix + child) % N
        return (acc + child.sum(), ix)
    return jax.lax.fori_loop(0, ITERS, body, (jnp.int32(0), idx0))[1]

bench("dense (B,N) equality lookup", lookup, idx0)

# 7. varying-index row dynamic-slice read from (B,N,A)
def rowread(ix):
    def body(i, c):
        acc, ix = c
        row = jax.vmap(lambda ab, ib: ab[ib])(bigf, ix)        # (B, A)
        ix = (ix + jnp.argmax(row, -1).astype(jnp.int32)) % N
        return (acc + row.sum(), ix)
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), idx0))[1]

bench("row dyn-slice read (B,N,A)f32", rowread, idx0)

# 8. scatter row write (B,N,A) f32 at varying index (baseline for expand)
def scatrow(arr, ix):
    def body(i, c):
        a, ix = c
        ix = (ix * 37 + i) % N
        row = jnp.full((A,), 0.5, jnp.float32) * i
        a = jax.vmap(lambda ab, ib: ab.at[ib].set(row))(a, ix)
        return (a, ix)
    return jax.lax.fori_loop(0, ITERS, body, (arr, idx0))[0]

bench("scatter row write (B,N,A)f32", scatrow, bigf, idx0)

# 9. scatter-add single (B,N,A,2)-flat edge update (backprop per level)
edge = jnp.zeros((B, N * A * 2,), jnp.float32)
def scatedge(e, ix):
    def body(i, c):
        e, ix = c
        ix = (ix * 37 + i) % (N * A)
        e = jax.vmap(lambda eb, ib: jax.lax.dynamic_update_slice(
            eb, jax.lax.dynamic_slice(eb, (ib * 2,), (2,)) + 1.0,
            (ib * 2,)))(e, ix)
        return (e, ix)
    return jax.lax.fori_loop(0, ITERS, body, (e, idx0))[0]

bench("edge pair DUS-add (B,N*A*2)f32", scatedge, edge, idx0)
