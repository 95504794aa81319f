"""Microbench a realistic fused descent-level body, and dense-op chains."""
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
D = 12


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best:7.3f}s  {best/ITERS/D*1e6:8.1f} us/level",
          flush=True)


key = jax.random.PRNGKey(0)
rows = jax.random.uniform(key, (B, N, 4, A), jnp.float32)
idx0 = jax.random.randint(key, (B,), 0, N)
iota_a = jnp.arange(A)
print(f"B={B} N={N} A={A} iters={ITERS} levels={D}", flush=True)


# full descent level: rowread + PUCT + argmax + one-hot selects + carries
def descent(rows, ix):
    def body(i, c):
        acc, ix, ncur = c
        def level(d, c2):
            acc2, ix2, ncur2 = c2
            row = jax.vmap(lambda rb, ib: rb[ib])(rows, ix2)   # (B,4,A)
            child, prior, ev, evs = (row[:, 0], row[:, 1], row[:, 2],
                                     row[:, 3])
            legal = child > -1.5
            q = jnp.where(ev > 0, -evs / jnp.maximum(ev, 1e-9), 0.0)
            cs = 1.5 * jnp.sqrt(jnp.maximum(ncur2, 1.0))
            u = prior * cs[:, None] / (1.0 + ev)
            score = jnp.where(legal, q + u, -jnp.inf)
            a = jnp.argmax(score, -1)
            oh = (iota_a[None, :] == a[:, None])
            childa = jnp.sum(jnp.where(oh, child, 0.0), -1)
            eva = jnp.sum(jnp.where(oh, ev, 0.0), -1)
            ix2 = jnp.where(childa >= 0, childa, ix2.astype(jnp.float32)
                            ).astype(jnp.int32) % N
            return (acc2 + a.sum(), ix2, eva)
        return jax.lax.fori_loop(0, D, level, (acc, ix, ncur))
    return jax.lax.fori_loop(
        0, ITERS, body, (jnp.int32(0), ix, jnp.ones((B,), jnp.float32)))[1]

bench("descent level (rowread+PUCT+argmax)", descent, rows, idx0)


# chain of k dense (B,A) ops only (no rowread)
def dense_chain(rows, ix):
    row0 = rows[:, 0]
    def body(i, c):
        acc, x = c
        def level(d, c2):
            acc2, x2 = c2
            y = x2 * 1.0001 + row0[:, 0, :A].reshape(B, A) * 0.0
            y = jnp.where(y > 0.5, y * 0.999, y + 0.001)
            a = jnp.argmax(y, -1)
            oh = (iota_a[None, :] == a[:, None])
            z = jnp.sum(jnp.where(oh, y, 0.0), -1)
            return (acc2 + z.sum(), y)
        return jax.lax.fori_loop(0, D, level, (acc, x))
    x0 = jnp.ones((B, A), jnp.float32)
    return jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), x0))[0]

bench("dense (B,A) op chain", dense_chain, rows, idx0)


# backprop level: uniform path-col read + fused 4-plane scatter-add
path_nodes = jax.random.randint(key, (B, 64), 0, N)
path_acts = jax.random.randint(key, (B, 64), 0, A)
def backprop(r, pn, pa):
    def body(i, c):
        r, sgn = c
        def level(d, c2):
            r2, sgn2 = c2
            node = jax.lax.dynamic_slice(pn, (0, d % 64), (B, 1))[:, 0]
            act = jax.lax.dynamic_slice(pa, (0, d % 64), (B, 1))[:, 0]
            upd = jnp.stack([jnp.zeros((B,)), jnp.zeros((B,)),
                             jnp.ones((B,)), sgn2], -1)  # (B,4)
            r2 = jax.vmap(lambda rb, nb, ab, ub:
                          rb.at[nb, :, ab].add(ub))(r2, node, act, upd)
            return (r2, -sgn2)
        return jax.lax.fori_loop(0, D, level, (r, sgn))
    return jax.lax.fori_loop(0, ITERS, body, (r, jnp.ones((B,))))[0]

bench("backprop level (4-plane scatter-add)", backprop, rows, path_nodes, path_acts)
