"""Microbench the _alloc_node write pattern with different dtypes/layouts."""
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
ITERS = 800


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{name:50s} {best:7.3f}s  {best/ITERS*1e3:7.3f} ms/iter",
          flush=True)


key = jax.random.PRNGKey(0)
idx0 = jax.random.randint(key, (B,), 0, N)
print(f"B={B} N={N} iters={ITERS}", flush=True)


def loop_write(arrs, make_update):
    """fori loop: per iter, vmapped write of row new_idx per game."""
    def body(i, c):
        arrs, ix = c
        ix = (ix * 37 + i) % N

        def wr(a):
            upd = make_update(a, i)
            return jax.vmap(lambda ab, ib, ub: ab.at[ib].set(ub))(
                a, ix, upd)
        arrs = jax.tree_util.tree_map(wr, arrs)
        return (arrs, ix)
    return jax.lax.fori_loop(0, ITERS, body, (arrs, idx0))[0]


def mk_const(a, i):
    # per-game update row with the right trailing shape/dtype
    return jnp.broadcast_to(
        jnp.asarray(i % 2, a.dtype), (a.shape[0],) + a.shape[2:])


# 1. board (B,N,8,8) int8
bench("board (B,N,8,8) int8",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N, 8, 8), jnp.int8))
# 2. board int32
bench("board (B,N,8,8) int32",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N, 8, 8), jnp.int32))
# 3. board packed (B,N,16) int32
bench("board packed (B,N,16) int32",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N, 16), jnp.int32))
# 4. scalar per node (B,N) int8
bench("scalar (B,N) int8",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N), jnp.int8))
# 5. scalar per node (B,N) int32
bench("scalar (B,N) int32",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N), jnp.int32))
# 6. scalar per node (B,N) bool
bench("scalar (B,N) bool",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N), jnp.bool_))
# 7. the full EnvState-like pytree (int8 board + small scalars)
state8 = dict(board=jnp.zeros((B, N, 8, 8), jnp.int8),
              turn=jnp.zeros((B, N), jnp.int8),
              winner=jnp.zeros((B, N), jnp.int8),
              done=jnp.zeros((B, N), jnp.bool_),
              move_count=jnp.zeros((B, N), jnp.int32))
bench("EnvState pytree int8/bool",
      lambda a: loop_write(a, mk_const), state8)
# 8. all-int32 variant
state32 = dict(board=jnp.zeros((B, N, 8, 8), jnp.int32),
               turn=jnp.zeros((B, N), jnp.int32),
               winner=jnp.zeros((B, N), jnp.int32),
               done=jnp.zeros((B, N), jnp.int32),
               move_count=jnp.zeros((B, N), jnp.int32))
bench("EnvState pytree all-int32",
      lambda a: loop_write(a, mk_const), state32)
# 9. single fused row: state packed into one (B,N,68) int32 row
bench("packed single row (B,N,68) int32",
      lambda a: loop_write(a, mk_const), jnp.zeros((B, N, 68), jnp.int32))
# 10. gather-read of parent row then write (closer to real alloc)
def alloc_like(arrs):
    def body(i, c):
        arrs, ix = c
        pix = (ix * 17 + i) % N
        ix = (ix * 37 + i) % N

        def wr(a):
            parent_row = jax.vmap(lambda ab, ib: ab[ib])(a, pix)
            return jax.vmap(lambda ab, ib, ub: ab.at[ib].set(ub))(
                a, ix, parent_row)
        arrs = jax.tree_util.tree_map(wr, arrs)
        return (arrs, ix)
    return jax.lax.fori_loop(0, ITERS, body, (arrs, idx0))[0]

bench("read-parent+write int8 pytree", alloc_like, state8)
bench("read-parent+write int32 pytree", alloc_like, state32)
