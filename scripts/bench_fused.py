"""Time fused (Pallas VMEM-resident tower) vs Flax XLA inference forward.

Run on TPU: PYTHONPATH=/root/repo python scripts/bench_fused.py [B] [evals]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.models import init_network
from alphazero_tpu.models.fused import fused_apply, pack_weights
from alphazero_tpu.models.network import policy_value_apply, wl_to_value

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
EVALS = int(sys.argv[2]) if len(sys.argv) > 2 else 800

cfg = Config()
net, variables = init_network(cfg, jax.random.PRNGKey(0))
net_bf = net.clone(dtype=jnp.bfloat16)
packed = pack_weights(net, variables)

rng = np.random.default_rng(0)
mine = rng.random((B, 1, 8, 8)) < 0.2
theirs = (~mine) & (rng.random((B, 1, 8, 8)) < 0.2)
planes0 = jnp.asarray(np.concatenate(
    [mine, theirs, np.ones((B, 1, 8, 8))], 1).astype(np.float32))


def chain(eval_fn):
    @jax.jit
    def loop(p):
        def body(i, p):
            pol, val = eval_fn(p)
            return p + (val[:, None, None, None] * 0).astype(p.dtype)
        return jax.lax.fori_loop(0, EVALS, body, p)
    return loop


def flax_eval(planes):
    return policy_value_apply(net_bf, variables, planes)


def fused_eval(planes):
    pol, wl = fused_apply(packed, planes)
    return jax.nn.softmax(pol, -1), wl_to_value(wl)


# numerics sanity on device first
pf, vf = jax.jit(fused_eval)(planes0)
pr, vr = jax.jit(flax_eval)(planes0)
print(f"max |prob diff| = {float(jnp.abs(pf - pr).max()):.5f}, "
      f"max |value diff| = {float(jnp.abs(vf - vr).max()):.5f}", flush=True)

for name, fn in (("flax", flax_eval), ("fused", fused_eval)):
    loop = chain(fn)
    t0 = time.time()
    np.asarray(loop(planes0))
    print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(planes0))
        best = min(best, time.time() - t0)
    print(f"{name}: {best / EVALS * 1e3:.3f} ms/eval "
          f"({B * EVALS / best:,.0f} evals/s)", flush=True)
