"""Where does the per-eval time go inside the SE-ResNet forward?

Times stripped-down variants of the flagship net (B x 800 sequential
evals, the search's evaluation pattern) to attribute the gap between the
measured eval time and the MXU roofline (~1.04 ms at B=512 bf16):

  full        : the real net
  nobn        : BatchNorm layers removed (inference-fold ceiling)
  nose        : SE blocks removed
  convsonly   : convs+relu only (no BN, no SE)

Run: PYTHONPATH=/root/repo python scripts/probe_net_cost.py [B] [evals]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
EVALS = int(sys.argv[2]) if len(sys.argv) > 2 else 800
C, BLOCKS = 128, 20
DT = jnp.bfloat16


class Block(nn.Module):
    use_bn: bool
    use_se: bool

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(C, (3, 3), padding="SAME", use_bias=not self.use_bn,
                    dtype=DT)(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=True, dtype=DT)(y)
        y = nn.relu(y)
        y = nn.Conv(C, (3, 3), padding="SAME", use_bias=not self.use_bn,
                    dtype=DT)(y)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=True, dtype=DT)(y)
        if self.use_se:
            p = jnp.mean(y, axis=(1, 2))
            h = nn.relu(nn.Dense(C // 8, dtype=DT)(p))
            h = nn.Dense(2 * C, dtype=DT)(h)
            g, b = jnp.split(h, 2, -1)
            y = y * jax.nn.sigmoid(g)[:, None, None, :] + b[:, None, None, :]
        return nn.relu(y + x)


class Net(nn.Module):
    use_bn: bool
    use_se: bool

    @nn.compact
    def __call__(self, planes):
        x = jnp.transpose(planes, (0, 2, 3, 1)).astype(DT)
        x = nn.relu(nn.Conv(C, (3, 3), padding="SAME", dtype=DT)(x))
        for _ in range(BLOCKS):
            x = Block(self.use_bn, self.use_se)(x)
        p = nn.relu(nn.Conv(C, (3, 3), padding="SAME", dtype=DT)(x))
        pol = nn.Dense(192, dtype=DT)(p.reshape(p.shape[0], -1))
        v = nn.relu(nn.Conv(32, (1, 1), dtype=DT)(x))
        v = nn.relu(nn.Dense(128, dtype=DT)(v.reshape(v.shape[0], -1)))
        wl = nn.Dense(2, dtype=DT)(v)
        return pol.astype(jnp.float32), wl.astype(jnp.float32)


def time_variant(name, use_bn, use_se):
    net = Net(use_bn, use_se)
    planes = jnp.zeros((B, 3, 8, 8), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), planes)

    @jax.jit
    def loop(p):
        def body(i, p):
            pol, wl = net.apply(variables, p)
            return p + (wl[:, :1, None, None] * 0).astype(p.dtype)
        return jax.lax.fori_loop(0, EVALS, body, p)

    np.asarray(loop(planes))  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(planes))
        best = min(best, time.time() - t0)
    print(f"{name:10s}: {best / EVALS * 1e3:.3f} ms/eval "
          f"({B * EVALS / best:,.0f} evals/s)", flush=True)


class ShiftConv3x3(nn.Module):
    """3x3 SAME conv expressed as 9 shifted (HW-batched) matmuls: avoids
    XLA's conv path, which measures ~50% MXU efficiency at 8x8x128."""

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, Cin = x.shape
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, Cin, self.features), jnp.float32).astype(DT)
        pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                shifted = jax.lax.dynamic_slice(
                    pad, (0, dy, dx, 0), (B, H, W, Cin))
                term = jnp.einsum("bhwc,cf->bhwf", shifted, w[dy, dx],
                                  preferred_element_type=jnp.float32)
                out = term if out is None else out + term
        return out.astype(DT)


class ShiftBlock(nn.Module):
    use_se: bool

    @nn.compact
    def __call__(self, x):
        y = nn.relu(ShiftConv3x3(C)(x))
        y = ShiftConv3x3(C)(y)
        if self.use_se:
            p = jnp.mean(y, axis=(1, 2))
            h = nn.relu(nn.Dense(C // 8, dtype=DT)(p))
            h = nn.Dense(2 * C, dtype=DT)(h)
            g, b = jnp.split(h, 2, -1)
            y = y * jax.nn.sigmoid(g)[:, None, None, :] + b[:, None, None, :]
        return nn.relu(y + x)


class ShiftNet(nn.Module):
    use_se: bool

    @nn.compact
    def __call__(self, planes):
        x = jnp.transpose(planes, (0, 2, 3, 1)).astype(DT)
        x = nn.relu(ShiftConv3x3(C)(x))
        for _ in range(BLOCKS):
            x = ShiftBlock(self.use_se)(x)
        p = nn.relu(ShiftConv3x3(C)(x))
        pol = nn.Dense(192, dtype=DT)(p.reshape(p.shape[0], -1))
        v = nn.relu(nn.Conv(32, (1, 1), dtype=DT)(x))
        v = nn.relu(nn.Dense(128, dtype=DT)(v.reshape(v.shape[0], -1)))
        wl = nn.Dense(2, dtype=DT)(v)
        return pol.astype(jnp.float32), wl.astype(jnp.float32)


def time_net(name, net):
    planes = jnp.zeros((B, 3, 8, 8), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), planes)

    @jax.jit
    def loop(p):
        def body(i, p):
            pol, wl = net.apply(variables, p)
            return p + (wl[:, :1, None, None] * 0).astype(p.dtype)
        return jax.lax.fori_loop(0, EVALS, body, p)

    np.asarray(loop(planes))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(planes))
        best = min(best, time.time() - t0)
    print(f"{name:10s}: {best / EVALS * 1e3:.3f} ms/eval "
          f"({B * EVALS / best:,.0f} evals/s)", flush=True)


if os.environ.get("PROBE_SHIFT"):
    time_net("shiftconv", ShiftNet(True))
    time_net("shift_nose", ShiftNet(False))
else:
    time_variant("full", True, True)
    time_variant("nobn", False, True)
    time_variant("nose", True, False)
    time_variant("convsonly", False, False)
