"""Device mesh + sharding for multi-chip scaling.

The reference has NO distributed machinery (SURVEY.md §2 #17); its only
parallelism is batching games through one network. The TPU-native scaling
story makes that batch the *sharded* dimension:

- mesh axes ("data", "model"): self-play games and learner batches shard
  over "data" (ICI-routed collectives); "model" is available for tensor
  parallelism but defaults to 1 — an 8M-param SE-ResNet replicates
  comfortably, so data parallelism over games is the scaling dimension
  (exactly the dimension the reference scales in Python).
- the SAME jitted programs run single-chip or sharded: we annotate inputs
  with NamedSharding and let XLA insert the collectives (psum for gradient
  and BatchNorm reductions) — no pmap, no hand-written communication.
- multi-host: jax.distributed.initialize() composes with this module; each
  host feeds its local shard of the game batch, learner reductions ride ICI
  within a slice and DCN across (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alphazero_tpu.config import Config
from alphazero_tpu.search.mcts import SearchSpec

# Layering: parallel/ sits BELOW train/ (trainer.py imports this module at
# module scope). Importing alphazero_tpu.train here at module scope closes
# an import cycle that only bites when alphazero_tpu.parallel is imported
# first — exactly what __graft_entry__.dryrun_multichip does — so the
# train_step/selfplay_move imports are deferred into the factory functions
# below. Regression-pinned by tests/test_imports.py (subprocess import).


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"{len(devices)} devices != data {data} x model {model}")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batch-leading arrays with the batch dim sharded
    over the mesh "data" axis."""
    def put(x):
        spec = P("data") if jnp.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def sharded_train_step(mesh: Mesh, net, cfg: Config):
    """The train step compiled for the mesh: state replicated, batch sharded
    over "data". Gradient and BatchNorm reductions become XLA collectives."""
    from alphazero_tpu.train.learner import train_step

    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        functools.partial(train_step, net=net, cfg=cfg),
        in_shardings=(rep, (data, data, data), data),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def sharded_selfplay_move(mesh: Mesh, eval_fn, spec: SearchSpec,
                          temperature_threshold: int):
    """One lockstep self-play move with games sharded over "data". The
    entire search tree inherits the game-axis sharding from the input
    states (shard them with ``shard_batch``); per-game tree walks are
    embarrassingly parallel, and each simulation's batched net forward runs
    data-parallel with replicated weights.

    Multi-chip TPU note: the search's Pallas tree kernels dispatch on the
    backend (search/kernels.py) and are exercised per-shard. XLA's SPMD
    partitioner handles the batch-leading custom calls here because every
    operand is sharded on the same leading axis; if a future XLA version
    rejects that, wrap this function's body in ``jax.shard_map`` over the
    "data" axis (each shard then runs the identical single-chip program).
    The CPU-mesh dry run exercises the XLA fallback path."""
    from alphazero_tpu.train.selfplay import selfplay_move

    def move(states, rng):
        return selfplay_move(states, rng, eval_fn, spec,
                             temperature_threshold)

    return jax.jit(move)
