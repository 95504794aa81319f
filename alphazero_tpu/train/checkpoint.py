"""Checkpointing (Orbax): the reference's iteration_N / model_best /
resume-from-latest contract (/root/reference/src/parallel_trainer.py:286-357,
arena.py:176-198) on a TPU-native train-state pytree.

Each checkpoint stores {params, batch_stats, opt_state, learn_calls,
iteration} plus the architecture config, so any consumer (arena, web) can
rebuild the right net from the checkpoint alone — mirroring the reference's
'config' entry (parallel_trainer.py:306-309).

The cosine schedule's T_max is intentionally NOT stored: the schedule is a
closed form over (learn_calls, live Config), reproducing the reference's
force-override of T_max on load (parallel_trainer.py:330-333).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from alphazero_tpu.config import Config

_ITER_RE = re.compile(r"iteration_(\d+)$")


def _ckpt_dir(cfg: Config, name: str) -> str:
    return os.path.abspath(os.path.join(cfg.checkpoint_dir, name))


def save_iteration_checkpoint(cfg: Config, state, iteration: int,
                              name: Optional[str] = None) -> str:
    """Save TrainState as checkpoints/iteration_N (directory).

    Multi-host: EVERY process must call this (Orbax's save is a collective
    with internal barriers — a coordinator-only call deadlocks); Orbax
    writes array data from the primary host for replicated state, and the
    plain-filesystem steps (cleanup, atomic rename, metadata) run on
    process 0 only. Exercised by tests/test_multiprocess.py under a real
    2-process jax.distributed runtime."""
    from alphazero_tpu.utils import is_coordinator
    from alphazero_tpu.train.learner import TrainState

    name = name or f"iteration_{iteration}"
    path = _ckpt_dir(cfg, name)
    multiproc = jax.process_count() > 1
    if is_coordinator():
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        for stale in (path, path + ".tmp_ocp"):
            if os.path.exists(stale):
                shutil.rmtree(stale)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"aztpu_ckpt_clean_{name}")

    # device_get fails on non-fully-addressable (multi-host replicated)
    # arrays; Orbax consumes those jax.Arrays natively. Fully-addressable
    # leaves (e.g. the freshly-set iteration scalar, which is host-local)
    # must become numpy — Orbax refuses host-local jax.Arrays multi-host.
    if multiproc:
        payload = jax.tree_util.tree_map(
            lambda x: np.asarray(x)
            if isinstance(x, jax.Array) and x.is_fully_addressable else x,
            state)
    else:
        payload = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path + ".tmp_ocp", payload)
    if not is_coordinator():
        return path
    os.replace(path + ".tmp_ocp", path)

    meta = {
        "iteration": int(iteration),
        # Everything that changes the param-tree structure must be recorded
        # so any consumer can rebuild the right net from the checkpoint
        # alone (reference contract: web.py:90-101, parallel_trainer.py:
        # 306-309). scan_blocks changes the LAYOUT (stacked leading axis,
        # models/network.py:99-104), not the arch, but a consumer that
        # ignores it cannot restore the pytree.
        "arch": {"num_blocks": cfg.num_blocks,
                 "num_filters": cfg.num_filters,
                 "se_ratio": cfg.se_ratio,
                 "scan_blocks": cfg.scan_blocks},
    }
    with open(os.path.join(path, "alphazero_meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def checkpoint_arch(path: str) -> Dict[str, int]:
    with open(os.path.join(path, "alphazero_meta.json")) as f:
        return json.load(f)["arch"]


def load_checkpoint(path: str, template) -> Any:
    """Restore a TrainState (or matching pytree) from ``path`` using
    ``template`` for structure/dtypes."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def get_latest_iteration(cfg: Config) -> int:
    """Highest iteration number among checkpoints, 0 if none
    (reference parallel_trainer.py:337-357)."""
    best = 0
    for p in glob.glob(os.path.join(cfg.checkpoint_dir, "iteration_*")):
        m = _ITER_RE.search(p)
        if m and os.path.isdir(p):
            best = max(best, int(m.group(1)))
    return best


def list_checkpoints(cfg: Config) -> Dict[str, str]:
    """name -> path for all iteration checkpoints."""
    out = {}
    for p in sorted(glob.glob(os.path.join(cfg.checkpoint_dir,
                                           "iteration_*"))):
        if _ITER_RE.search(p) and os.path.isdir(p):
            out[os.path.basename(p)] = os.path.abspath(p)
    return out


def sync_best_model(cfg: Config, name: str) -> None:
    """Copy checkpoint ``name`` to checkpoints/model_best
    (reference arena.py:176-184). Process 0 only under multi-host."""
    from alphazero_tpu.utils import is_coordinator

    if not is_coordinator():
        return
    src = _ckpt_dir(cfg, name)
    dst = _ckpt_dir(cfg, cfg.best_model)
    if os.path.exists(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
