"""Trainer: orchestrates self-play -> replay -> learn -> checkpoint.

The reference's restartable training loop (/root/reference/main.py:24-90,
src/parallel_trainer.py): resume from the latest iteration checkpoint,
reload the newest buffer_size examples from disk, then forever
{selfplay_batches x parallel_games self-play -> learn 1 epoch -> append
data -> checkpoint}. Crash-anywhere restartability is preserved: every
artifact is re-loadable and the loop is idempotent per iteration.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.models import init_network
from alphazero_tpu.models.network import AlphaZeroNet
from alphazero_tpu.search.mcts import make_net_evaluator
from alphazero_tpu.train import checkpoint as ckpt
from alphazero_tpu.train.learner import (
    TrainState,
    create_train_state,
    train_epoch,
    train_step,
)
from alphazero_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_train_step,
)
from alphazero_tpu.train.replay import (
    ReplayBuffer,
    append_training_data,
    epoch_batches,
    host_data_path,
    load_training_data,
)
from alphazero_tpu.train.selfplay import (
    selfplay_games,
    selfplay_games_continuous,
)
from alphazero_tpu.utils import is_coordinator, profile_trace, setup_logging

log = setup_logging()


def _host_local(tree):
    """Fetch a pytree of device arrays to host numpy.

    Multi-host replicated arrays are not fully addressable, so
    jax.device_get raises on them; every host holds the full value locally
    (shard 0 of a replicated layout IS the value), so fetch that."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x) if isinstance(x, jax.Array) else x
    return jax.tree_util.tree_map(get, tree)


class Trainer:
    def __init__(self, cfg: Config, seed: int = 0,
                 net: Optional[AlphaZeroNet] = None,
                 state: Optional[TrainState] = None):
        self.cfg = cfg
        if net is None or state is None:
            net, variables = init_network(cfg, jax.random.PRNGKey(seed))
            state = create_train_state(cfg, net, variables)
        self.net = net
        self.state = state
        # Multi-chip: shard the game/learner batch over the mesh "data"
        # axis, replicate parameters; XLA inserts the collectives. With one
        # device this is the identity layout (SURVEY.md §5).
        n_dev = jax.device_count()
        self.n_proc = jax.process_count()
        self.proc = jax.process_index()
        if n_dev > 1:
            self.mesh = make_mesh()
            self.state = replicate(self.mesh, self.state)
            self._train_step = sharded_train_step(self.mesh, self.net, cfg)
            # Multi-host: the learner mesh is GLOBAL (gradients psum over
            # ICI/DCN); self-play actors run per host on their addressable
            # devices with host-local replay (SURVEY.md §5).
            self.actor_mesh = (make_mesh(jax.local_devices())
                               if self.n_proc > 1 else self.mesh)
            log.info("training sharded over %d devices (mesh %s)",
                     n_dev, dict(zip(self.mesh.axis_names,
                                     self.mesh.devices.shape)))
            if cfg.batch_size % n_dev != 0:
                if self.n_proc > 1:
                    # Multi-host, the unsharded fallback is a CORRECTNESS
                    # failure, not a perf cliff: each host would train on
                    # its own host-local data with no psum, silently
                    # diverging parameters across hosts.
                    raise ValueError(
                        f"batch_size {cfg.batch_size} is not divisible by "
                        f"{n_dev} devices under {self.n_proc} processes: "
                        "the unsharded fallback would silently diverge "
                        "parameters across hosts — pick a divisible batch "
                        "size")
                log.warning(
                    "batch_size %d is not divisible by %d devices: learn() "
                    "will fall back to the SINGLE-device train step on "
                    "replicated state (a large perf cliff) — pick a "
                    "divisible batch size", cfg.batch_size, n_dev)
            # self-play runs on the ACTOR mesh (host-local under
            # multi-host), so its divisibility is against local devices
            actor_dev = (jax.local_device_count() if self.n_proc > 1
                         else n_dev)
            if cfg.parallel_games % actor_dev != 0:
                log.warning(
                    "parallel_games %d is not divisible by %d actor "
                    "devices: self-play will run UNSHARDED on one device — "
                    "pick a divisible game count", cfg.parallel_games,
                    actor_dev)
        else:
            self.mesh = None
            self.actor_mesh = None
            self._train_step = None
        self.buffer = ReplayBuffer(cfg.buffer_size,
                                   num_actions=cfg.num_actions)
        # per-host streams: every host must play DIFFERENT games (and may
        # sample different learner batches — gradients are psum'd anyway)
        self.rng = jax.random.fold_in(jax.random.PRNGKey(seed + 1),
                                      self.proc)
        self.np_rng = np.random.default_rng(seed + 2 + self.proc)
        self.iteration = int(state.iteration)
        # structured per-iteration metrics (stdout logging + JSONL file)
        self.metrics_path = cfg.checkpoint_path("metrics.jsonl")
        # --profile DIR: capture ONE device trace per phase (selfplay /
        # learn) into DIR, viewable in TensorBoard/XProf (SURVEY.md §5
        # tracing obligation). One-shot so steady-state iterations keep
        # running untraced.
        self.profile_dir: Optional[str] = None
        self._profiled: set = set()

    def _maybe_profile(self, phase: str):
        if self.profile_dir and phase not in self._profiled:
            self._profiled.add(phase)
            logdir = os.path.join(self.profile_dir, phase)
            log.info("profiling %s phase -> %s", phase, logdir)
            return profile_trace(logdir)
        return contextlib.nullcontext()

    # -- self-play ---------------------------------------------------------
    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _inference_net(self):
        """A compute-dtype twin of the training net for search inference
        (params stay f32; activations run at cfg.inference_dtype — the
        benchmarked MXU configuration)."""
        import jax.numpy as jnp_

        dtype = jnp_.dtype(self.cfg.inference_dtype)
        if dtype == self.net.dtype:
            return self.net
        return self.net.clone(dtype=dtype)

    def _selfplay_evaluator(self):
        """The search evaluator for self-play: bf16 (default) or the int8
        tower (cfg.selfplay_quant, docs/quant-int8.md). Static scales are
        recalibrated each call on current replay positions — the closure's
        arrays are hoisted to runtime args by jit, so per-iteration scale
        changes don't invalidate the persistent compile cache."""
        if self.cfg.selfplay_quant == "off":
            return make_net_evaluator(self._inference_net(),
                                      self._variables())
        from alphazero_tpu.models.quant import (
            calibrate, make_quant_evaluator, quantize_network,
        )

        net, variables = self._inference_net(), self._variables()
        qp = quantize_network(net, variables)
        act_scales = None
        if self.cfg.selfplay_quant == "static" and len(self.buffer) > 0:
            # fixed 4096-sample draw WITH replacement: calibration batch
            # shapes stay (1024, ...) x 4 regardless of buffer fill, so
            # calibrate()'s jitted forward compiles exactly once per run
            n = 4096
            idx = self.np_rng.integers(0, len(self.buffer), size=n)
            planes = self.buffer.states[idx].astype(np.float32)
            batches = [jnp.asarray(planes[i:i + 1024])
                       for i in range(0, n, 1024)]
            act_scales = calibrate(qp, batches)
        return make_quant_evaluator(net, variables, act_scales=act_scales,
                                    qp=qp)

    def execute_selfplay(self, num_games: Optional[int] = None):
        eval_fn = self._selfplay_evaluator()
        self.rng, k = jax.random.split(self.rng)
        play = (selfplay_games_continuous if self.cfg.continuous_selfplay
                else selfplay_games)
        with self._maybe_profile("selfplay"):
            examples, stats = play(eval_fn, self.cfg, k,
                                   num_games=num_games,
                                   mesh=self.actor_mesh)
        return examples, stats

    # -- learning ----------------------------------------------------------
    def _device_batch(self, arrays):
        """Host-local numpy batch -> mesh-data-sharded device arrays.

        Single-process: plain shard_batch. Multi-host: every host holds
        only its local shard, assembled into one global array
        (jax.make_array_from_process_local_data)."""
        if self.n_proc > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
            return tuple(
                jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)) for x in arrays)
        return shard_batch(self.mesh,
                           tuple(jnp.asarray(x) for x in arrays))

    # fixed upload-block row count: update_rows compiles once for this
    # shape; ~8k rows x ~1 KB/row = ~8 MB per block transfer
    _REPLAY_BLOCK = 8192

    def _device_replay(self):
        """Device-resident mirror of the replay window (full capacity
        shape; rows >= len(buffer) are never indexed). Synced from the
        host ring via ReplayBuffer.consume_writes(): the whole window
        uploads once (~0.3 GB at 300k), after which only newly-written row
        spans transfer (~70 MB/iteration) in fixed-size blocks — the host
        buffer stays the single source of truth."""
        from alphazero_tpu.train.learner import update_rows

        buf = self.buffer
        spans = buf.consume_writes()
        arrays = getattr(self, "_dev_replay_arrays", None)
        if arrays is None or spans is None:
            self._dev_replay_arrays = (
                jax.device_put(buf.states),
                jax.device_put(buf.policies),
                jax.device_put(buf.wls),
            )
            return self._dev_replay_arrays
        B = min(self._REPLAY_BLOCK, buf.capacity)
        s_d, p_d, w_d = arrays
        for start, n in spans:
            # cover [start, start+n) with B-row blocks; the last block
            # shifts back (overlapping rows that already hold current
            # values — identical rewrites) so every block has B rows
            starts = [start + i * B for i in range(n // B)]
            if n % B:
                starts.append(max(0, start + n - B))
            for bs in starts:
                sl = slice(bs, bs + B)
                s_d, p_d, w_d = update_rows(
                    s_d, p_d, w_d, buf.states[sl], buf.policies[sl],
                    buf.wls[sl], np.int32(bs))
        self._dev_replay_arrays = (s_d, p_d, w_d)
        return self._dev_replay_arrays

    def learn(self, epochs: Optional[int] = None,
              batch_size: Optional[int] = None) -> Dict[str, float]:
        """One learn() call = reference semantics: iterate over the
        (2x-augmented) buffer for `epochs`, then advance the cosine schedule
        once (parallel_trainer.py:225-284)."""
        epochs = epochs if epochs is not None else self.cfg.training_epochs
        batch_size = batch_size or self.cfg.batch_size
        if len(self.buffer) == 0:
            return {}

        use_sharded = (self.mesh is not None
                       and batch_size % self.mesh.devices.size == 0)
        if self.n_proc > 1 and not use_sharded:
            raise RuntimeError(
                f"learn(batch_size={batch_size}) cannot use the sharded "
                f"train step under {self.n_proc} processes: the unsharded "
                "fallback trains each host on different local data with no "
                "psum (silent parameter divergence)")
        # Multi-host: each host contributes its local share of the global
        # batch from its host-local buffer; collectives are lockstep, so
        # every host runs process 0's step count (epoch_batches wraps or
        # truncates its local permutation to fit).
        local_bs = (batch_size // self.n_proc
                    if use_sharded else batch_size)
        steps = None
        if use_sharded and self.n_proc > 1:
            from jax.experimental import multihost_utils

            local_steps = max(1, -(-2 * len(self.buffer) // local_bs))
            steps = int(multihost_utils.broadcast_one_to_all(
                np.int32(local_steps)))

        # Single-device: the whole epoch runs as ONE compiled scan over the
        # device-resident replay window (learner.train_epoch) — per-step
        # batch uploads and dispatch latency dominated learn() wall-clock
        # on the tunneled backend (~150-170 ms/step vs ~30 ms compute).
        use_device_epoch = (self.mesh is None and self.n_proc == 1
                            and self.cfg.device_replay)

        # Metrics stay on device until the end: converting per step
        # (float(v)) blocks the host on every step and serializes the
        # dispatch pipeline.
        step_metrics: List[Dict] = []
        with self._maybe_profile("learn"):
            for _ in range(epochs):
                # Reference epoch semantics: every buffered example in both
                # orientations exactly once, shuffled (see epoch_batches).
                base_idx, mirrors = epoch_batches(
                    self.np_rng, len(self.buffer), local_bs, steps=steps)
                if use_device_epoch:
                    self.state, metrics = train_epoch(
                        self.state, self._device_replay(),
                        jnp.asarray(base_idx.astype(np.int32)),
                        jnp.asarray(mirrors), self.net, self.cfg)
                    step_metrics.append(metrics)  # (steps,) per key
                    continue
                for bi, mirror in zip(base_idx, mirrors):
                    batch = self.buffer.get(bi)
                    if use_sharded:
                        sharded = self._device_batch(batch)
                        m_sharded = self._device_batch((mirror,))[0]
                        self.state, metrics = self._train_step(
                            self.state, sharded, m_sharded)
                    else:
                        self.state, metrics = train_step(
                            self.state,
                            tuple(jnp.asarray(x) for x in batch),
                            jnp.asarray(mirror),
                            self.net, self.cfg)
                    step_metrics.append(metrics)
            host = _host_local(step_metrics)   # sync inside the trace

        self.state = self.state.replace(
            learn_calls=self.state.learn_calls + 1)
        return {k: float(np.mean([m[k] for m in host]))
                for k in host[0]}

    # -- persistence ---------------------------------------------------------
    # Multi-host write contract: every host computes identical replicated
    # state, so checkpoints / npz / metrics are written by process 0 only
    # (utils.is_coordinator) — otherwise hosts race on the same files.

    def save(self, iteration: Optional[int] = None) -> str:
        it = self.iteration if iteration is None else iteration
        self.state = self.state.replace(
            iteration=jnp.asarray(it, jnp.int32))
        # every process participates (Orbax save is a collective); plain
        # filesystem writes inside happen on process 0 only
        path = ckpt.save_iteration_checkpoint(self.cfg, self.state, it)
        if self.n_proc > 1:
            # Barrier: no host may proceed (or resume()) until process 0's
            # checkpoint is fully on disk — otherwise a fast host can race
            # past the save and read a half-written iteration_N.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"aztpu_save_{it}")
        return path

    def _rebuild_net(self, cfg: Config) -> None:
        """Rebuild net/state/train-step for a config whose param-tree
        structure differs from the live one (e.g. a checkpoint trained with
        the scanned tower — the layouts are not interchangeable,
        models/network.py:99-104)."""
        self.cfg = cfg
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        self.net = net
        self.state = create_train_state(cfg, net, variables)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self._train_step = sharded_train_step(self.mesh, self.net, cfg)

    def resume(self) -> int:
        """Load the latest checkpoint + replay tail; returns iteration.

        The checkpoint's recorded arch/layout wins over the live config
        (reference contract: consumers rebuild the net from the checkpoint
        alone, web.py:90-101) — so a run trained with --scan-blocks resumes
        correctly under the default config and vice versa."""
        it = ckpt.get_latest_iteration(self.cfg)
        if it > 0:
            path = self.cfg.checkpoint_path(f"iteration_{it}")
            try:
                arch = ckpt.checkpoint_arch(path)
            except (OSError, KeyError, ValueError):
                arch = {}
            ck_cfg = self.cfg.replace(
                num_blocks=arch.get("num_blocks", self.cfg.num_blocks),
                num_filters=arch.get("num_filters", self.cfg.num_filters),
                se_ratio=arch.get("se_ratio", self.cfg.se_ratio),
                scan_blocks=arch.get("scan_blocks", False))
            if ck_cfg != self.cfg:
                log.warning(
                    "checkpoint %s arch %s overrides the live config "
                    "(param layouts are not interchangeable)", path,
                    {k: getattr(ck_cfg, k) for k in
                     ("num_blocks", "num_filters", "se_ratio",
                      "scan_blocks")})
                self._rebuild_net(ck_cfg)
            self.state = ckpt.load_checkpoint(path, self.state)
            self.iteration = it
        loaded = load_training_data(
            host_data_path(self.cfg.checkpoint_path(self.cfg.data_file),
                           self.proc),
            self.buffer)
        if it or loaded:
            log.info("resumed at iteration %d with %d examples", it, loaded)
        return it

    def append_data(self, examples) -> int:
        # replay data is HOST-LOCAL (each host persists its own shard file,
        # no cross-host race); checkpoints/metrics stay process-0-only
        path = host_data_path(
            self.cfg.checkpoint_path(self.cfg.data_file), self.proc)
        return append_training_data(path, examples)

    # -- the loop ------------------------------------------------------------
    def run_iteration(self) -> Dict[str, float]:
        """One training iteration: selfplay_batches rounds of self-play,
        one learn() call, persist data + checkpoint."""
        t0 = time.time()
        new_examples: List = []
        selfplay_stats: List[Dict] = []
        if self.cfg.continuous_selfplay:
            # one continuous auto-resetting run for the whole iteration's
            # game budget — stopping discards in-flight episodes, so fewer,
            # longer runs waste less
            target = self.cfg.selfplay_batches * self.cfg.parallel_games
            examples, stats = self.execute_selfplay(num_games=target)
            new_examples.extend(examples)
            selfplay_stats.append(stats)
            log.info("selfplay: %d examples (%d games, %d sims)",
                     stats["examples"], stats["games"],
                     stats["simulations"])
        else:
            for b in range(self.cfg.selfplay_batches):
                examples, stats = self.execute_selfplay()
                new_examples.extend(examples)
                selfplay_stats.append(stats)
                log.info(
                    "selfplay batch %d/%d: %d examples (%d games, %d sims)",
                    b + 1, self.cfg.selfplay_batches, stats["examples"],
                    stats["games"], stats["simulations"])
        selfplay_s = time.time() - t0

        if new_examples:
            self.buffer.add_arrays(
                np.stack([e[0] for e in new_examples]),
                np.stack([e[1] for e in new_examples]),
                np.stack([e[2] for e in new_examples]))
        t1 = time.time()
        metrics = self.learn()
        learn_s = time.time() - t1

        self.append_data(new_examples)
        self.iteration += 1
        self.save()

        total_sims = sum(s["simulations"] for s in selfplay_stats)
        total_games = sum(s["games"] for s in selfplay_stats)
        metrics.update({
            "iteration": self.iteration,
            "examples_new": len(new_examples),
            "buffer": len(self.buffer),
            "selfplay_seconds": round(selfplay_s, 2),
            "learn_seconds": round(learn_s, 2),
            "sims_per_sec": round(total_sims / max(selfplay_s, 1e-9), 1),
            "games_per_hour": round(
                3600.0 * total_games / max(selfplay_s + learn_s, 1e-9), 1),
        })
        log.info("iteration %d done: %s", self.iteration, metrics)
        self._write_metrics(metrics)
        return metrics

    def _write_metrics(self, metrics: Dict) -> None:
        if not is_coordinator():
            return
        try:
            os.makedirs(os.path.dirname(self.metrics_path) or ".",
                        exist_ok=True)
            with open(self.metrics_path, "a") as f:
                f.write(json.dumps(
                    {"ts": time.time(), **metrics}, default=float) + "\n")
        except OSError as e:  # metrics are best-effort
            log.warning("could not write metrics: %s", e)

    def train_forever(self, max_iterations: Optional[int] = None):
        self.resume()
        while max_iterations is None or self.iteration < max_iterations:
            self.run_iteration()
