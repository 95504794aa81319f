"""Learner: losses, optimizer, LR schedule, and the jitted train step.

Training contract matches the reference
(/root/reference/src/parallel_trainer.py:225-284):

- policy loss: soft-target cross-entropy, -mean(sum(pi * log_softmax))
- value loss: win/loss cross-entropy (soft targets)
- total = policy + value, unweighted
- Adam(lr=1e-3) with L2-style weight decay 1e-4 added to the *clipped*
  gradient (torch Adam weight_decay semantics), global-norm clip 1.0
- cosine-annealing LR advanced once per learn() call (NOT per minibatch),
  T_max always taken from the live config — reproducing the reference's
  checkpoint T_max override (parallel_trainer.py:330-333)
- horizontal-mirror augmentation doubling the data
  (parallel_trainer.py:33-70): done on device as a per-sample random mirror
  (state column flip + a constant 192-permutation of the policy)

The step is pure and pytree-in/pytree-out, so the identical function runs
single-chip or pjit-sharded over a mesh data axis.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from alphazero_tpu.config import Config
from alphazero_tpu.models.network import AlphaZeroNet


def mirror_permutation(board_size: int = 8) -> np.ndarray:
    """perm such that mirrored_policy[perm[a]] = policy[a]: square column
    mirrored, diag-left <-> diag-right (parallel_trainer.py:54-67)."""
    perm = np.zeros(board_size * board_size * 3, np.int32)
    dir_swap = {0: 0, 1: 2, 2: 1}
    for sq in range(board_size * board_size):
        r, c = divmod(sq, board_size)
        msq = r * board_size + (board_size - 1 - c)
        for d in range(3):
            perm[sq * 3 + d] = msq * 3 + dir_swap[d]
    return perm


_MIRROR_PERM = mirror_permutation()
# inverse permutation: mirrored[a] = original[inv[a]] (self-inverse here,
# but compute it properly for clarity)
_MIRROR_GATHER = np.argsort(_MIRROR_PERM).astype(np.int32)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    learn_calls: jax.Array  # cosine schedule position (stepped per learn())
    iteration: jax.Array


def cosine_lr(cfg: Config, learn_calls: jax.Array) -> jax.Array:
    """torch CosineAnnealingLR closed form: eta_min + (base - eta_min) *
    (1 + cos(pi * t / T_max)) / 2, with T_max from the live config."""
    t = learn_calls.astype(jnp.float32)
    cos = jnp.cos(jnp.pi * t / cfg.lr_t_max)
    return cfg.lr_eta_min + (cfg.learning_rate - cfg.lr_eta_min) * (
        1.0 + cos) / 2.0


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """clip -> add L2 decay -> Adam scaling. The learning rate is applied
    manually in train_step so the cosine position can live in TrainState."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
    )


def create_train_state(cfg: Config, net: AlphaZeroNet,
                       variables: Dict[str, Any]) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        learn_calls=jnp.zeros((), jnp.int32),
        iteration=jnp.zeros((), jnp.int32),
    )


def loss_fn(params, batch_stats, net: AlphaZeroNet, states, target_pi,
            target_wl):
    (policy_logits, wl_logits), mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        states, train=True, mutable=["batch_stats"])
    log_pi = jax.nn.log_softmax(policy_logits, axis=-1)
    loss_pi = -jnp.mean(jnp.sum(target_pi * log_pi, axis=-1))
    log_wl = jax.nn.log_softmax(wl_logits, axis=-1)
    loss_wl = -jnp.mean(jnp.sum(target_wl * log_wl, axis=-1))
    loss = loss_pi + loss_wl
    return loss, (loss_pi, loss_wl, mutated["batch_stats"])


def _train_step_impl(
    state: TrainState,
    batch: Tuple[jax.Array, jax.Array, jax.Array],
    mirror_bits: jax.Array,
    net: AlphaZeroNet,
    cfg: Config,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One SGD step. ``mirror_bits`` (B,) bool selects per-sample horizontal
    mirroring (expectation-equivalent to the reference's dataset doubling)."""
    states, target_pi, target_wl = batch
    states = states.astype(jnp.float32)

    mirrored_states = states[..., ::-1]
    mirrored_pi = target_pi[:, jnp.asarray(_MIRROR_GATHER)]
    m = mirror_bits[:, None]
    target_pi = jnp.where(m, mirrored_pi, target_pi)
    states = jnp.where(m[..., None, None], mirrored_states, states)

    lr = cosine_lr(cfg, state.learn_calls)
    tx = make_optimizer(cfg)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (loss_pi, loss_wl, new_stats)), grads = grad_fn(
        state.params, state.batch_stats, net, states, target_pi, target_wl)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(state.params, updates)

    metrics = {"loss": loss, "loss_pi": loss_pi, "loss_wl": loss_wl,
               "lr": lr}
    return state.replace(params=new_params, batch_stats=new_stats,
                         opt_state=new_opt_state), metrics


train_step = functools.partial(
    jax.jit, static_argnames=("net", "cfg"), donate_argnums=0
)(_train_step_impl)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def update_rows(states, policies, wls, s_upd, p_upd, w_upd, start):
    """In-place row-span write into the device-resident replay window.

    The update block has a FIXED row count (trainer uses one block size),
    so this compiles once; ``start`` is a dynamic scalar. Blocks may
    overlap rows already holding current data — the host buffer is the
    source of truth and overlapping rewrites are identical values."""
    def upd(buf, u):
        zeros = (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, u.astype(buf.dtype),
                                            (start,) + zeros)

    return upd(states, s_upd), upd(policies, p_upd), upd(wls, w_upd)


@functools.partial(jax.jit, static_argnames=("net", "cfg"), donate_argnums=0)
def train_epoch(
    state: TrainState,
    buf: Tuple[jax.Array, jax.Array, jax.Array],
    base_idx: jax.Array,
    mirror: jax.Array,
    net: AlphaZeroNet,
    cfg: Config,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """A whole learn epoch as ONE compiled program.

    ``buf`` is the device-resident replay window ((N, 3, 8, 8) uint8 planes,
    (N, A) f32 policies, (N, 2) f32 WL); ``base_idx``/``mirror`` are the
    (steps, B) epoch_batches outputs. Each scan step gathers its minibatch
    on device and runs the exact train_step body, so the host stops paying
    per-step batch uploads (~4 MB/step) and per-step dispatch latency —
    the two costs that dominated learn() wall-clock on the tunneled TPU
    backend (measured ~150-170 ms/step end-to-end vs ~30 ms compute).
    Semantics identical to looping train_step over buffer.get(bi).

    Returns the final state and metrics stacked over steps ((steps,) per
    key). Recompiles when the step count changes (buffer growth); once the
    window is full the shape is constant.
    """
    states_u8, policies, wls = buf

    def body(st, xs):
        bi, mi = xs
        batch = (states_u8[bi].astype(jnp.float32), policies[bi], wls[bi])
        return _train_step_impl(st, batch, mi, net, cfg)

    return jax.lax.scan(body, state, (base_idx, mirror))
