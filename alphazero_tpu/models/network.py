"""SE-ResNet policy/value network (Flax).

Architecture contract matches the reference net
(/root/reference/src/model.py):

- 3x3 input conv -> BN -> ReLU                          (model.py:123-124)
- N SE-residual blocks: conv3x3-BN-ReLU, conv3x3-BN,
  LC0-style SE (scale AND shift: fc2 emits 2C, split
  into sigmoid(w) and bias b, y = x*w + b), +skip, ReLU (model.py:30-92)
- policy head: conv3x3 -> BN -> ReLU -> FC(C*64 -> 192) (model.py:133-135)
- value head: conv1x1 -> 32 -> BN -> ReLU ->
  FC(2048 -> 128) -> ReLU -> FC(-> 2) win/loss logits   (model.py:137-142)

TPU-first choices (not a translation):

- NHWC layout internally (TPU conv native layout); the public interface
  keeps the reference's (B, 3, 8, 8) NCHW planes.
- Configurable compute dtype: bfloat16 activations for search inference,
  float32 params; logits always return float32.
- BatchNorm statistics live in a ``batch_stats`` collection; search uses
  ``use_running_average=True`` (the reference's ``model.eval()``), the
  learner updates stats per step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from alphazero_tpu.config import Config

NetVariables = Dict[str, Any]  # {"params": ..., "batch_stats": ...}


class SqueezeExcite(nn.Module):
    """LC0-style squeeze-excitation: global pool -> bottleneck MLP that emits
    per-channel (sigmoid gate, bias); output = x * gate + bias."""

    channels: int
    se_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, 8, 8, C)
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        h = nn.Dense(self.channels // self.se_ratio, dtype=self.dtype, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(2 * self.channels, dtype=self.dtype, name="fc2")(h)
        gate, bias = jnp.split(h, 2, axis=-1)
        gate = jax.nn.sigmoid(gate)[:, None, None, :]
        bias = bias[:, None, None, :]
        return x * gate + bias


class SEResBlock(nn.Module):
    channels: int
    se_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = SqueezeExcite(self.channels, self.se_ratio, dtype=self.dtype,
                          name="se")(y)
        return nn.relu(y + x)


class _ScanBlock(nn.Module):
    """Scan body: one SE-residual block in (carry, xs) -> (carry, ys) form."""

    channels: int
    se_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        y = SEResBlock(self.channels, self.se_ratio, dtype=self.dtype,
                       name="block")(x, train)
        return y, None


class AlphaZeroNet(nn.Module):
    """Policy (192 logits) + win/loss (2 logits) network.

    Input: (B, 3, 8, 8) float planes (mine/theirs/ones, mover perspective).

    ``scan_blocks`` runs the residual tower as ONE ``nn.scan``-stacked
    block instead of ``num_blocks`` inlined copies. Numerics are identical
    (same ops per block, verified bit-exact); the point is XLA compile
    time, which scales with inlined graph size (docs/compile-latency.md).
    Scanned block parameters are stacked on a leading (num_blocks, ...)
    axis, so the two layouts' checkpoints are not interchangeable.
    """

    num_blocks: int = 20
    num_filters: int = 128
    se_ratio: int = 8
    num_actions: int = 192
    dtype: Any = jnp.float32
    # scan_blocks=True compiles the tower as ONE nn.scan-stacked block:
    # 14x faster cold compile (66s vs 949s for the flagship search program
    # on v5e) at -5.8% steady-state throughput (180k vs 191k sims/s;
    # measured, see docs/compile-latency.md). Default False = maximum
    # throughput; flip on for fast dev iteration (main.py --scan-blocks).
    scan_blocks: bool = False
    # lax.scan unroll factor for the scanned tower (measured: unroll=4
    # compiles 2.4x slower than unroll=1 for only +1% runtime — the scan
    # overhead is not inter-block fusion, so leave at 1).
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, planes: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        x = jnp.transpose(planes, (0, 2, 3, 1)).astype(self.dtype)  # NHWC

        x = nn.Conv(self.num_filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="input_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="input_bn")(x)
        x = nn.relu(x)

        if self.scan_blocks:
            tower = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,      # `train` is the same every step
                length=self.num_blocks,
                unroll=self.scan_unroll,
            )(self.num_filters, self.se_ratio, dtype=self.dtype,
              name="tower")
            x, _ = tower(x, train)
        else:
            for i in range(self.num_blocks):
                x = SEResBlock(self.num_filters, self.se_ratio,
                               dtype=self.dtype, name=f"block_{i}")(x, train)

        # Policy head
        p = nn.Conv(self.num_filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="policy_conv")(x)
        p = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="policy_bn")(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        policy_logits = nn.Dense(self.num_actions, dtype=self.dtype,
                                 name="policy_fc")(p)

        # Value head (win/loss, no draws)
        v = nn.Conv(32, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value_conv")(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="value_bn")(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.Dense(128, dtype=self.dtype, name="value_fc1")(v)
        v = nn.relu(v)
        wl_logits = nn.Dense(2, dtype=self.dtype, name="value_fc2")(v)

        return policy_logits.astype(jnp.float32), wl_logits.astype(jnp.float32)


def init_network(cfg: Config, rng: jax.Array, dtype=jnp.float32
                 ) -> Tuple[AlphaZeroNet, NetVariables]:
    """Build the net and initialize variables ({params, batch_stats})."""
    net = AlphaZeroNet(
        num_blocks=cfg.num_blocks,
        num_filters=cfg.num_filters,
        se_ratio=cfg.se_ratio,
        num_actions=cfg.num_actions,
        dtype=dtype,
        scan_blocks=cfg.scan_blocks,
    )
    dummy = jnp.zeros((1, cfg.input_planes, cfg.board_size, cfg.board_size),
                      jnp.float32)
    variables = net.init(rng, dummy, train=False)
    return net, dict(variables)


def policy_value_apply(net: AlphaZeroNet, variables: NetVariables,
                       planes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Inference: (policy_probs (B,192), value (B,) = P(win)-P(loss)).

    Matches the reference's evaluation pipeline (mcts.py:245-258): softmax
    policy, softmax WL collapsed to a scalar in [-1, 1].
    """
    policy_logits, wl_logits = net.apply(variables, planes, train=False)
    policy = jax.nn.softmax(policy_logits, axis=-1)
    return policy, wl_to_value(wl_logits)


def wl_to_value(wl_logits: jax.Array) -> jax.Array:
    """(B, 2) win/loss logits -> (B,) scalar value = P(win) - P(loss)
    (reference model.py:182-195)."""
    wl = jax.nn.softmax(wl_logits, axis=-1)
    return wl[..., 0] - wl[..., 1]


def stack_tower(variables: NetVariables, num_blocks: int) -> NetVariables:
    """Convert inlined-tower variables (``block_i`` subtrees) to the
    nn.scan-stacked layout (``tower/block`` with a leading block axis).

    The two layouts are numerically identical per block (network.py:99-104);
    this makes any checkpoint loadable under ``scan_blocks=True`` — e.g. to
    trade -5.8% throughput for 14x faster cold compiles in probes and
    serving (docs/compile-latency.md). Checkpoints on disk are unaffected.
    """

    def convert(tree: Dict[str, Any]) -> Dict[str, Any]:
        rest = {k: v for k, v in tree.items() if not k.startswith("block_")}
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[tree[f"block_{i}"] for i in range(num_blocks)])
        return {**rest, "tower": {"block": stacked}}

    return {k: convert(v) if k in ("params", "batch_stats") else v
            for k, v in variables.items()}


def count_params(variables: NetVariables) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
