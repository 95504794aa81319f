"""Post-training int8 inference path for the SE-ResNet (opt-in).

Motivation (docs/batch-scaling.md): search is ~82% network-bound and the
bf16 conv tower runs at ~50% of the v5e bf16 MXU roofline. The v5e MXU
executes s8 x s8 -> s32 at TWICE the bf16 rate, so an int8 tower has a
~2x higher roofline for the same convs. This module quantizes a TRAINED
checkpoint post-hoc; training stays f32 (reference semantics untouched).

Scheme (standard post-training quantization; no reference analogue —
the reference infers in f32 torch, /root/reference/src/model.py):

- BatchNorm folded into the preceding conv (inference-only identity):
  w' = w * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps).
- Conv weights: symmetric per-OUTPUT-CHANNEL int8 (scale = amax/127).
- Activations: symmetric per-tensor int8, DYNAMIC by default (scale
  recomputed from the live batch each call — no calibration needed) or
  STATIC via ``calibrate`` (scales pre-measured on replay data; removes
  the per-layer amax reduction from the compiled program; accuracy
  measured equal to dynamic on the real checkpoint, docs/quant-int8.md).
- The 2N+1 tower 3x3 convs (input conv, 2 per block) run s8 x s8 -> s32
  on the MXU, dequantized + bias + ReLU fused by XLA.
- Everything cheap stays in ``dtype`` (default bf16): SE blocks (~5% of
  eval cost), residual adds, the 1x1 value conv, all FC heads, softmax —
  and the policy-head 3x3 conv, whose quantization noise hits the logits
  directly: keeping it float cuts policy TV 0.023 -> 0.015 for ~2.4% of
  conv FLOPs (docs/quant-int8.md; keeping the last residual block float
  as well was measured and buys nothing).

Accuracy is measured, not assumed: tests/test_quant.py bounds the policy
TV vs the f32 net on CPU; scripts/probe_quant.py measures ms/eval,
search-visit TV, and argmax agreement on chip with a real checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from alphazero_tpu.models.network import AlphaZeroNet, wl_to_value

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _fold(kernel: jax.Array, bn_p: Dict[str, jax.Array],
          bn_s: Dict[str, jax.Array], eps: float = 1e-5
          ) -> Tuple[jax.Array, jax.Array]:
    """Fold an inference-mode BatchNorm into the conv kernel before it.

    kernel: (..., H, W, Cin, Cout); bn params/stats are (..., Cout) —
    leading axes (the nn.scan block axis) broadcast through unchanged.
    """
    inv = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    folded = kernel * inv[..., None, None, None, :]
    bias = bn_p["bias"] - bn_s["mean"] * inv
    return folded, bias


def _quant_weight(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8. kernel: (H, W, Cin, Cout)."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qconv(x: jax.Array, qk: jax.Array, wscale: jax.Array,
           bias: jax.Array, dtype: Any, xs: jax.Array | None = None
           ) -> jax.Array:
    """s8 x s8 -> s32 SAME conv with per-tensor input quant.

    x: (B, 8, 8, Cin) float; returns (B, 8, 8, Cout) in ``dtype``
    (dequantized, bias added; no activation). ``xs`` is the input quant
    scale: None computes it dynamically from the live batch (a full amax
    reduction between layers); a static scalar (from ``calibrate``)
    removes that dependency chain and lets out-of-range values saturate.
    """
    xf = x.astype(jnp.float32)
    if xs is None:
        xs = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, qk, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_CONV_DN, preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (xs * wscale) + bias
    return out.astype(dtype)


def _dense(x: jax.Array, p: Dict[str, jax.Array], dtype: Any) -> jax.Array:
    return (x.astype(dtype) @ p["kernel"].astype(dtype)
            + p["bias"].astype(dtype))


def _se(x: jax.Array, se_p: Dict[str, Any], dtype: Any) -> jax.Array:
    """LC0 scale-and-shift SE, kept in ``dtype`` (network.py:38-56)."""
    pooled = jnp.mean(x, axis=(1, 2))
    h = jax.nn.relu(_dense(pooled, se_p["fc1"], dtype))
    h = _dense(h, se_p["fc2"], dtype)
    gate, bias = jnp.split(h, 2, axis=-1)
    gate = jax.nn.sigmoid(gate)[:, None, None, :]
    return x * gate + bias[:, None, None, :]


def quantize_network(net: AlphaZeroNet, variables: Dict[str, Any]
                     ) -> Dict[str, Any]:
    """Fold BN + quantize a trained checkpoint into a QuantParams dict.

    Accepts both tower layouts (inlined ``block_i`` and nn.scan-stacked
    ``tower/block``, network.py:99-104); the output is always the
    per-block list form, so the quantized forward is layout-independent.
    """
    params, stats = variables["params"], variables["batch_stats"]

    def qconv_entry(kernel, bn_p, bn_s):
        folded, bias = _fold(kernel, bn_p, bn_s)
        qk, scale = _quant_weight(folded)
        return {"qk": qk, "scale": scale, "bias": bias}

    blocks: List[Dict[str, Any]] = []
    if "tower" in params:  # scanned layout: unstack the leading block axis
        bp, bs = params["tower"]["block"], stats["tower"]["block"]
        take = lambda tree, i: jax.tree_util.tree_map(lambda a: a[i], tree)
        per_block = [(take(bp, i), take(bs, i))
                     for i in range(net.num_blocks)]
    else:
        per_block = [(params[f"block_{i}"], stats[f"block_{i}"])
                     for i in range(net.num_blocks)]
    for bp, bs in per_block:
        blocks.append({
            "conv1": qconv_entry(bp["conv1"]["kernel"], bp["bn1"], bs["bn1"]),
            "conv2": qconv_entry(bp["conv2"]["kernel"], bp["bn2"], bs["bn2"]),
            "se": bp["se"],
        })

    return {
        "input": qconv_entry(params["input_conv"]["kernel"],
                             params["input_bn"], stats["input_bn"]),
        "blocks": blocks,
        # policy head stays float: its quant noise lands on the logits
        # unaveraged (measured: float here is worth TV 0.023 -> 0.015)
        "policy": _fold(params["policy_conv"]["kernel"],
                        params["policy_bn"], stats["policy_bn"]),
        "policy_fc": params["policy_fc"],
        # value head stays float: 1x1x32 conv + tiny FCs, <2% of eval cost
        "value_conv": _fold(params["value_conv"]["kernel"],
                            params["value_bn"], stats["value_bn"]),
        "value_fc1": params["value_fc1"],
        "value_fc2": params["value_fc2"],
    }


def quant_apply(qp: Dict[str, Any], planes: jax.Array,
                dtype: Any = jnp.bfloat16,
                act_scales: Dict[str, Any] | None = None,
                _collect: list | None = None
                ) -> Tuple[jax.Array, jax.Array]:
    """int8 forward: (B, 3, 8, 8) planes -> (policy_logits, wl_logits) f32.

    Mirrors AlphaZeroNet.__call__ (network.py:123-171) with the 3x3 convs
    in s8 and everything else in ``dtype``. ``act_scales`` (from
    ``calibrate``) switches activation quantization from dynamic to
    static scales; ``_collect`` is calibrate's amax recorder.
    """
    sc = act_scales

    def pre(x, key):
        if _collect is not None:
            _collect.append((key, jnp.max(jnp.abs(x.astype(jnp.float32)))))
        return None if sc is None else sc[key]

    x = jnp.transpose(planes, (0, 2, 3, 1))  # NHWC

    e = qp["input"]
    x = jax.nn.relu(_qconv(x, e["qk"], e["scale"], e["bias"], dtype,
                           xs=pre(x, "input")))

    for i, b in enumerate(qp["blocks"]):
        y = jax.nn.relu(_qconv(x, b["conv1"]["qk"], b["conv1"]["scale"],
                               b["conv1"]["bias"], dtype,
                               xs=pre(x, f"b{i}c1")))
        y = _qconv(y, b["conv2"]["qk"], b["conv2"]["scale"],
                   b["conv2"]["bias"], dtype, xs=pre(y, f"b{i}c2"))
        y = _se(y, b["se"], dtype)
        x = jax.nn.relu(y + x)

    def float_conv(x, kernel, bias):
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
            padding="SAME", dimension_numbers=_CONV_DN)
        return jax.nn.relu(y + bias.astype(dtype))

    p = float_conv(x, *qp["policy"])
    policy_logits = _dense(p.reshape(p.shape[0], -1), qp["policy_fc"], dtype)

    v = float_conv(x, *qp["value_conv"])
    v = jax.nn.relu(_dense(v.reshape(v.shape[0], -1), qp["value_fc1"], dtype))
    wl_logits = _dense(v, qp["value_fc2"], dtype)

    return policy_logits.astype(jnp.float32), wl_logits.astype(jnp.float32)


def calibrate(qp: Dict[str, Any], planes_batches: List[jax.Array],
              margin: float = 1.0) -> Dict[str, jax.Array]:
    """Static per-tensor activation scales from calibration data.

    Runs the int8 forward over ``planes_batches`` (e.g. replay-buffer
    samples) recording each quant point's input amax; returns
    {point: scale} with scale = margin * max-over-batches(amax) / 127.
    Static scales remove the per-layer amax reduction from the compiled
    forward; inputs beyond the calibrated range saturate at +-127.
    """
    maxes: Dict[str, jax.Array] = {}

    @jax.jit
    def one(planes):
        rec: list = []
        quant_apply(qp, planes, _collect=rec)
        return dict(rec)

    for planes in planes_batches:
        for k, v in one(planes).items():
            maxes[k] = jnp.maximum(maxes[k], v) if k in maxes else v
    return {k: margin * jnp.maximum(v, 1e-6) / 127.0
            for k, v in maxes.items()}


def make_quant_evaluator(net: AlphaZeroNet, variables: Dict[str, Any],
                         dtype: Any = jnp.bfloat16,
                         act_scales: Dict[str, Any] | None = None,
                         qp: Dict[str, Any] | None = None):
    """Search-compatible evaluator (same contract as make_net_evaluator,
    search/mcts.py:679-687) over the int8-quantized checkpoint.

    Pass a precomputed ``qp`` (quantize_network output) to skip re-folding
    BN + re-quantizing the tower when the caller already did it (e.g. for
    calibration)."""
    if qp is None:
        qp = quantize_network(net, variables)

    def eval_fn(planes: jax.Array):
        policy_logits, wl_logits = quant_apply(qp, planes, dtype=dtype,
                                               act_scales=act_scales)
        return jax.nn.softmax(policy_logits, axis=-1), wl_to_value(wl_logits)

    return eval_fn
