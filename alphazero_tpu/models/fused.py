"""Fused SE-ResNet tower inference (Pallas TPU kernel).

OUTCOME (measured, v5e, B=512, 800 chained evals): this kernel runs at
2.45 ms/eval vs XLA's layer-by-layer 2.23 ms/eval — a NEGATIVE result,
kept as working, tested documentation of the attempt. The hypothesis was
that XLA's ~50%-of-roofline conv forward loses to HBM activation
round-trips between the 40 small convs; keeping activations resident in
VMEM for the whole tower (weights streamed per block) eliminates those,
but the per-tap data staging (shifted masked copies feeding the MXU)
costs as much on the VPU as XLA's internal windowing does — with both
formulations tried (per-tap f32 accumulation 2.45 ms; im2col into a
(R,1152) VMEM patch buffer + one K=1152 matmul 2.53 ms). Conclusion:
XLA's conv is within ~10% of a reasonable hand kernel for this geometry;
the network roofline gap is real windowing work, not memory traffic
(docs/batch-scaling.md).

How the conv is computed: with the 8x8 board flattened into rows
(game-major, h*8+w within a game), a 3x3 SAME conv is 9 shifted
(row-rolled) (TB*64, 128) x (128, 128) matmuls accumulated in f32, with a
static per-shift validity mask zeroing rows whose source crosses the
board edge (which also kills cross-game and circular-wrap contamination,
since any crossing row is border-invalid). BatchNorm is folded into the
conv weights/biases on the host (inference running stats), so the kernel
sees only conv + bias + ReLU + SE + residual.

Scope: the tower only. The input conv (Cin=3) and the two heads are
cheap, oddly shaped, and stay in XLA (also BN-folded). Not integrated
into the evaluators (it does not win); the BN-folding weight packing
(`pack_weights`) is independently reusable.

Reference architecture contract: /root/reference/src/model.py:30-92.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# batch tile per grid step: activations (TB*64, 128) rows per tile.
TB = 32


# -----------------------------------------------------------------------------
# Host-side weight packing (BN folding)
# -----------------------------------------------------------------------------

def _bn_fold(kernel, bn):
    """Fold inference BatchNorm into conv kernel + bias.

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv(x) * s + (beta - mean * s),   s = gamma / sqrt(var + eps)
    """
    eps = 1e-5  # flax BatchNorm default, matches the training net
    s = bn["scale"] / np.sqrt(bn["var"] + eps)
    return kernel * s, bn["bias"] - bn["mean"] * s


def pack_weights(net, variables) -> Dict[str, Any]:
    """Flax variables -> packed, BN-folded arrays for the fused forward.

    Works on the default (inlined, ``block_{i}``) parameter layout; the
    scanned layout stacks the same leaves on a leading axis and is
    unstacked here.
    """
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    n = net.num_blocks
    C = net.num_filters
    assert C % 128 == 0 and C == 128, "fused tower is specialized to C=128"

    def block_leaf(i, *path):
        def walk(tree, stacked):
            node = tree
            for k in path:
                if node is None or k not in node:
                    return None
                node = node[k]
            return node[i] if stacked else node

        if "tower" in params:   # scanned layout: stacked on axis 0
            v = walk(params["tower"]["block"], True)
            if v is None:
                v = walk(stats["tower"]["block"], True)
        else:
            v = walk(params.get(f"block_{i}"), False)
            if v is None:
                v = walk(stats.get(f"block_{i}"), False)
        assert v is not None, f"missing leaf block_{i}/{'/'.join(path)}"
        return v

    wconv = np.zeros((n, 2, 9, C, C), np.float32)
    bconv = np.zeros((n, 2, C), np.float32)
    wse1 = np.zeros((n, C, 128), np.float32)    # fc1 zero-padded to 128
    bse1 = np.zeros((n, 128), np.float32)
    wse2g = np.zeros((n, 128, C), np.float32)   # fc2 gate half
    wse2b = np.zeros((n, 128, C), np.float32)   # fc2 bias half
    bse2g = np.zeros((n, C), np.float32)
    bse2b = np.zeros((n, C), np.float32)

    se_hidden = C // net.se_ratio
    for i in range(n):
        for j, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            k = block_leaf(i, conv, "kernel")              # (3,3,C,C)
            bnp = {q: block_leaf(i, bn, q)
                   for q in ("scale", "bias", "mean", "var")}
            kf, bf = _bn_fold(k, bnp)
            wconv[i, j] = kf.reshape(9, C, C)
            bconv[i, j] = bf
        wse1[i, :, :se_hidden] = block_leaf(i, "se", "fc1", "kernel")
        bse1[i, :se_hidden] = block_leaf(i, "se", "fc1", "bias")
        w2 = block_leaf(i, "se", "fc2", "kernel")          # (h, 2C)
        b2 = block_leaf(i, "se", "fc2", "bias")            # (2C,)
        wse2g[i, :se_hidden] = w2[:, :C]
        wse2b[i, :se_hidden] = w2[:, C:]
        bse2g[i], bse2b[i] = b2[:C], b2[C:]

    # input conv + heads (XLA side), BN folded
    k_in, b_in = _bn_fold(params["input_conv"]["kernel"],
                          {q: (params["input_bn"][q]
                               if q in ("scale", "bias")
                               else stats["input_bn"][q])
                           for q in ("scale", "bias", "mean", "var")})
    k_pol, b_pol = _bn_fold(params["policy_conv"]["kernel"],
                            {q: (params["policy_bn"][q]
                                 if q in ("scale", "bias")
                                 else stats["policy_bn"][q])
                             for q in ("scale", "bias", "mean", "var")})
    k_val, b_val = _bn_fold(params["value_conv"]["kernel"],
                            {q: (params["value_bn"][q]
                                 if q in ("scale", "bias")
                                 else stats["value_bn"][q])
                             for q in ("scale", "bias", "mean", "var")})

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    bf = lambda x: jnp.asarray(x, jnp.bfloat16)
    return {
        "wconv": bf(wconv), "bconv": f32(bconv),
        "wse1": bf(wse1), "bse1": f32(bse1),
        "wse2g": bf(wse2g), "wse2b": bf(wse2b),
        "bse2g": f32(bse2g), "bse2b": f32(bse2b),
        "k_in": bf(k_in), "b_in": f32(b_in),
        "k_pol": bf(k_pol), "b_pol": f32(b_pol),
        "policy_fc": bf(params["policy_fc"]["kernel"]),
        "policy_fc_b": f32(params["policy_fc"]["bias"]),
        "k_val": bf(k_val), "b_val": f32(b_val),
        "value_fc1": bf(params["value_fc1"]["kernel"]),
        "value_fc1_b": f32(params["value_fc1"]["bias"]),
        "value_fc2": bf(params["value_fc2"]["kernel"]),
        "value_fc2_b": f32(params["value_fc2"]["bias"]),
        "num_blocks": n,
    }


# -----------------------------------------------------------------------------
# The tower kernel
# -----------------------------------------------------------------------------

def _shift_masks():
    """(9, 64) f32 validity per shift k = (dy+1)*3 + (dx+1): output row
    (h, w) is valid iff the source (h+dy, w+dx) is on the board."""
    m = np.zeros((9, 64), np.float32)
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        for h in range(8):
            for w in range(8):
                if 0 <= h + dy < 8 and 0 <= w + dx < 8:
                    m[k, h * 8 + w] = 1.0
    return m


_MASKS = _shift_masks()


def _tower_kernel(n_blocks, wconv_ref, bconv_ref, wse1_ref, bse1_ref,
                  wse2g_ref, wse2b_ref, bse2g_ref, bse2b_ref,
                  masks_ref, x_ref, out_ref, wbuf, sem):
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    R = TB * 64

    # (R, 1) bf16 validity mask per shift, built once (0/1 exact in bf16)
    masks = [jnp.tile(masks_ref[k].reshape(64, 1),
                      (TB, 1)).astype(jnp.bfloat16) for k in range(9)]

    zrow = jnp.zeros((9, 128), jnp.bfloat16)

    def shift_rows(x2d, s):
        """out[r] = x2d[r + s], zero-filled at the ends (static slices;
        Mosaic has no bf16 rotate). Out-of-board rows are masked anyway."""
        if s == 0:
            return x2d
        if s > 0:
            return jnp.concatenate([x2d[s:], zrow[:s]], axis=0)
        return jnp.concatenate([zrow[:(-s)], x2d[:s]], axis=0)

    def conv(x2d, w9, bias):
        """x2d (R,128) bf16, w9 (9,128,128) bf16 -> (R,128) f32 + bias.

        Nine masked shifted-row matmuls accumulated in f32. The measured
        alternative — im2col into a (R, 1152) VMEM patch buffer + one
        K=1152 matmul — was slightly SLOWER (2.53 vs 2.45 ms/eval): tap
        staging costs the same either way."""
        acc = jnp.zeros((R, 128), jnp.float32)
        for k in range(9):
            s = (k // 3 - 1) * 8 + (k % 3 - 1)
            acc = acc + jnp.dot(shift_rows(x2d, s) * masks[k], w9[k],
                                preferred_element_type=jnp.float32)
        return acc + bias

    def block(i, x2d):
        dma = pltpu.make_async_copy(wconv_ref.at[i], wbuf, sem)
        dma.start()
        dma.wait()
        bc = bconv_ref[i]                                    # (2, 128)
        y = conv(x2d, wbuf[0], bc[0:1])
        y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        y = conv(y, wbuf[1], bc[1:2])                        # (R,128) f32

        # SE (LC0 scale-and-shift); fc1 is zero-padded to 128 lanes so the
        # hidden vector carries zeros beyond the real bottleneck width
        pooled = jnp.mean(y.reshape(TB, 64, 128), axis=1)    # (TB,128) f32
        h = (jnp.dot(pooled.astype(jnp.bfloat16), wse1_ref[i],
                     preferred_element_type=jnp.float32)
             + bse1_ref[pl.ds(i, 1)])
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        gate = jax.nn.sigmoid(
            jnp.dot(h, wse2g_ref[i], preferred_element_type=jnp.float32)
            + bse2g_ref[pl.ds(i, 1)])
        sbias = (jnp.dot(h, wse2b_ref[i],
                         preferred_element_type=jnp.float32)
                 + bse2b_ref[pl.ds(i, 1)])
        y = (y.reshape(TB, 64, 128) * gate[:, None, :]
             + sbias[:, None, :]).reshape(R, 128)

        return jnp.maximum(y + x2d.astype(jnp.float32),
                           0.0).astype(jnp.bfloat16)

    out_ref[:] = jax.lax.fori_loop(0, n_blocks, block, x_ref[:])


@functools.partial(jax.jit, static_argnames=("num_blocks", "interpret"))
def tower_forward(x2d: jax.Array, packed, num_blocks: int,
                  interpret: bool = False) -> jax.Array:
    """(B*64, 128) bf16 tower input -> output, activations VMEM-resident."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = x2d.shape[0]
    assert R % (TB * 64) == 0, f"batch must be a multiple of {TB}"
    grid = (R // (TB * 64),)

    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tower_kernel, num_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # wconv stays in HBM
            const(), const(), const(), const(), const(), const(), const(),
            const(),                                  # masks
            pl.BlockSpec((TB * 64, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB * 64, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 9, 128, 128), jnp.bfloat16),   # block weights
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(packed["wconv"], packed["bconv"], packed["wse1"], packed["bse1"],
      packed["wse2g"], packed["wse2b"], packed["bse2g"], packed["bse2b"],
      jnp.asarray(_MASKS), x2d)


# -----------------------------------------------------------------------------
# Full fused forward: XLA input conv + Pallas tower + XLA heads
# -----------------------------------------------------------------------------

def fused_apply(packed, planes: jax.Array, interpret: bool = False
                ) -> Tuple[jax.Array, jax.Array]:
    """(B, 3, 8, 8) planes -> (policy_logits, wl_logits), float32.

    Numerically equivalent to ``net.apply(variables, planes, train=False)``
    with bf16 activations (BN folded; bf16/f32 rounding differs at ~1e-2
    logit level, same as any re-fusion)."""
    B = planes.shape[0]
    x = jnp.transpose(planes, (0, 2, 3, 1)).astype(jnp.bfloat16)
    x = jax.lax.conv_general_dilated(
        x, packed["k_in"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + packed["b_in"]
    x = jnp.maximum(x, 0.0).astype(jnp.bfloat16)

    t = tower_forward(x.reshape(B * 64, 128), packed,
                      num_blocks=packed["num_blocks"], interpret=interpret)
    t = t.reshape(B, 8, 8, 128)

    p = jax.lax.conv_general_dilated(
        t, packed["k_pol"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + packed["b_pol"]
    p = jnp.maximum(p, 0.0).astype(jnp.bfloat16)
    policy = (jnp.dot(p.reshape(B, -1), packed["policy_fc"],
                      preferred_element_type=jnp.float32)
              + packed["policy_fc_b"])

    v = jax.lax.conv_general_dilated(
        t, packed["k_val"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + packed["b_val"]
    v = jnp.maximum(v, 0.0).astype(jnp.bfloat16)
    v = (jnp.dot(v.reshape(B, -1), packed["value_fc1"],
                 preferred_element_type=jnp.float32)
         + packed["value_fc1_b"])
    v = jnp.maximum(v, 0.0).astype(jnp.bfloat16)
    wl = (jnp.dot(v, packed["value_fc2"],
                  preferred_element_type=jnp.float32)
          + packed["value_fc2_b"])
    return policy.astype(jnp.float32), wl.astype(jnp.float32)
