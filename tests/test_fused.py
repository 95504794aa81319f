"""Fused-tower inference (models/fused.py) parity tests.

The Pallas tower runs in interpreter mode on CPU; outputs must match the
Flax net's inference forward to bf16/BN-folding tolerance on logits and
to near-exactness on the resulting policy/value used by the search.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import Config, tiny_config
from alphazero_tpu.models import init_network
from alphazero_tpu.models.fused import TB, fused_apply, pack_weights


def _rand_planes(rng, b):
    mine = rng.random((b, 1, 8, 8)) < 0.2
    theirs = (~mine) & (rng.random((b, 1, 8, 8)) < 0.2)
    ones = np.ones((b, 1, 8, 8))
    return jnp.asarray(
        np.concatenate([mine, theirs, ones], 1).astype(np.float32))


@pytest.mark.parametrize("blocks", [2, 5])
def test_fused_matches_flax(blocks):
    cfg = Config(num_blocks=blocks, num_filters=128)
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    packed = pack_weights(net, variables)

    planes = _rand_planes(np.random.default_rng(1), TB)
    pol_ref, wl_ref = net.clone(dtype=jnp.bfloat16).apply(
        variables, planes, train=False)
    pol_f, wl_f = fused_apply(packed, planes, interpret=True)

    # logits: bf16 accumulation-order + BN-folding differences
    np.testing.assert_allclose(np.asarray(pol_f), np.asarray(pol_ref),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(np.asarray(wl_f), np.asarray(wl_ref),
                               atol=0.15, rtol=0.05)
    # what the search consumes: probabilities and scalar value
    p_ref = jax.nn.softmax(pol_ref, -1)
    p_f = jax.nn.softmax(pol_f, -1)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               atol=0.02)
    v_ref = jax.nn.softmax(wl_ref, -1)
    v_f = jax.nn.softmax(wl_f, -1)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                               atol=0.02)


def test_fused_matches_scanned_layout():
    """pack_weights handles the nn.scan-stacked parameter layout too."""
    cfg = Config(num_blocks=3, num_filters=128, scan_blocks=True)
    net, variables = init_network(cfg, jax.random.PRNGKey(2))
    packed = pack_weights(net, variables)
    planes = _rand_planes(np.random.default_rng(3), TB)
    pol_ref, _ = net.clone(dtype=jnp.bfloat16).apply(
        variables, planes, train=False)
    pol_f, _ = fused_apply(packed, planes, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(pol_f, -1)),
        np.asarray(jax.nn.softmax(pol_ref, -1)), atol=0.02)


def test_conv_masking_is_exact():
    """The 9-shift masked-matmul conv must be EXACT (same tap structure)
    vs lax.conv when run in f32 — isolates the shift/mask indexing."""
    from alphazero_tpu.models.fused import _MASKS

    rng = np.random.default_rng(5)
    B = 4
    x = jnp.asarray(rng.standard_normal((B, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05,
                    jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x2d = x.reshape(B * 64, 128)
    w9 = w.reshape(9, 128, 128)
    acc = jnp.zeros((B * 64, 128), jnp.float32)
    for k in range(9):
        s = (k // 3 - 1) * 8 + (k % 3 - 1)
        rolled = jnp.roll(x2d, -s, 0) if s else x2d
        mask = jnp.tile(jnp.asarray(_MASKS[k]).reshape(64, 1), (B, 1))
        acc = acc + (rolled * mask) @ w9[k]
    np.testing.assert_allclose(np.asarray(acc.reshape(B, 8, 8, 128)),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)
