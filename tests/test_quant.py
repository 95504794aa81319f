"""int8 inference path (models/quant.py): BN folding is exact, the
quantized forward tracks the f32 net, both tower layouts quantize, and
the evaluator drives a real search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import Config
from alphazero_tpu.env import initial_state, legal_action_mask
from alphazero_tpu.models import init_network
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.models.quant import (
    _fold, make_quant_evaluator, quant_apply, quantize_network,
)
from alphazero_tpu.search import SearchSpec, search
from alphazero_tpu.search.mcts import root_child_visits


def _roughen(variables, seed=0):
    """Random-init nets are too bland to stress quantization (BN stats are
    mean 0 / var 1, logits ~0). Perturb stats and scale kernels so the
    forward has real per-channel dynamic range."""
    rng = np.random.RandomState(seed)

    def bump(path, a):
        a = np.asarray(a)
        name = "/".join(str(p.key) for p in path)
        if name.endswith("mean"):
            return a + rng.normal(0, 0.3, a.shape).astype(a.dtype)
        if name.endswith("var"):
            return a * rng.uniform(0.5, 2.0, a.shape).astype(a.dtype)
        if name.endswith("kernel"):
            return a * rng.uniform(0.8, 1.6)
        return a

    return jax.tree_util.tree_map_with_path(bump, variables)


def _tiny(scan_blocks=False, seed=0):
    cfg = Config(num_blocks=3, num_filters=32, scan_blocks=scan_blocks)
    net, variables = init_network(cfg, jax.random.PRNGKey(seed))
    return cfg, net, _roughen(variables, seed)


def _planes(cfg, n=64, seed=1):
    rng = np.random.RandomState(seed)
    mine = rng.rand(n, 1, 8, 8) < 0.2
    theirs = (rng.rand(n, 1, 8, 8) < 0.2) & ~mine
    ones = np.ones((n, 1, 8, 8))
    return jnp.asarray(
        np.concatenate([mine, theirs, ones], axis=1), jnp.float32)


def test_bn_fold_exact():
    """conv->BN(inference) == folded conv + bias, to f32 roundoff."""
    import flax.linen as nn

    class ConvBN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (3, 3), padding="SAME", use_bias=False,
                        name="conv")(x)
            return nn.BatchNorm(use_running_average=True, name="bn")(x)

    m = ConvBN()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8, 8, 12), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    variables = _roughen(variables)
    want = m.apply(variables, x)

    folded, bias = _fold(variables["params"]["conv"]["kernel"],
                         variables["params"]["bn"],
                         variables["batch_stats"]["bn"])
    got = jax.lax.conv_general_dilated(
        x, folded, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_quant_tracks_f32(scan_blocks):
    """int8 policy stays close to f32 in TV and argmax; value MAE small."""
    cfg, net, variables = _tiny(scan_blocks)
    planes = _planes(cfg)

    pol_f, val_f = policy_value_apply(net, variables, planes)
    qp = quantize_network(net, variables)
    pl, wl = quant_apply(qp, planes, dtype=jnp.float32)
    pol_q = jax.nn.softmax(pl, axis=-1)
    from alphazero_tpu.models.network import wl_to_value
    val_q = wl_to_value(wl)

    tv = 0.5 * np.abs(np.asarray(pol_q) - np.asarray(pol_f)).sum(-1)
    agree = (np.asarray(pol_q).argmax(-1) == np.asarray(pol_f).argmax(-1))
    assert tv.mean() < 0.02, tv.mean()
    assert agree.mean() > 0.95, agree.mean()
    assert np.abs(np.asarray(val_q) - np.asarray(val_f)).mean() < 0.02


def test_scanned_and_inlined_layouts_quantize_identically():
    """The same weights quantize to the same qparams regardless of tower
    layout, and stack_tower's converted variables run bit-close under the
    scanned net."""
    from alphazero_tpu.models.network import stack_tower

    cfg, net_i, var_i = _tiny(scan_blocks=False)
    var_s = stack_tower(var_i, cfg.num_blocks)
    net_s = net_i.clone(scan_blocks=True)

    planes = _planes(cfg, n=16)
    pol_i, val_i = policy_value_apply(net_i, var_i, planes)
    pol_s, val_s = policy_value_apply(net_s, var_s, planes)
    np.testing.assert_allclose(np.asarray(pol_s), np.asarray(pol_i),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(val_s), np.asarray(val_i),
                               rtol=1e-5, atol=1e-6)

    qi = quantize_network(net_i, var_i)
    qs = quantize_network(net_s, var_s)
    for a, b in zip(jax.tree_util.tree_leaves(qi),
                    jax.tree_util.tree_leaves(qs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_act_scales_track_dynamic():
    """calibrate()'s static scales reproduce the dynamic-quant forward
    closely on data from the calibration distribution."""
    from alphazero_tpu.models.quant import calibrate

    cfg, net, variables = _tiny()
    qp = quantize_network(net, variables)
    cal = [_planes(cfg, n=64, seed=s) for s in (10, 11)]
    sc = calibrate(qp, cal)
    assert len(sc) == 2 * cfg.num_blocks + 1

    planes = _planes(cfg, n=64, seed=12)
    pl_d, wl_d = quant_apply(qp, planes, dtype=jnp.float32)
    pl_s, wl_s = quant_apply(qp, planes, dtype=jnp.float32, act_scales=sc)
    pol_d = np.asarray(jax.nn.softmax(pl_d, -1))
    pol_s = np.asarray(jax.nn.softmax(pl_s, -1))
    tv = 0.5 * np.abs(pol_s - pol_d).sum(-1)
    assert tv.mean() < 0.02, tv.mean()


def test_quant_evaluator_composes_with_mesh():
    """The int8 evaluator works inside the sharded self-play move and is
    numerically invisible to sharding (same bit-identity contract as
    tests/test_sharded_selfplay.py)."""
    from alphazero_tpu.parallel.mesh import (
        make_mesh, shard_batch, sharded_selfplay_move,
    )
    from alphazero_tpu.train.selfplay import selfplay_move

    cfg, net, variables = _tiny()
    eval_fn = make_quant_evaluator(net, variables)
    spec = SearchSpec(num_simulations=8)
    states = initial_state((16,))
    rng = jax.random.PRNGKey(3)

    single = selfplay_move(states, rng, eval_fn, spec,
                           cfg.temperature_threshold)
    mesh = make_mesh(jax.devices()[:8])
    move_fn = sharded_selfplay_move(mesh, eval_fn, spec,
                                    cfg.temperature_threshold)
    sharded = move_fn(shard_batch(mesh, states), rng)
    np.testing.assert_array_equal(np.asarray(single[3]),
                                  np.asarray(sharded[3]))


@pytest.mark.parametrize("value_dtype", [jnp.float32, jnp.float16])
def test_quant_evaluator_drives_search(value_dtype):
    """make_quant_evaluator satisfies the search Evaluator contract and a
    16-sim search returns legal, normalized visit distributions — with
    both the f32 and the float16 tree (the two perf options compose)."""
    cfg, net, variables = _tiny()
    eval_fn = make_quant_evaluator(net, variables)

    states = initial_state((4,))
    spec = SearchSpec(num_simulations=16, c_puct=cfg.c_puct,
                      dirichlet_alpha=cfg.dirichlet_alpha,
                      dirichlet_epsilon=0.0, value_dtype=value_dtype)
    tree = search(states, eval_fn, spec, rng=jax.random.PRNGKey(0))
    v = np.asarray(root_child_visits(tree), np.float64)
    pi = v / v.sum(-1, keepdims=True)
    legal = np.asarray(legal_action_mask(states))
    assert (pi[~legal] == 0).all()
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-6)
    assert v.sum(-1).max() == 16  # the 16-bit tree counts sims exactly


def test_asym_sims_match_move_matches_symmetric_arena_move():
    """The equal-compute gate's per-lane program selection
    (scripts/eval_asym_match.py:asym_move): when both sides share one
    evaluator AND one sim budget, selecting between the two per-lane
    search results by side-to-move must reproduce the arena's fused
    single-program greedy move exactly — i.e. the asymmetric harness
    differs from arena/match.py only in the budgets it allows."""
    from alphazero_tpu.arena.match import _match_move
    from alphazero_tpu.env import breakthrough as env
    from alphazero_tpu.search import root_action_probs

    cfg, net, variables = _tiny()
    eval_fn = make_quant_evaluator(net, variables)
    spec = SearchSpec(num_simulations=12, c_puct=cfg.c_puct,
                      dirichlet_epsilon=0.0)

    states = initial_state((6,))
    a_is_white = jnp.asarray([i % 2 == 0 for i in range(6)])

    # arena path: one fused program, eval_ctx-routed (here: one net)
    ref = _match_move(states, a_is_white,
                      lambda planes, a_to_move: eval_fn(planes), spec)

    # asym path at equal budgets: two programs, per-lane action select
    a_to_move = jnp.where(states.turn == env.WHITE, a_is_white, ~a_is_white)
    acts_a = jnp.argmax(root_action_probs(
        search(states, eval_fn, spec), 0.0), -1).astype(jnp.int32)
    acts_b = jnp.argmax(root_action_probs(
        search(states, eval_fn, spec), 0.0), -1).astype(jnp.int32)
    got = env.step(states, jnp.where(a_to_move, acts_a, acts_b))

    np.testing.assert_array_equal(np.asarray(got.board),
                                  np.asarray(ref.board))
    np.testing.assert_array_equal(np.asarray(got.turn), np.asarray(ref.turn))
