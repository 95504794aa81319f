"""Model tests (pattern of reference tests/test_model.py): shapes, logits
validity, value range, batch-size-1, and gradient flow to every parameter."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import encoded_state, initial_state
from alphazero_tpu.models import init_network, policy_value_apply, wl_to_value
from alphazero_tpu.models.network import count_params


@pytest.fixture(scope="module")
def tiny_net():
    cfg = tiny_config()
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    return cfg, net, variables


class TestForward:
    def test_shapes(self, tiny_net):
        cfg, net, variables = tiny_net
        x = jnp.zeros((4, 3, 8, 8), jnp.float32)
        p, wl = net.apply(variables, x, train=False)
        assert p.shape == (4, 192)
        assert wl.shape == (4, 2)
        assert p.dtype == jnp.float32

    def test_batch_size_one(self, tiny_net):
        cfg, net, variables = tiny_net
        p, wl = net.apply(variables, jnp.zeros((1, 3, 8, 8)), train=False)
        assert p.shape == (1, 192) and wl.shape == (1, 2)

    def test_value_in_range(self, tiny_net):
        cfg, net, variables = tiny_net
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 8, 8))
        _, wl = net.apply(variables, x, train=False)
        v = wl_to_value(wl)
        assert jnp.all(v >= -1.0) and jnp.all(v <= 1.0)

    def test_policy_probs_normalized(self, tiny_net):
        cfg, net, variables = tiny_net
        planes = encoded_state(initial_state((4,)))
        probs, value = policy_value_apply(net, variables, planes)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
        assert value.shape == (4,)

    def test_train_mode_updates_batch_stats(self, tiny_net):
        cfg, net, variables = tiny_net
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 8, 8))
        _, new_state = net.apply(
            variables, x, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_param_count_flagship(self):
        from alphazero_tpu.config import Config
        cfg = Config()
        _, variables = init_network(cfg, jax.random.PRNGKey(0))
        n = count_params(variables)
        # reference 20x128 net is ~8.0M params (SURVEY.md §2 #3)
        assert 7_000_000 < n < 9_000_000


class TestGradients:
    def test_grads_flow_to_all_params(self, tiny_net):
        cfg, net, variables = tiny_net
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 8, 8))
        target_pi = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(4), (4, 192)))
        target_wl = jnp.tile(jnp.array([[1.0, 0.0]]), (4, 1))

        def loss_fn(params):
            (p_logits, wl_logits), _ = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            lp = -jnp.mean(jnp.sum(target_pi * jax.nn.log_softmax(p_logits), -1))
            lv = optax.softmax_cross_entropy(wl_logits, target_wl).mean()
            return lp + lv

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        zero = [jax.tree_util.keystr(k) for k, g in flat
                if not np.any(np.abs(np.asarray(g)) > 0)]
        assert not zero, f"zero grads: {zero}"


class TestScannedTower:
    """scan_blocks=True (fast-compile tower, docs/compile-latency.md) must
    be numerically equivalent to the inlined tower (same ops per block;
    XLA fusion may reorder float ops at ~1e-7)."""

    def test_scan_matches_inlined(self):
        import flax
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.config import tiny_config
        from alphazero_tpu.models.network import init_network

        cfg = tiny_config(num_blocks=3, num_filters=16)
        net_s, var_s = init_network(cfg.replace(scan_blocks=True),
                                    jax.random.PRNGKey(0))
        net_i, _ = init_network(cfg, jax.random.PRNGKey(0))

        # rebuild the inlined variable tree from the stacked scan params
        def unstack(tree):
            flat = flax.traverse_util.flatten_dict(tree)
            out = {}
            for k, v in flat.items():
                if k[0] == "tower":
                    for b in range(cfg.num_blocks):
                        out[(f"block_{b}",) + k[2:]] = v[b]
                else:
                    out[k] = v
            return flax.traverse_util.unflatten_dict(out)

        var_i = {c: unstack(t) for c, t in var_s.items()}
        planes = jax.random.uniform(jax.random.PRNGKey(7), (4, 3, 8, 8))
        ps, ws = net_s.apply(var_s, planes, train=False)
        pi, wi = net_i.apply(var_i, planes, train=False)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pi),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(wi),
                                   rtol=1e-5, atol=1e-5)
        n_s = sum(x.size for x in jax.tree_util.tree_leaves(var_s["params"]))
        n_i = sum(x.size for x in jax.tree_util.tree_leaves(var_i["params"]))
        assert n_s == n_i

    def test_scan_train_mode_updates_stats(self):
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.config import tiny_config
        from alphazero_tpu.models.network import init_network

        cfg = tiny_config(num_blocks=3, num_filters=16, scan_blocks=True)
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        planes = jax.random.uniform(jax.random.PRNGKey(1), (8, 3, 8, 8))
        (_, _), mut = net.apply(variables, planes, train=True,
                                mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))
