"""16-bit search-tree dtype: validity guard + Config plumbing.

The fused Tree row stores child pointers and visit counts as floats of
``SearchSpec.value_dtype``, so 16-bit trees are only sound when every
integer up to the tree capacity is exactly representable (float16: 2048,
bfloat16: 256). These tests pin the trace-time guard and that
``Config.value_dtype`` actually reaches the search. On-chip perf/quality
measurements live in scripts/probe_value_dtype.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import initial_state
from alphazero_tpu.models import init_network
from alphazero_tpu.search import SearchSpec, make_net_evaluator, search
from alphazero_tpu.search.mcts import init_tree, root_child_visits


def _spec(dtype, sims=16):
    return SearchSpec(num_simulations=sims, value_dtype=dtype)


def test_bf16_tree_rejected_at_production_sims():
    states = initial_state((2,))
    with pytest.raises(ValueError, match="bfloat16"):
        init_tree(states, _spec(jnp.bfloat16, sims=800))


def test_f16_tree_rejected_past_2048():
    states = initial_state((2,))
    with pytest.raises(ValueError, match="float16"):
        init_tree(states, _spec(jnp.float16, sims=2048))


def test_f16_tree_valid_at_production_sims():
    # 800 sims / 802-slot capacity is inside float16's exact-integer range
    states = initial_state((2,))
    tree = init_tree(states, _spec(jnp.float16, sims=800))
    assert tree.rows.dtype == jnp.float16


def test_f16_search_counts_visits_exactly():
    cfg = tiny_config()
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    eval_fn = make_net_evaluator(net, variables)
    states = initial_state((4,))
    sims = 64
    visits16 = np.asarray(root_child_visits(
        search(states, eval_fn, _spec(jnp.float16, sims=sims))), np.int64)
    # visit counts are integers accumulated in f16 — they must sum exactly
    assert (visits16.sum(-1) == sims).all()
    visits32 = np.asarray(root_child_visits(
        search(states, eval_fn, _spec(jnp.float32, sims=sims))), np.int64)
    # same positions, same net: the f16 tree should pick (nearly) the same
    # principal action; tiny vsum rounding may reorder close seconds
    agree = (visits16.argmax(-1) == visits32.argmax(-1)).mean()
    assert agree >= 0.75, (visits16.argmax(-1), visits32.argmax(-1))


def test_config_value_dtype_reaches_selfplay():
    from alphazero_tpu.train.selfplay import selfplay_games

    cfg = tiny_config(value_dtype="float16", num_simulations=8,
                      parallel_games=4, continuous_selfplay=False)
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    eval_fn = make_net_evaluator(net, variables)
    examples, stats = selfplay_games(eval_fn, cfg, jax.random.PRNGKey(1),
                                     num_games=4)
    assert stats["moves"] > 0 and len(examples) > 0
