"""Pallas tree-kernel regression tests (interpret mode on CPU).

The TPU kernels in alphazero_tpu/search/kernels.py are validated bit-exact
against their XLA fallbacks here via the Pallas TPU interpreter, so CI
catches semantic regressions without a chip. On hardware they are the hot
path of every search (see the kernels module docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from alphazero_tpu.search import kernels as K

B, M, RS, L, A = 8, 17, 6, 128, 192
OFFSETS = (0, 2 * A, 3 * A)


@pytest.fixture
def data():
    key = jax.random.PRNGKey(0)
    rows = jax.random.normal(key, (B, M, RS, L), jnp.float32)
    node = jax.random.randint(key, (B,), 0, M)
    act = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, A)
    upd = jax.random.normal(jax.random.PRNGKey(2), (B, 3), jnp.float32)
    return rows, node, act, upd


def test_fetch_rows_matches_fallback(data):
    rows, node, _, _ = data
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._fetch_rows_tpu(rows, node))
    want = np.asarray(K._fetch_rows_xla(rows, node))
    np.testing.assert_array_equal(got, want)


def test_commit_edges_matches_fallback(data):
    rows, node, act, upd = data
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._commit_edges_tpu(rows, node, act, upd, OFFSETS))
    want = np.asarray(K._commit_edges_xla(rows, node, act, upd, OFFSETS))
    np.testing.assert_array_equal(got, want)


def test_commit_edges_duplicate_nodes_across_games(data):
    # Different games may hit the SAME node index — rows are per-game so
    # there is no collision; verify adds land independently.
    rows, _, act, upd = data
    node = jnp.zeros((B,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._commit_edges_tpu(rows, node, act, upd, OFFSETS))
    want = np.asarray(K._commit_edges_xla(rows, node, act, upd, OFFSETS))
    np.testing.assert_array_equal(got, want)


def test_kernels_with_batch_not_multiple_of_slots():
    # pipeline correctness when B % SLOTS != 0 and B < SLOTS
    for b in (3, 12):
        key = jax.random.PRNGKey(b)
        rows = jax.random.normal(key, (b, 9, RS, L), jnp.float32)
        node = jax.random.randint(key, (b,), 0, 9)
        act = jax.random.randint(key, (b,), 0, A)
        upd = jax.random.normal(key, (b, 3), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got_f = np.asarray(K._fetch_rows_tpu(rows, node))
            got_c = np.asarray(
                K._commit_edges_tpu(rows, node, act, upd, OFFSETS))
        np.testing.assert_array_equal(
            got_f, np.asarray(K._fetch_rows_xla(rows, node)))
        np.testing.assert_array_equal(
            got_c,
            np.asarray(K._commit_edges_xla(rows, node, act, upd, OFFSETS)))


def test_fallback_semantics():
    # The XLA fallback itself: single known update lands where expected.
    rows = jnp.zeros((2, 3, RS, L), jnp.float32)
    node = jnp.asarray([1, 2], jnp.int32)
    act = jnp.asarray([5, 191], jnp.int32)
    upd = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float32)
    out = np.asarray(K._commit_edges_xla(rows, node, act, upd, OFFSETS))
    flat = out.reshape(2, 3, RS * L)
    assert flat[0, 1, 0 + 5] == 1.0
    assert flat[0, 1, 2 * A + 5] == 2.0
    assert flat[0, 1, 3 * A + 5] == 3.0
    assert flat[1, 2, 0 + 191] == 4.0
    assert flat[1, 2, 3 * A + 191] == 6.0
    assert flat.sum() == 21.0
