"""Device-resident learn path (learner.train_epoch) parity.

learn()'s single-device scan path must be SEMANTICALLY IDENTICAL to the
per-step host loop it replaces: same epoch_batches indices, same
train_step body, same final parameters — only the data residency and
dispatch granularity change (the whole epoch compiles to one program
over the device-resident replay window).
"""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import tiny_config
from alphazero_tpu.train import Trainer


def _fill(tr, n=48, seed=3):
    rng = np.random.default_rng(seed)
    states = (rng.random((n, 3, 8, 8)) > 0.5).astype(np.float32)
    pi = rng.dirichlet(np.ones(192), size=n).astype(np.float32)
    wl = np.tile(np.array([1.0, 0.0], np.float32), (n, 1))
    tr.buffer.add_arrays(states, pi, wl)


def _tree_allclose(a, b, atol):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la, np.float32),
                                   np.asarray(lb, np.float32), atol=atol,
                                   rtol=0)


def test_device_epoch_matches_host_loop(tmp_path, monkeypatch):
    # the real TPU is one chip (mesh is None there); the test conftest
    # exposes 8 virtual devices, so pin the single-device branch both ways
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    results = {}
    for dev in (True, False):
        cfg = tiny_config(checkpoint_dir=str(tmp_path / f"c{dev}"),
                          num_blocks=2, num_filters=8, batch_size=16,
                          device_replay=dev)
        tr = Trainer(cfg, seed=0)
        assert tr.mesh is None  # single-device path in play
        _fill(tr)
        m = tr.learn()
        results[dev] = (tr.state, m)
        assert np.isfinite(m["loss"])

    s_dev, m_dev = results[True]
    s_host, m_host = results[False]
    # same permutation (same np_rng seed), same step body -> same training
    _tree_allclose(s_dev.params, s_host.params, atol=1e-5)
    _tree_allclose(s_dev.batch_stats, s_host.batch_stats, atol=1e-5)
    assert abs(m_dev["loss"] - m_host["loss"]) < 1e-4
    assert int(np.asarray(s_dev.learn_calls)) == int(
        np.asarray(s_host.learn_calls))


def test_device_replay_incremental_sync(tmp_path):
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "c"),
                      num_blocks=1, num_filters=8, batch_size=16,
                      device_replay=True)
    tr = Trainer(cfg, seed=0)
    _fill(tr, n=32, seed=1)
    first = tr._device_replay()
    assert first[0].shape[0] == tr.buffer.capacity  # full-window mirror
    again = tr._device_replay()
    assert first[0] is again[0]  # cached: no transfer without mutation
    _fill(tr, n=16, seed=2)
    refreshed = tr._device_replay()
    assert refreshed[0] is not first[0]  # incremental update applied
    for d, h in zip(refreshed, (tr.buffer.states, tr.buffer.policies,
                                tr.buffer.wls)):
        np.testing.assert_array_equal(np.asarray(d)[:48], h[:48])


def test_device_replay_ring_wrap(tmp_path):
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "c"),
                      num_blocks=1, num_filters=8, batch_size=16,
                      buffer_size=64, device_replay=True)
    tr = Trainer(cfg, seed=0)
    _fill(tr, n=48, seed=1)
    tr._device_replay()
    _fill(tr, n=48, seed=2)   # wraps: rows 48..63 then 0..31
    mirror = tr._device_replay()
    for d, h in zip(mirror, (tr.buffer.states, tr.buffer.policies,
                             tr.buffer.wls)):
        np.testing.assert_array_equal(np.asarray(d), h)
    assert len(tr.buffer) == 64


def test_device_epoch_loss_decreases(tmp_path, monkeypatch):
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "c"),
                      num_blocks=1, num_filters=8, batch_size=16,
                      device_replay=True)
    tr = Trainer(cfg, seed=0)
    assert tr.mesh is None
    _fill(tr, n=64)
    losses = [tr.learn()["loss"] for _ in range(4)]
    assert losses[-1] < losses[0]
