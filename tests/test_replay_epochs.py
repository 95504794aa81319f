"""Tests for reference epoch semantics (epoch_batches) and the multi-host
write guard (utils.is_coordinator).

Reference contract: learn() iterates the full 2x-augmented dataset,
shuffled, WITHOUT replacement, once per epoch
(/root/reference/src/parallel_trainer.py:231-246). The TPU divergence —
tail batch wrap-padded to keep train-step shapes static — is pinned here.
"""

import os

import numpy as np
import pytest

from alphazero_tpu.train.replay import ReplayBuffer, epoch_batches


class TestEpochBatches:
    @pytest.mark.parametrize("n,bs", [(100, 32), (64, 16), (5, 8), (1, 4),
                                      (300, 7)])
    def test_without_replacement_coverage(self, n, bs):
        rng = np.random.default_rng(0)
        base, mirror = epoch_batches(rng, n, bs)
        n_aug = 2 * n
        steps = max(1, -(-n_aug // bs))
        assert base.shape == (steps, bs)
        assert mirror.shape == (steps, bs)
        assert base.min() >= 0 and base.max() < n

        # every (example, orientation) pair appears once; the wrap padding
        # repeats exactly steps*bs - 2n pairs a second time
        pair = base + n * mirror.astype(np.int64)
        counts = np.bincount(pair.ravel(), minlength=n_aug)
        assert counts.min() >= 1, "a pair was never visited"
        pad = steps * bs - n_aug
        assert (counts - 1).sum() == max(pad, 0)
        assert counts.max() <= 2 or n_aug < bs

    def test_mirrored_and_raw_both_covered(self):
        rng = np.random.default_rng(1)
        base, mirror = epoch_batches(rng, 50, 10)
        # each example index appears in both orientations
        for orient in (False, True):
            seen = set(base[mirror == orient].tolist())
            assert seen == set(range(50))

    def test_explicit_steps_override(self):
        """Multi-host lockstep: an explicit step count wraps (too few
        examples) or truncates (too many) the local permutation."""
        rng = np.random.default_rng(4)
        base, mirror = epoch_batches(rng, 100, 32, steps=3)   # truncates
        assert base.shape == (3, 32)
        base, mirror = epoch_batches(rng, 4, 32, steps=5)     # wraps
        assert base.shape == (5, 32)
        pair = base + 4 * mirror.astype(np.int64)
        assert set(pair.ravel().tolist()) == set(range(8))

    def test_epochs_are_differently_shuffled(self):
        rng = np.random.default_rng(2)
        b1, m1 = epoch_batches(rng, 128, 32)
        b2, m2 = epoch_batches(rng, 128, 32)
        assert not (np.array_equal(b1, b2) and np.array_equal(m1, m2))

    def test_get_matches_sample_layout(self):
        buf = ReplayBuffer(16, num_actions=192)
        states = np.random.default_rng(3).integers(
            0, 2, (10, 3, 8, 8)).astype(np.uint8)
        pols = np.random.default_rng(4).random((10, 192)).astype(np.float32)
        wls = np.random.default_rng(5).random((10, 2)).astype(np.float32)
        buf.add_arrays(states, pols, wls)
        s, p, w = buf.get(np.array([0, 3, 9]))
        assert s.dtype == np.float32
        np.testing.assert_array_equal(s, states[[0, 3, 9]].astype(np.float32))
        np.testing.assert_array_equal(p, pols[[0, 3, 9]])
        np.testing.assert_array_equal(w, wls[[0, 3, 9]])


class TestMultiHostWriteGuard:
    """Non-coordinator processes must not touch the filesystem
    (SURVEY.md §5 distributed-backend obligation; VERDICT round-1 #4)."""

    def _patch_noncoordinator(self, monkeypatch):
        # the guard call sites bind the name at import time from the
        # package index, so patch each consuming module's reference
        import alphazero_tpu.arena.elo as elo_mod
        import alphazero_tpu.train.trainer as trainer_mod
        import alphazero_tpu.utils as utils_pkg
        import alphazero_tpu.utils.runtime as runtime_mod

        monkeypatch.setattr(runtime_mod, "is_coordinator", lambda: False)
        monkeypatch.setattr(trainer_mod, "is_coordinator", lambda: False)
        monkeypatch.setattr(elo_mod, "is_coordinator", lambda: False)
        # checkpoint.py imports the name from the package at call time
        monkeypatch.setattr(utils_pkg, "is_coordinator", lambda: False)

    def test_trainer_writes_skipped(self, tmp_path, monkeypatch):
        from alphazero_tpu.config import tiny_config
        from alphazero_tpu.train.trainer import Trainer

        self._patch_noncoordinator(monkeypatch)
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"))
        tr = Trainer(cfg, seed=0)
        tr.proc = 1    # simulate a non-zero host
        tr.iteration = 1
        path = tr.save()
        assert not os.path.exists(path)
        # replay data is HOST-LOCAL: a non-zero host writes its OWN shard
        # file (no cross-host race), never the shared training_data.npz
        n = tr.append_data([(np.zeros((3, 8, 8), np.uint8),
                             np.full(192, 1 / 192, np.float32),
                             np.array([1, 0], np.float32))])
        assert n == 1
        assert os.path.exists(
            cfg.checkpoint_path("training_data_p1.npz"))
        assert not os.path.exists(cfg.checkpoint_path("training_data.npz"))
        tr._write_metrics({"loss": 1.0})
        assert not os.path.exists(tr.metrics_path)

    def test_host_data_path(self):
        from alphazero_tpu.train.replay import host_data_path

        assert host_data_path("a/training_data.npz", 0) == \
            "a/training_data.npz"
        assert host_data_path("a/training_data.npz", 3) == \
            "a/training_data_p3.npz"

    def test_arena_state_save_skipped(self, tmp_path, monkeypatch):
        from alphazero_tpu.arena.elo import ArenaState
        from alphazero_tpu.config import tiny_config

        self._patch_noncoordinator(monkeypatch)
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"))
        st = ArenaState(cfg)
        st.record_match("iteration_1", "iteration_2", 3, 1)
        assert not os.path.exists(st.state_file)
        # ratings still update in memory (identical on every host)
        assert st.ratings["iteration_1"] > st.ratings["iteration_2"]

    def test_coordinator_writes(self, tmp_path):
        """Default single-process path: is_coordinator() is True and the
        write happens (regression against over-guarding)."""
        from alphazero_tpu.arena.elo import ArenaState
        from alphazero_tpu.config import tiny_config
        from alphazero_tpu.utils import is_coordinator

        assert is_coordinator()
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"))
        st = ArenaState(cfg)
        st.record_match("iteration_1", "iteration_2", 3, 1)
        assert os.path.exists(st.state_file)
