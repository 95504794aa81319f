"""Checkpoint arch-metadata interop (VERDICT r2 items #2/#3).

The reference's contract is that any consumer can rebuild the right net
from the checkpoint alone (/root/reference/src/web.py:90-101,
parallel_trainer.py:306-309). The scanned residual tower stacks params on
a leading axis (models/network.py:99-104), so ``scan_blocks`` must be
recorded in alphazero_meta.json and honored by every loader — otherwise a
run trained with --scan-blocks cannot be loaded by a default-config
arena/web/trainer.

Also pins the multi-host fallback policy: with ``jax.process_count() > 1``
an unsharded learn() step would silently diverge parameters across hosts,
so it must be a hard error (single-process keeps the perf warning).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.train import Trainer
from alphazero_tpu.train import checkpoint as ckpt


def _save_checkpoint(tmp_path, scan_blocks, iteration=1):
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"),
                      num_blocks=2, num_filters=8,
                      scan_blocks=scan_blocks)
    tr = Trainer(cfg, seed=0)
    tr.iteration = iteration
    path = tr.save()
    return cfg, path


class TestScanBlocksMetadata:
    def test_meta_records_scan_blocks(self, tmp_path):
        for scan in (False, True):
            cfg, path = _save_checkpoint(tmp_path / str(scan), scan)
            arch = ckpt.checkpoint_arch(path)
            assert arch["scan_blocks"] is scan

    def test_arena_loader_honors_checkpoint_layout(self, tmp_path):
        # trained with the scanned tower, loaded under a DEFAULT config
        scan_cfg, path = _save_checkpoint(tmp_path, scan_blocks=True)
        live_cfg = scan_cfg.replace(scan_blocks=False)

        from alphazero_tpu.arena.runner import load_model_variables

        net, variables = load_model_variables(live_cfg, path)
        assert net.scan_blocks is True
        policy, value = policy_value_apply(
            net, variables, jnp.zeros((2, 3, 8, 8), jnp.float32))
        assert policy.shape == (2, 192)
        assert np.all(np.isfinite(np.asarray(policy)))
        assert np.all(np.abs(np.asarray(value)) <= 1.0)

    @pytest.mark.parametrize("ckpt_scan,live_scan",
                             [(True, False), (False, True)])
    def test_trainer_resume_honors_checkpoint_layout(
            self, tmp_path, ckpt_scan, live_scan):
        scan_cfg, path = _save_checkpoint(tmp_path, scan_blocks=ckpt_scan)
        live_cfg = scan_cfg.replace(scan_blocks=live_scan)

        tr = Trainer(live_cfg, seed=1)
        it = tr.resume()
        assert it == 1
        assert tr.net.scan_blocks is ckpt_scan
        assert tr.cfg.scan_blocks is ckpt_scan
        # scanned layout stacks the tower on one leading axis
        assert ("tower" in tr.state.params) is ckpt_scan
        # the restored state must drive a learn step under the new layout
        tr.buffer.add_arrays(
            np.zeros((32, 3, 8, 8), np.float32),
            np.full((32, 192), 1 / 192, np.float32),
            np.tile(np.array([1, 0], np.float32), (32, 1)))
        metrics = tr.learn(batch_size=16)
        assert np.isfinite(metrics["loss"])

    def test_web_loader_honors_checkpoint_layout(self, tmp_path):
        scan_cfg, path = _save_checkpoint(tmp_path, scan_blocks=True)
        ckpt.sync_best_model(scan_cfg, "iteration_1")
        live_cfg = scan_cfg.replace(scan_blocks=False)

        from alphazero_tpu.web.server import BotService

        svc = BotService(live_cfg)   # best -> latest -> random
        assert svc.model_name == "model_best"   # stays "random" on failure


class TestMultiHostFallbackPolicy:
    def test_nondivisible_batch_is_hard_error_multihost(self, tmp_path,
                                                        monkeypatch):
        assert jax.device_count() == 8
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"),
                          num_blocks=1, num_filters=8, batch_size=20)
        with pytest.raises(ValueError, match="diverge"):
            Trainer(cfg, seed=0)

    def test_nondivisible_batch_is_warning_single_process(self, tmp_path):
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"),
                          num_blocks=1, num_filters=8, batch_size=20)
        tr = Trainer(cfg, seed=0)   # warns, does not raise
        assert tr.mesh is not None

    def test_learn_rejects_nondivisible_override_multihost(self, tmp_path,
                                                           monkeypatch):
        cfg = tiny_config(checkpoint_dir=str(tmp_path / "ckpt"),
                          num_blocks=1, num_filters=8, batch_size=16)
        tr = Trainer(cfg, seed=0)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        tr.n_proc = 2
        tr.buffer.add_arrays(
            np.zeros((8, 3, 8, 8), np.float32),
            np.full((8, 192), 1 / 192, np.float32),
            np.tile(np.array([1, 0], np.float32), (8, 1)))
        with pytest.raises(RuntimeError, match="divergence"):
            tr.learn(batch_size=20)
