"""Round-trip test for scripts/archive_model.py (VERDICT r3 item #1).

Checkpoints outside /root/repo have been destroyed by container resets
twice; the archive tool is how strength evidence survives. The contract:
export(checkpoint) -> one npz; restore(npz) -> a checkpoint directory
that every consumer loads, with inference outputs equal to the original
within float16 parameter-rounding and metadata (iteration, learn_calls,
arch incl. scan_blocks) preserved.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import tiny_config
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.train import Trainer
from alphazero_tpu.train import checkpoint as ckpt

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "archive_model.py")


def _load_script():
    spec = importlib.util.spec_from_file_location("archive_model", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_archive_roundtrip(tmp_path):
    mod = _load_script()
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "orig"),
                      num_blocks=2, num_filters=8, scan_blocks=True)
    tr = Trainer(cfg, seed=0)
    tr.state = tr.state.replace(learn_calls=jnp.asarray(37, jnp.int32))
    tr.iteration = 5
    path = tr.save()

    npz = str(tmp_path / "model.npz")
    mod.export(path, npz)
    assert os.path.getsize(npz) > 0

    mod.restore(npz, str(tmp_path / "restored"))

    from alphazero_tpu.arena.runner import load_model_variables

    live = cfg.replace(checkpoint_dir=str(tmp_path / "restored"),
                       scan_blocks=False)  # must come from the meta
    rpath = os.path.join(str(tmp_path / "restored"), "iteration_5")
    net, variables = load_model_variables(live, rpath)
    assert net.scan_blocks is True

    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 8, 8)) > 0.5
    x = x.astype(jnp.float32)
    net32 = net.clone(dtype=jnp.float32)  # isolate f16 PARAM rounding
    p0, v0 = policy_value_apply(
        net32, {"params": tr.state.params,
                "batch_stats": tr.state.batch_stats}, x)
    p1, v1 = policy_value_apply(net32, variables, x)
    # params round-trip through f16: ~1e-3 relative; batch_stats exact
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               atol=5e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               atol=5e-3, rtol=0)

    # trainer resume sees the restored checkpoint with its metadata
    tr2 = Trainer(live, seed=9)
    it = tr2.resume()
    assert it == 5
    assert int(np.asarray(tr2.state.learn_calls)) == 37
    assert tr2.net.scan_blocks is True


def test_archive_meta_arch_recorded(tmp_path):
    mod = _load_script()
    cfg = tiny_config(checkpoint_dir=str(tmp_path / "orig"),
                      num_blocks=1, num_filters=8)
    tr = Trainer(cfg, seed=0)
    tr.iteration = 2
    path = tr.save()
    npz = str(tmp_path / "m.npz")
    mod.export(path, npz)
    mod.restore(npz, str(tmp_path / "restored"), name="model_best")
    arch = ckpt.checkpoint_arch(
        os.path.join(str(tmp_path / "restored"), "model_best"))
    assert arch["num_blocks"] == 1 and arch["num_filters"] == 8
