"""Sharded self-play coverage (VERDICT round-1 #2).

The round-1 gap: ``sharded_selfplay_move`` and the mesh branches in
``selfplay_games(_continuous)`` were only reachable through the (broken)
dryrun, never under test. These tests pin, on the 8-virtual-device CPU
mesh, that sharding the game batch over the "data" axis is numerically
invisible: per-game tree walks are independent along the batch dimension,
so the sharded program must produce BIT-IDENTICAL moves, probabilities,
and training examples to the single-device program on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.models import init_network
from alphazero_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_selfplay_move,
)
from alphazero_tpu.search import SearchSpec, make_net_evaluator
from alphazero_tpu.train.selfplay import (
    selfplay_games,
    selfplay_games_continuous,
    selfplay_move,
)


@pytest.fixture(scope="module")
def tiny_net_eval():
    cfg = tiny_config(num_blocks=2, num_filters=8)
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    return cfg, make_net_evaluator(net, variables)


def diverse_states(n, seed=0):
    """A batch of positions a few random legal moves into the game."""
    rng = jax.random.PRNGKey(seed)
    states = env.initial_state((n,))
    step = jax.jit(env.step)
    for i in range(6):
        rng, k = jax.random.split(rng)
        mask = env.legal_action_mask(states)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        a = jax.random.categorical(k, logits).astype(jnp.int32)
        states = step(states, a)
    return states


class TestShardedSelfplayMove:
    def test_bit_identical_to_single_device(self, tiny_net_eval):
        cfg, eval_fn = tiny_net_eval
        spec = SearchSpec(num_simulations=16)
        states = diverse_states(16)
        rng = jax.random.PRNGKey(42)

        single = selfplay_move(states, rng, eval_fn, spec,
                               cfg.temperature_threshold)

        mesh = make_mesh(jax.devices()[:8])
        move_fn = sharded_selfplay_move(mesh, eval_fn, spec,
                                        cfg.temperature_threshold)
        sharded = move_fn(shard_batch(mesh, states), rng)

        # Decisions (moves, visit-count policies, resulting states) must be
        # BIT-identical; the diagnostic root value may differ at float32
        # op-order level (~1e-8) because XLA fuses the vsum reduction
        # differently under the sharded layout.
        names = ("new_states", "planes", "probs", "actions")
        for name, a, b in zip(names, single[:4], sharded[:4]):
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            for x, y in zip(la, lb):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"output {name} differs under sharding")
        np.testing.assert_allclose(
            np.asarray(single[4]), np.asarray(sharded[4]), atol=1e-6,
            err_msg="root values diverge beyond op-order noise")

    def test_output_sharding_stays_on_data_axis(self, tiny_net_eval):
        """The batch axis of every output must remain sharded (no silent
        all-gather pulling the tree back to one device)."""
        cfg, eval_fn = tiny_net_eval
        spec = SearchSpec(num_simulations=8)
        mesh = make_mesh(jax.devices()[:8])
        move_fn = sharded_selfplay_move(mesh, eval_fn, spec,
                                        cfg.temperature_threshold)
        out = move_fn(shard_batch(mesh, env.initial_state((16,))),
                      jax.random.PRNGKey(0))
        actions = out[3]
        assert len(actions.sharding.device_set) == 8, (
            f"actions gathered to {actions.sharding}")


class TestShardedSelfplayGames:
    def _spy_shard_batch(self, monkeypatch):
        import alphazero_tpu.parallel.mesh as mesh_mod

        calls = []
        orig = mesh_mod.shard_batch

        def spy(mesh, tree):
            calls.append(True)
            return orig(mesh, tree)

        monkeypatch.setattr(mesh_mod, "shard_batch", spy)
        return calls

    def test_games_identical_with_and_without_mesh(self, tiny_net_eval,
                                                   monkeypatch):
        cfg, eval_fn = tiny_net_eval
        cfg = cfg.replace(num_simulations=8, parallel_games=16,
                          max_game_length=96)
        rng = jax.random.PRNGKey(3)

        ex_single, st_single = selfplay_games(eval_fn, cfg, rng)

        calls = self._spy_shard_batch(monkeypatch)
        mesh = make_mesh(jax.devices()[:8])
        ex_shard, st_shard = selfplay_games(eval_fn, cfg, rng, mesh=mesh)
        assert calls, "mesh branch (selfplay.py shard_batch) did not run"

        assert st_single == st_shard
        assert len(ex_single) == len(ex_shard)
        for (s1, p1, w1), (s2, p2, w2) in zip(ex_single, ex_shard):
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(p1, p2)
            np.testing.assert_array_equal(w1, w2)

    def test_continuous_identical_with_and_without_mesh(self, tiny_net_eval,
                                                        monkeypatch):
        cfg, eval_fn = tiny_net_eval
        cfg = cfg.replace(num_simulations=8, parallel_games=16,
                          max_game_length=96)
        rng = jax.random.PRNGKey(5)

        ex_single, st_single = selfplay_games_continuous(
            eval_fn, cfg, rng, num_games=16)

        calls = self._spy_shard_batch(monkeypatch)
        mesh = make_mesh(jax.devices()[:8])
        ex_shard, st_shard = selfplay_games_continuous(
            eval_fn, cfg, rng, num_games=16, mesh=mesh)
        assert calls, "mesh branch (continuous) did not run"

        assert st_single == st_shard
        assert len(ex_single) == len(ex_shard)
        for (s1, p1, w1), (s2, p2, w2) in zip(ex_single, ex_shard):
            np.testing.assert_array_equal(s1, s2)
            np.testing.assert_array_equal(p1, p2)
            np.testing.assert_array_equal(w1, w2)


class TestTrainerShardedSelfplay:
    def test_trainer_mesh_selfplay_branch_runs(self, tmp_path, monkeypatch):
        """A Trainer whose parallel_games divides the mesh runs its
        self-play through the sharded path (round-1 trainer tests used
        parallel_games=4 on 8 devices, so the branch never executed)."""
        import alphazero_tpu.parallel.mesh as mesh_mod

        from alphazero_tpu.train import Trainer

        calls = []
        orig = mesh_mod.shard_batch

        def spy(mesh, tree):
            calls.append(True)
            return orig(mesh, tree)

        monkeypatch.setattr(mesh_mod, "shard_batch", spy)

        cfg = tiny_config(
            checkpoint_dir=str(tmp_path / "ckpt"),
            num_blocks=1, num_filters=8, num_simulations=8,
            parallel_games=8, batch_size=16, selfplay_batches=1,
            max_game_length=96,
        )
        tr = Trainer(cfg, seed=0)
        assert tr.mesh is not None, "8-device CPU backend should build a mesh"
        examples, stats = tr.execute_selfplay()
        assert calls, "trainer self-play did not take the sharded path"
        assert stats["games"] >= 8 and len(examples) > 0
