"""Trainer / learner / replay / checkpoint tests.

Includes the reference's surgical regression (tests/test_trainer.py:28-64):
after loading a checkpoint, the cosine schedule must follow the LIVE
config's T_max, not anything persisted.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import tiny_config
from alphazero_tpu.train import Trainer, cosine_lr
from alphazero_tpu.train.learner import mirror_permutation
from alphazero_tpu.train.replay import (
    ReplayBuffer,
    append_training_data,
    load_training_data,
)


def make_tiny_trainer(tmp_path, **kw):
    cfg = tiny_config(
        checkpoint_dir=str(tmp_path / "ckpt"),
        num_simulations=8,
        parallel_games=4,
        batch_size=16,
        selfplay_batches=1,
        num_blocks=1,
        num_filters=8,
        **kw,
    )
    return Trainer(cfg, seed=0)


class TestReplay:
    def test_ring_buffer(self):
        buf = ReplayBuffer(capacity=10)
        ex = [(np.ones((3, 8, 8)), np.full(192, 1 / 192, np.float32),
               np.array([1, 0], np.float32)) for _ in range(25)]
        buf.add(ex)
        assert len(buf) == 10
        s, p, wl = buf.sample(np.random.default_rng(0), 4)
        assert s.shape == (4, 3, 8, 8) and s.dtype == np.float32
        assert p.shape == (4, 192) and wl.shape == (4, 2)

    def test_disk_roundtrip(self, tmp_path):
        path = str(tmp_path / "training_data.npz")
        ex1 = [(np.zeros((3, 8, 8)), np.zeros(192, np.float32),
                np.array([1, 0], np.float32))] * 5
        ex2 = [(np.ones((3, 8, 8)), np.ones(192, np.float32) / 192,
                np.array([0, 1], np.float32))] * 7
        assert append_training_data(path, ex1) == 5
        assert append_training_data(path, ex2) == 12
        buf = ReplayBuffer(capacity=8)
        loaded = load_training_data(path, buf)
        assert loaded == 8  # newest 8 of 12
        assert len(buf) == 8


class TestMirrorAugmentation:
    def test_permutation_is_involution(self):
        perm = mirror_permutation()
        np.testing.assert_array_equal(perm[perm], np.arange(192))

    def test_matches_reference_mapping(self):
        perm = mirror_permutation()
        # square (r, c) dir left -> square (r, 7-c) dir right
        sq, msq = 2 * 8 + 1, 2 * 8 + 6
        assert perm[sq * 3 + 1] == msq * 3 + 2
        assert perm[sq * 3 + 2] == msq * 3 + 1
        assert perm[sq * 3 + 0] == msq * 3 + 0


class TestCosineSchedule:
    def test_closed_form(self):
        cfg = tiny_config(learning_rate=1e-3, lr_t_max=200, lr_eta_min=1e-5)
        assert float(cosine_lr(cfg, jnp.asarray(0))) == pytest.approx(1e-3)
        assert float(cosine_lr(cfg, jnp.asarray(200))) == pytest.approx(1e-5)
        mid = float(cosine_lr(cfg, jnp.asarray(100)))
        assert mid == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-5)

    def test_t_max_follows_live_config_after_resume(self, tmp_path):
        """Reference regression: checkpoint carries the schedule position,
        but T_max always comes from the live config."""
        tr = make_tiny_trainer(tmp_path)
        tr.state = tr.state.replace(learn_calls=jnp.asarray(50, jnp.int32))
        tr.save(1)

        # resume under a config with a different T_max
        tr2 = make_tiny_trainer(tmp_path)
        tr2.cfg = tr2.cfg.replace(lr_t_max=100)
        tr2.resume()
        assert int(tr2.state.learn_calls) == 50
        got = float(cosine_lr(tr2.cfg, tr2.state.learn_calls))
        want = 1e-5 + (tr2.cfg.learning_rate - 1e-5) * (
            1 + math.cos(math.pi * 50 / 100)) / 2
        assert got == pytest.approx(want, rel=1e-6)


class TestEndToEnd:
    def test_selfplay_produces_valid_examples(self, tmp_path):
        tr = make_tiny_trainer(tmp_path)
        examples, stats = tr.execute_selfplay()
        assert stats["games"] == 4
        assert len(examples) == stats["examples"] > 0
        s, p, wl = examples[0]
        assert s.shape == (3, 8, 8)
        assert p.shape == (192,)
        assert p.sum() == pytest.approx(1.0, abs=1e-4)
        assert sorted(wl.tolist()) == [0.0, 1.0]
        # every game's examples have consistent alternating WL targets
        # and per-game example counts sum to total moves
        assert stats["moves"] == len(examples)

    def test_learn_reduces_loss_on_fixed_buffer(self, tmp_path):
        tr = make_tiny_trainer(tmp_path)
        rng = np.random.default_rng(0)
        ex = []
        for _ in range(64):
            s = (rng.random((3, 8, 8)) < 0.3).astype(np.float32)
            p = np.zeros(192, np.float32)
            p[rng.integers(192)] = 1.0
            wl = np.array([1.0, 0.0], np.float32)
            ex.append((s, p, wl))
        tr.buffer.add(ex)
        m1 = tr.learn(epochs=1)
        for _ in range(8):
            m2 = tr.learn(epochs=1)
        assert m2["loss"] < m1["loss"]
        assert int(tr.state.learn_calls) == 9

    def test_full_iteration_and_resume(self, tmp_path):
        tr = make_tiny_trainer(tmp_path)
        metrics = tr.run_iteration()
        assert metrics["iteration"] == 1
        assert os.path.isdir(tr.cfg.checkpoint_path("iteration_1"))
        assert os.path.exists(tr.cfg.checkpoint_path("training_data.npz"))

        tr2 = make_tiny_trainer(tmp_path)
        it = tr2.resume()
        assert it == 1
        assert len(tr2.buffer) == metrics["examples_new"]
        # params actually restored (match trained, not fresh-init)
        a = jax.tree_util.tree_leaves(tr.state.params)[0]
        b = jax.tree_util.tree_leaves(tr2.state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestContinuousSelfplay:
    def test_autoreset_produces_complete_episodes(self, tmp_path):
        import jax

        from alphazero_tpu.models import init_network
        from alphazero_tpu.search.mcts import make_net_evaluator
        from alphazero_tpu.train.selfplay import (
            selfplay_games,
            selfplay_games_continuous,
        )

        cfg = tiny_config(num_blocks=2, num_filters=8, num_simulations=8,
                          parallel_games=4)
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        eval_fn = make_net_evaluator(net, variables)

        examples, stats = selfplay_games_continuous(
            eval_fn, cfg, jax.random.PRNGKey(1), num_games=6)
        assert stats["games"] >= 6
        assert stats["examples"] == stats["moves"] == len(examples)
        # every example well-formed: policy sums to 1 over legal actions,
        # wl is a one-hot win/loss pair
        for s, p, wl in examples[:50]:
            assert s.shape == (3, 8, 8)
            np.testing.assert_allclose(p.sum(), 1.0, atol=1e-4)
            assert sorted(wl.tolist()) == [0.0, 1.0]

        # the WL-signal should be internally consistent with the classic
        # (non-resetting) generator: both emit (win, loss) from the mover's
        # perspective, so the mean of wl[0] is ~0.5 in both
        ex2, _ = selfplay_games(eval_fn, cfg, jax.random.PRNGKey(1),
                                num_games=4)
        w1 = np.mean([e[2][0] for e in examples])
        w2 = np.mean([e[2][0] for e in ex2])
        assert 0.2 < w1 < 0.8 and 0.2 < w2 < 0.8


class TestShardedEquivalence:
    def test_sharded_train_step_matches_unsharded(self):
        """The mesh-sharded train step must be numerically equivalent to the
        single-device step (same batch, same init) — the collectives only
        change WHERE the math runs."""
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.models import init_network
        from alphazero_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch,
            sharded_train_step,
        )
        from alphazero_tpu.train.learner import (
            create_train_state,
            train_step,
        )

        cfg = tiny_config(num_blocks=2, num_filters=8, batch_size=16)
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        # independent buffer copies: train_step donates its state argument
        copy = lambda v: jax.tree_util.tree_map(jnp.array, v)
        state_a = create_train_state(cfg, net, copy(variables))
        state_b = create_train_state(cfg, net, copy(variables))

        k = jax.random.PRNGKey(7)
        states = jax.random.uniform(k, (16, 3, 8, 8))
        pi = jax.nn.softmax(jax.random.normal(k, (16, 192)))
        wl = jax.nn.one_hot(jax.random.bernoulli(k, 0.5, (16,)).astype(int),
                            2)
        mirror = jax.random.bernoulli(k, 0.5, (16,))

        state_a, m_a = train_step(state_a, (states, pi, wl), mirror,
                                  net, cfg)

        mesh = make_mesh()
        state_b = replicate(mesh, state_b)
        step = sharded_train_step(mesh, net, cfg)
        batch = shard_batch(mesh, (states, pi, wl))
        state_b, m_b = step(state_b, batch, shard_batch(mesh, mirror))

        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=2e-5)
        pa = jax.tree_util.tree_leaves(state_a.params)
        pb = jax.tree_util.tree_leaves(state_b.params)
        # sharded psum changes the floating-point reduction order; Adam's
        # grad/sqrt(v) normalization can amplify that for near-zero grads
        for a, b in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)

    def test_autoreset_lane_restarts_at_initial_position(self):
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.env import breakthrough as env
        from alphazero_tpu.search import SearchSpec
        from alphazero_tpu.train.selfplay import selfplay_move_autoreset

        # lane 0: White one step from winning; lane 1: fresh game
        board = np.zeros((8, 8), np.int8)
        board[6, 3] = 1   # white pawn one move from the far row
        board[0, 0] = -1  # lone black pawn (keeps the game legal)
        states = env.EnvState(
            board=jnp.asarray(np.stack([board, np.asarray(
                env._initial_board_np())])),
            turn=jnp.asarray([1, 1], jnp.int8),
            winner=jnp.zeros((2,), jnp.int8),
            done=jnp.zeros((2,), bool),
            move_count=jnp.asarray([30, 0], jnp.int32),
        )

        def greedy_eval(planes):
            B = planes.shape[0]
            return (jnp.full((B, 192), 1 / 192, jnp.float32),
                    jnp.zeros((B,), jnp.float32))

        spec = SearchSpec(num_simulations=32)
        # temp threshold 0 -> argmax move; 32 sims strongly favor the win
        new_states, planes, probs, ended, winner = jax.jit(
            lambda s: selfplay_move_autoreset(
                s, jax.random.PRNGKey(0), greedy_eval, spec, 0))(states)

        ended = np.asarray(ended)
        assert ended[0] and not ended[1]
        assert int(np.asarray(winner)[0]) == 1     # White won lane 0
        # lane 0 restarted at the initial position with a reset move clock
        b0 = np.asarray(new_states.board[0])
        assert (b0[0:2] == 1).all() and (b0[6:8] == -1).all()
        assert int(new_states.move_count[0]) == 0
        assert not bool(new_states.done[0])
        # lane 1 just advanced normally
        assert int(new_states.move_count[1]) == 1


class TestSelfplayQuant:
    """cfg.selfplay_quant swaps the SELF-PLAY evaluator for the int8 tower
    (models/quant.py); training math is untouched. These pin that a full
    iteration runs end-to-end under both flavors and that static falls
    back to dynamic scales while the buffer is empty."""

    @pytest.mark.parametrize("flavor", ["dynamic", "static"])
    def test_full_iteration_runs(self, tmp_path, flavor):
        tr = make_tiny_trainer(tmp_path, selfplay_quant=flavor)
        metrics = tr.run_iteration()
        assert metrics["examples_new"] > 0
        assert math.isfinite(metrics["loss"])

    def test_static_calibrates_on_replay_after_first_iteration(self, tmp_path):
        tr = make_tiny_trainer(tmp_path, selfplay_quant="static")
        tr.run_iteration()
        assert len(tr.buffer) > 0
        # second iteration takes the calibrated-scales branch
        metrics = tr.run_iteration()
        assert metrics["examples_new"] > 0

    def test_quant_examples_are_valid(self, tmp_path):
        tr = make_tiny_trainer(tmp_path, selfplay_quant="dynamic")
        examples, stats = tr.execute_selfplay()
        assert len(examples) == stats["examples"] > 0
        s, p, wl = examples[0]
        assert p.sum() == pytest.approx(1.0, abs=1e-4)
        assert sorted(wl.tolist()) == [0.0, 1.0]
