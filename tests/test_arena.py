"""Arena tests (pattern of reference tests/test_arena.py): pair keys,
match-count persistence, matchmaking heuristic statistics, random openings,
heuristic math — plus an end-to-end batched paired match with real tiny
nets and full checkpoint discovery."""

import json
import math
import os
import random

import jax
import numpy as np
import pytest

from alphazero_tpu.arena import (
    ArenaState,
    play_paired_matches,
    random_opening,
    select_matchup,
)
from alphazero_tpu.arena.elo import expected_score
from alphazero_tpu.config import tiny_config
from alphazero_tpu.env import OracleGame
from alphazero_tpu.models import init_network


@pytest.fixture
def cfg(tmp_path):
    return tiny_config(checkpoint_dir=str(tmp_path / "ckpt"))


class TestArenaState:
    def test_pair_key_canonical(self, cfg):
        assert ArenaState.pair_key("b", "a") == ArenaState.pair_key("a", "b")

    def test_elo_update_symmetric(self, cfg):
        st = ArenaState(cfg)
        st.record_match("iteration_1", "iteration_2", 3, 1)
        r1 = st.get_rating("iteration_1")
        r2 = st.get_rating("iteration_2")
        assert r1 > 1000 > r2
        assert r1 + r2 == pytest.approx(2000.0)

    def test_match_counts_persist_and_rebuild(self, cfg):
        st = ArenaState(cfg)
        st.record_match("a", "b", 2, 2)
        st.record_match("a", "b", 1, 3)
        assert st.get_match_count("b", "a") == 8

        st2 = ArenaState(cfg)  # reload from JSON; counts rebuilt from history
        assert st2.get_match_count("a", "b") == 8
        assert st2.get_rating("a") == pytest.approx(st.get_rating("a"))

    def test_best_model_tracked(self, cfg):
        st = ArenaState(cfg)
        st.record_match("a", "b", 4, 0)
        assert st.best_model == "a"
        with open(st.state_file) as f:
            data = json.load(f)
        assert data["best_model"] == "a"

    def test_expected_score_math(self):
        assert expected_score(1000, 1000) == pytest.approx(0.5)
        assert expected_score(1400, 1000) == pytest.approx(
            1 / (1 + 10 ** -1.0))


class TestMatchmaking:
    def test_prefers_equal_ratings(self, cfg):
        st = ArenaState(cfg)
        st.ratings = {"a": 1000.0, "b": 1005.0, "c": 1400.0}
        rng = random.Random(0)
        picks = [select_matchup(st, rng) for _ in range(50)]
        # the near-equal pair should dominate among non-exploration picks
        ab = sum(1 for p in picks if {p[0], p[1]} == {"a", "b"})
        assert ab >= 25

    def test_replayed_pairs_penalized(self, cfg):
        st = ArenaState(cfg)
        st.ratings = {"a": 1000.0, "b": 1000.0, "c": 1000.0}
        st.match_counts = {ArenaState.pair_key("a", "b"): 100}
        rng = random.Random(1)
        picks = [select_matchup(st, rng) for _ in range(50)]
        ab = sum(1 for p in picks if {p[0], p[1]} == {"a", "b"})
        assert ab < 25

    def test_heuristic_closed_form(self, cfg):
        st = ArenaState(cfg)
        st.ratings = {"a": 1000.0, "b": 1000.0}
        pick = select_matchup(st, random.Random(2))
        # p=0.5, N=0, z_top=0 => S = 0.25
        assert pick[2] == pytest.approx(0.25)

    def test_needs_two_models(self, cfg):
        st = ArenaState(cfg)
        st.ratings = {"only": 1000.0}
        assert select_matchup(st) is None


class TestOpenings:
    def test_random_opening_valid_and_varied(self):
        rng = random.Random(3)
        g1, g2 = random_opening(rng), random_opening(rng)
        assert g1.move_count == 6 and not g1.is_terminal()
        assert not np.array_equal(g1.board, g2.board)


class TestBatchedMatch:
    def test_paired_match_with_tiny_nets(self, cfg):
        net_a, vars_a = init_network(cfg, jax.random.PRNGKey(0))
        net_b, vars_b = init_network(cfg, jax.random.PRNGKey(1))
        openings = [OracleGame(), random_opening(random.Random(4))]
        wins_a, wins_b = play_paired_matches(
            net_a, vars_a, net_b, vars_b, openings, cfg, num_simulations=8,
            max_moves=200)
        assert wins_a + wins_b == 4  # no draws in Breakthrough
        assert wins_a >= 0 and wins_b >= 0

    def test_self_match_colors_balanced_shape(self, cfg):
        # identical models: outcome deterministic per opening; paired games
        # must produce exactly one win per game
        net, variables = init_network(cfg, jax.random.PRNGKey(0))
        wins_a, wins_b = play_paired_matches(
            net, variables, net, variables, [OracleGame()], cfg,
            num_simulations=4, max_moves=200)
        assert wins_a + wins_b == 2
