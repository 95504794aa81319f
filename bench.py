"""Benchmark: MCTS simulations/sec/chip at self-play settings.

Runs the flagship configuration (20-block/128-filter SE-ResNet, 800
simulations per move, Dirichlet root noise — BASELINE.json config 3) as one
compiled search program per move on the real chip and reports

    {"metric": "mcts_sims_per_sec_per_chip", ...}

against the driver's north-star target of 100k sims/s/chip.
Extra diagnostics go to stderr; stdout carries exactly one JSON line.

Env knobs: AZTPU_BENCH_GAMES (512), AZTPU_BENCH_SIMS (800),
AZTPU_BENCH_REPS (3), AZTPU_BENCH_MODE=move|selfplay — ``selfplay`` plays
whole games to completion through the full actor loop and reports
games/hour + env-steps/s on stderr alongside the sims/s metric.
AZTPU_BENCH_QUANT selects the evaluator: "static" (default — the
production self-play path since the round-5 strength gates passed:
equal-compute 40-24 over bf16, docs/quant-int8.md Decision),
"dynamic" (per-layer amax int8), or "off" (the bf16 tower).
"""

import functools
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from alphazero_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphazero_tpu.config import Config
    from alphazero_tpu.env import initial_state
    from alphazero_tpu.models import init_network
    from alphazero_tpu.search import SearchSpec, make_net_evaluator
    from alphazero_tpu.train.selfplay import selfplay_move

    num_games = int(os.environ.get("AZTPU_BENCH_GAMES", "512"))
    num_sims = int(os.environ.get("AZTPU_BENCH_SIMS", "800"))
    reps = int(os.environ.get("AZTPU_BENCH_REPS", "3"))
    value_dtype = os.environ.get("AZTPU_BENCH_VALUE_DTYPE", "float32")

    dev = jax.devices()[0]
    log(f"device: {dev}, games={num_games}, sims={num_sims}, "
        f"tree dtype={value_dtype}")

    cfg = Config(num_simulations=num_sims, value_dtype=value_dtype)
    net, variables = init_network(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    quant = os.environ.get("AZTPU_BENCH_QUANT", "static")
    if quant in ("1", "dynamic"):
        from alphazero_tpu.models.quant import make_quant_evaluator

        log("evaluator: int8 dynamic-amax (models/quant.py)")
        eval_fn = make_quant_evaluator(net, variables)
    elif quant == "static":
        from alphazero_tpu.models.quant import (
            calibrate,
            make_quant_evaluator,
            quantize_network,
        )

        log("evaluator: int8 static-calibrated (models/quant.py)")
        cal = [jnp.zeros((256, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)]
        eval_fn = make_quant_evaluator(
            net, variables,
            act_scales=calibrate(quantize_network(net, variables), cal))
    else:
        eval_fn = make_net_evaluator(net, variables, dtype=jnp.float32)
    spec = SearchSpec(
        num_simulations=num_sims,
        c_puct=cfg.c_puct,
        fpu_reduction=cfg.fpu_reduction,
        dirichlet_alpha=cfg.dirichlet_alpha,
        dirichlet_epsilon=cfg.dirichlet_epsilon,
        value_dtype=jnp.dtype(cfg.value_dtype),
    )

    states = initial_state((num_games,))
    rng = jax.random.PRNGKey(1)

    def run(states, rng):
        new_states, planes, probs, actions, values = selfplay_move(
            states, rng, eval_fn, spec, cfg.temperature_threshold)
        return new_states, actions

    mode = os.environ.get("AZTPU_BENCH_MODE", "move")
    if mode == "selfplay":
        from alphazero_tpu.train.selfplay import (
            selfplay_games,
            selfplay_games_continuous,
        )

        cfg2 = cfg.replace(parallel_games=num_games)
        play = (selfplay_games_continuous if cfg2.continuous_selfplay
                else selfplay_games)
        # warm-up: same program shapes (lane count fixes them), so one
        # short run compiles everything and the timed run is steady-state
        t0 = time.time()
        play(eval_fn, cfg2, rng, num_games=1)
        log(f"warm-up (compile): {time.time() - t0:.1f}s")
        t0 = time.time()
        examples, stats = play(eval_fn, cfg2, jax.random.PRNGKey(2))
        dt = time.time() - t0
        sims_per_sec = stats["simulations"] / dt
        log(f"selfplay: {stats['games']} games, {stats['moves']} moves, "
            f"{stats['examples']} examples in {dt:.1f}s (warm); "
            f"lockstep moves played: {stats['moves_played']}")
        games_per_hour = stats["games"] * 3600 / dt
        log(f"games/hour: {games_per_hour:,.0f}, "
            f"env-steps/s: {stats['moves'] / dt:,.1f}, "
            f"sims/s: {sims_per_sec:,.0f}")
        print(json.dumps({
            "metric": "selfplay_games_per_hour_per_chip",
            "value": round(games_per_hour, 1),
            "unit": "games/hour",
            "vs_baseline": round(sims_per_sec / 100_000.0, 4),
        }))
        return

    # Sync with np.asarray, not jax.block_until_ready: the axon backend's
    # block is unreliable (CLAUDE.md) — a host transfer is the only
    # trustworthy barrier for timing.
    t0 = time.time()
    states2, actions = run(states, rng)
    np.asarray(actions)
    log(f"compile+first move: {time.time() - t0:.1f}s")

    best = float("inf")
    cur = states
    for i in range(reps):
        rng, k = jax.random.split(rng)
        t0 = time.time()
        cur, actions = run(cur, k)
        np.asarray(actions)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"rep {i}: {dt:.3f}s -> {num_games * num_sims / dt:,.0f} sims/s")

    sims_per_sec = num_games * num_sims / best
    target = 100_000.0
    print(json.dumps({
        "metric": "mcts_sims_per_sec_per_chip",
        "value": round(sims_per_sec, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()
