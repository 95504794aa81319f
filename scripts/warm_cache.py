"""Pre-warm the persistent XLA compilation cache (VERDICT r2 #7).

Compiles the flagship program shapes into ``.jax_cache`` so subsequent
entry points (``bench.py``, ``main.py train``, the driver's bench run)
start warm: the 20x128 inlined tower at 512 games x 800 sims costs ~950s
to compile cold but ~21s from a warm cache (docs/compile-latency.md).

Programs warmed (override shapes with the same env knobs as bench.py):

1. the self-play move at bench shapes (AZTPU_BENCH_GAMES x AZTPU_BENCH_SIMS,
   plus AZTPU_BENCH_VALUE_DTYPE) — the program bench.py times;
2. optionally (AZTPU_WARM_TRAIN=1) the training-shape move
   (parallel_games x num_simulations) and one learn() minibatch step.

Run once after any change to search/mcts.py, the model, or batch shapes:

    python scripts/warm_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def _bench_evaluator(net, variables, quant: str):
    """Same evaluator selection as bench.py's AZTPU_BENCH_QUANT knob, so
    the warmed program is the one the driver's bench run will load."""
    if quant in ("1", "dynamic"):
        from alphazero_tpu.models.quant import make_quant_evaluator

        return make_quant_evaluator(net, variables)
    if quant == "static":
        from alphazero_tpu.models.quant import (
            calibrate,
            make_quant_evaluator,
            quantize_network,
        )

        cal = [jnp.zeros((256, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)]
        return make_quant_evaluator(
            net, variables,
            act_scales=calibrate(quantize_network(net, variables), cal))
    return make_net_evaluator(net, variables, dtype=jnp.float32)


def warm_move(cfg: Config, games: int, sims: int, tag: str,
              quant: str = "0") -> None:
    net, variables = init_network(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    eval_fn = _bench_evaluator(net, variables, quant)
    spec = SearchSpec(
        num_simulations=sims,
        c_puct=cfg.c_puct,
        fpu_reduction=cfg.fpu_reduction,
        dirichlet_alpha=cfg.dirichlet_alpha,
        dirichlet_epsilon=cfg.dirichlet_epsilon,
        value_dtype=jnp.dtype(cfg.value_dtype),
    )
    states = initial_state((games,))
    t0 = time.time()
    *_, actions, _ = selfplay_move(states, jax.random.PRNGKey(1), eval_fn,
                                   spec, cfg.temperature_threshold)
    np.asarray(actions)
    print(f"{tag}: {games}x{sims} compile+first move "
          f"{time.time() - t0:.1f}s", flush=True)


def main() -> None:
    games = int(os.environ.get("AZTPU_BENCH_GAMES", "512"))
    sims = int(os.environ.get("AZTPU_BENCH_SIMS", "800"))
    vdt = os.environ.get("AZTPU_BENCH_VALUE_DTYPE", "float32")
    cfg = Config(num_simulations=sims, value_dtype=vdt)
    print(f"device: {jax.devices()[0]}", flush=True)
    quant = os.environ.get("AZTPU_BENCH_QUANT", "static")
    warm_move(cfg, games, sims, f"bench move (quant={quant})", quant=quant)

    if os.environ.get("AZTPU_WARM_TRAIN", "0") == "1":
        tcfg = Config(value_dtype=vdt)
        if (tcfg.parallel_games, tcfg.num_simulations) != (games, sims):
            warm_move(tcfg, tcfg.parallel_games, tcfg.num_simulations,
                      "train move")
        from alphazero_tpu.train.learner import (
            create_train_state, train_step,
        )

        net, variables = init_network(tcfg, jax.random.PRNGKey(0))
        state = create_train_state(tcfg, net, variables)
        batch = (
            jnp.zeros((tcfg.batch_size, 3, 8, 8), jnp.float32),
            jnp.zeros((tcfg.batch_size, tcfg.num_actions), jnp.float32),
            jnp.zeros((tcfg.batch_size, 2), jnp.float32),
        )
        bits = jnp.zeros((tcfg.batch_size,), bool)
        t0 = time.time()
        state, metrics = train_step(state, batch, bits, net, tcfg)
        np.asarray(metrics["loss"])
        print(f"learn step: compile+first batch {time.time() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
