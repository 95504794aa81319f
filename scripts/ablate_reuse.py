"""Tree-reuse ablation: does between-move reuse improve the training
signal at equal per-move simulation budget? (VERDICT round-1 #3)

Protocol: drive one self-play trajectory with reuse ON (the reference's
protocol, parallel_trainer.py:194-198) and record every position. Then at
every recorded position compare three searches against a GROUND-TRUTH
search (fresh root, GT_MULT x the simulation budget):

  - reuse:  the reused-tree search that actually produced the move
  - fresh:  a fresh-root search at the same budget
  - ground: fresh root at GT_MULT x budget (the target distribution)

Metrics per move: total-variation distance of the visit distribution to
ground truth, and argmax (chosen-move) agreement with ground truth. Noise
is OFF for all searches (exploration noise confounds target quality).

Also times 50 lockstep moves with and without reuse (advance_root
overhead). Run on the TPU: PYTHONPATH=/root/repo python scripts/ablate_reuse.py
Env knobs: ABL_GAMES (256), ABL_SIMS (400), ABL_MOVES (24), ABL_GT_MULT (8),
ABL_BLOCKS/ABL_FILTERS (flagship 20/128), ABL_CPU=1 for a CPU smoke run.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ABL_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import breakthrough as env
from alphazero_tpu.models import init_network
from alphazero_tpu.search import (
    SearchSpec,
    advance_root,
    init_tree,
    make_net_evaluator,
    root_child_visits,
    search,
)

GAMES = int(os.environ.get("ABL_GAMES", "256"))
SIMS = int(os.environ.get("ABL_SIMS", "400"))
MOVES = int(os.environ.get("ABL_MOVES", "24"))
GT_MULT = int(os.environ.get("ABL_GT_MULT", "8"))
BLOCKS = int(os.environ.get("ABL_BLOCKS", "20"))
FILTERS = int(os.environ.get("ABL_FILTERS", "128"))


def dist(visits):
    v = visits.astype(np.float64)
    tot = v.sum(-1, keepdims=True)
    return np.where(tot > 0, v / np.maximum(tot, 1), 0)


def main():
    cfg = Config(num_blocks=BLOCKS, num_filters=FILTERS)
    net, variables = init_network(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    eval_fn = make_net_evaluator(net, variables, dtype=jnp.float32)

    spec_r = SearchSpec(num_simulations=SIMS, tree_reuse=True)
    spec_f = SearchSpec(num_simulations=SIMS)
    spec_g = SearchSpec(num_simulations=SIMS * GT_MULT)
    # equal-cost comparison arm: fresh search with a larger budget (e.g.
    # +25% sims costs +25% while reuse currently costs ~+100%/move)
    SIMS2 = int(os.environ.get("ABL_FRESH_SIMS2", "0"))
    spec_f2 = SearchSpec(num_simulations=SIMS2) if SIMS2 else None

    js = {k: jax.jit(functools.partial(search, eval_fn=eval_fn, spec=s))
          for k, s in (("r", spec_r), ("f", spec_f), ("g", spec_g))}
    if spec_f2:
        js["f2"] = jax.jit(functools.partial(search, eval_fn=eval_fn,
                                             spec=spec_f2))
    jadv = jax.jit(functools.partial(advance_root, spec=spec_r))
    jstep = jax.jit(env.step)

    # --- quality: one reuse trajectory, compared per position -------------
    states = env.initial_state((GAMES,))
    tree = init_tree(states, spec_r)
    tv_r, tv_f, agree_r, agree_f = [], [], [], []
    tv_f2, agree_f2 = [], []
    for mv in range(MOVES):
        tree = js["r"](states, tree=tree)
        vis_r = np.asarray(root_child_visits(tree))
        vis_f = np.asarray(root_child_visits(js["f"](states)))
        vis_g = np.asarray(root_child_visits(js["g"](states)))
        live = ~np.asarray(states.done)
        dr, df, dg = dist(vis_r), dist(vis_f), dist(vis_g)
        tv_r.append(0.5 * np.abs(dr - dg).sum(-1)[live].mean())
        tv_f.append(0.5 * np.abs(df - dg).sum(-1)[live].mean())
        agree_r.append((dr.argmax(-1) == dg.argmax(-1))[live].mean())
        agree_f.append((df.argmax(-1) == dg.argmax(-1))[live].mean())
        if spec_f2:
            df2 = dist(np.asarray(root_child_visits(js["f2"](states))))
            tv_f2.append(0.5 * np.abs(df2 - dg).sum(-1)[live].mean())
            agree_f2.append((df2.argmax(-1) == dg.argmax(-1))[live].mean())
        # advance along the ground-truth-ish greedy move of the REUSE search
        actions = jnp.asarray(vis_r.argmax(-1), jnp.int32)
        states = jstep(states, actions)
        tree = jadv(tree, actions, states)
        print(f"move {mv:2d}: TV(reuse)={tv_r[-1]:.4f} "
              f"TV(fresh)={tv_f[-1]:.4f} "
              f"agree(reuse)={agree_r[-1]:.3f} agree(fresh)={agree_f[-1]:.3f}",
              flush=True)

    print("\n=== quality vs ground truth "
          f"({SIMS} sims vs {SIMS * GT_MULT}-sim fresh) ===")
    print(f"mean TV  : reuse {np.mean(tv_r):.4f}  fresh {np.mean(tv_f):.4f}")
    print(f"mean agree: reuse {np.mean(agree_r):.3f}  "
          f"fresh {np.mean(agree_f):.3f}")
    if spec_f2:
        print(f"fresh@{SIMS2}: TV {np.mean(tv_f2):.4f}  "
              f"agree {np.mean(agree_f2):.3f}")

    # --- throughput: 50 lockstep moves each ------------------------------
    from alphazero_tpu.train.selfplay import (
        selfplay_move,
        selfplay_move_tree,
    )

    def time_moves(reuse: bool, n=50):
        st = env.initial_state((GAMES,))
        tr = init_tree(st, spec_r) if reuse else None
        rng = jax.random.PRNGKey(9)
        # warm-up move compiles
        rng, k = jax.random.split(rng)
        if reuse:
            out = selfplay_move_tree(st, tr, k, eval_fn, spec_r,
                                     cfg.temperature_threshold)
            st, tr = out[0], out[5]
        else:
            st = selfplay_move(st, k, eval_fn, spec_f,
                               cfg.temperature_threshold)[0]
        np.asarray(st.turn)
        t0 = time.time()
        for _ in range(n):
            rng, k = jax.random.split(rng)
            if reuse:
                out = selfplay_move_tree(st, tr, k, eval_fn, spec_r,
                                         cfg.temperature_threshold)
                st, tr = out[0], out[5]
            else:
                st = selfplay_move(st, k, eval_fn, spec_f,
                                   cfg.temperature_threshold)[0]
        np.asarray(st.turn)
        return (time.time() - t0) / n

    t_fresh = time_moves(False)
    t_reuse = time_moves(True)
    print(f"\n=== throughput ({GAMES} games x {SIMS} sims/move) ===")
    print(f"fresh: {t_fresh * 1e3:.1f} ms/move "
          f"({GAMES * SIMS / t_fresh:,.0f} sims/s)")
    print(f"reuse: {t_reuse * 1e3:.1f} ms/move "
          f"({GAMES * SIMS / t_reuse:,.0f} sims/s, "
          f"{(t_reuse / t_fresh - 1) * 100:+.1f}% per-move cost)")


if __name__ == "__main__":
    main()
