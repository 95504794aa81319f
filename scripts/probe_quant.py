"""TPU probe: int8 inference (models/quant.py) vs the bf16 tower.

The search is ~82% network-bound and the bf16 conv tower sits at ~50% of
the v5e bf16 MXU roofline (docs/batch-scaling.md); the v5e MXU runs
s8 x s8 -> s32 at 2x the bf16 rate, so the int8 tower's ceiling is ~2x.
This probe measures what that buys end-to-end and what it costs in
search quality, on a real trained checkpoint:

1. eval-only ms/eval: bf16 apply vs int8 quant_apply at the bench batch;
2. full-search sims/s: selfplay_move with each evaluator;
3. quality: noiseless 800-sim search visit distributions, int8 vs f32
   evaluator — TV + argmax agreement (same protocol as
   scripts/probe_value_dtype.py, so numbers are comparable).

Usage:
    python scripts/probe_quant.py [checkpoint_dir] [games] [sims]
    (default checkpoint: /root/run_r3/checkpoints/model_best;
     no checkpoint -> random-init weights, quality arm still meaningful
     as a relative TV but not as strength evidence)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

# AZTPU_CPU=1: CPU smoke mode. The env-var pin alone is NOT enough in this
# image (sitecustomize registers the TPU plugin at startup); the config
# update is what actually works (CLAUDE.md environment rules).
if os.environ.get("AZTPU_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.env import initial_state
from alphazero_tpu.models import init_network
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.models.quant import make_quant_evaluator, quant_apply, \
    quantize_network
from alphazero_tpu.search import SearchSpec, make_net_evaluator, search
from alphazero_tpu.search.mcts import root_child_visits
from alphazero_tpu.train.selfplay import selfplay_move

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/run_r3/checkpoints/model_best"
GAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SIMS = int(sys.argv[3]) if len(sys.argv) > 3 else 800

# CPU smoke: AZTPU_PROBE_BLOCKS/FILTERS shrink the net so the script can
# be driven end-to-end without a 20x128 compile (quality numbers are then
# meaningless; on-chip runs use the defaults).
# AZTPU_SCAN=1: scanned tower -> ~14x faster cold compiles; relative
# int8-vs-bf16 deltas carry over (same pattern as probe_value_dtype.py).
SCAN = os.environ.get("AZTPU_SCAN", "0") == "1"
cfg = Config(num_simulations=SIMS, scan_blocks=SCAN,
             num_blocks=int(os.environ.get("AZTPU_PROBE_BLOCKS", "20")),
             num_filters=int(os.environ.get("AZTPU_PROBE_FILTERS", "128")))
if os.path.isdir(CKPT):
    from alphazero_tpu.arena.runner import load_model_variables
    net, variables = load_model_variables(
        cfg.replace(checkpoint_dir=os.path.dirname(CKPT)), CKPT)
    if SCAN and not net.scan_blocks:
        from alphazero_tpu.models.network import stack_tower
        variables = stack_tower(variables, net.num_blocks)
        net = net.clone(scan_blocks=True)
    print(f"checkpoint: {CKPT} (scan_blocks={net.scan_blocks})", flush=True)
else:
    net, variables = init_network(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    print("checkpoint not found -> random init (relative numbers only)",
          flush=True)

eval_bf16 = make_net_evaluator(net, variables, dtype=jnp.float32)
eval_int8 = make_quant_evaluator(net, variables)

# int8-static arm: activation scales calibrated once (replay buffer if
# available, else opening positions) — removes the per-layer dynamic amax
# reduction from the compiled forward (see quant.calibrate).
from alphazero_tpu.models.quant import calibrate, quantize_network as _qn

_npz = os.path.join(os.path.dirname(CKPT), "training_data.npz")
if os.path.exists(_npz):
    _d = np.load(_npz, mmap_mode="r")
    _ci = np.random.RandomState(42).choice(len(_d["states"]), 512,
                                           replace=False)
    _cal = [jnp.asarray(np.asarray(_d["states"][np.sort(_ci)][i * 256:
                                                             (i + 1) * 256]),
                        jnp.float32) for i in range(2)]
else:
    _cal = [jnp.zeros((256, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)]
_scales = calibrate(_qn(net, variables), _cal)
eval_int8s = make_quant_evaluator(net, variables, act_scales=_scales)


def spec_for(eps):
    return SearchSpec(num_simulations=SIMS, c_puct=cfg.c_puct,
                      fpu_reduction=cfg.fpu_reduction,
                      dirichlet_alpha=cfg.dirichlet_alpha,
                      dirichlet_epsilon=eps)


# --- eval-only cost --------------------------------------------------------
planes = jnp.zeros((GAMES, 3, 8, 8), jnp.float32).at[:, 2].set(1.0)
qp = quantize_network(net, variables)
apply_bf16 = jax.jit(lambda x: policy_value_apply(net, variables, x))
apply_int8 = jax.jit(lambda x: quant_apply(qp, x))
apply_int8s = jax.jit(lambda x: quant_apply(qp, x, act_scales=_scales))
for name, fn in [("bf16", apply_bf16), ("int8", apply_int8),
                 ("int8-static", apply_int8s)]:
    t0 = time.time()
    np.asarray(fn(planes)[0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(30):
        t0 = time.time()
        np.asarray(fn(planes)[0])
        best = min(best, time.time() - t0)
    print(f"eval {name}: {1e3 * best:.3f} ms/eval at B={GAMES} "
          f"(compile {compile_s:.0f}s)", flush=True)

# --- fixed mid-game positions (bf16-evaluator search, deterministic) -------
states = initial_state((GAMES,))
rng = jax.random.PRNGKey(7)
for _ in range(8):
    rng, k = jax.random.split(rng)
    states, *_ = selfplay_move(states, k, eval_bf16, spec_for(
        cfg.dirichlet_epsilon), cfg.temperature_threshold)
np.asarray(states.turn)
print(f"positions ready: {GAMES} games, 8 plies in", flush=True)

# --- quality: noiseless search, int8 vs bf16 evaluator ---------------------
visits = {}
for name, ev in [("bf16", eval_bf16), ("int8", eval_int8)]:
    visits[name] = np.asarray(jax.jit(lambda s, e=ev: root_child_visits(
        search(s, e, spec_for(0.0))))(states), np.int64)
p = {k: v / np.maximum(v.sum(-1, keepdims=True), 1)
     for k, v in visits.items()}
tv = 0.5 * np.abs(p["int8"] - p["bf16"]).sum(-1)
agree = (p["int8"].argmax(-1) == p["bf16"].argmax(-1)).mean()
print(f"int8 vs bf16 search: mean TV {tv.mean():.4f} "
      f"(p95 {np.percentile(tv, 95):.4f}), "
      f"argmax agreement {100 * agree:.1f}%", flush=True)

# --- perf: full selfplay move ----------------------------------------------
# AZTPU_PROBE_ARMS limits which evaluators get the expensive search
# compile (each arm is its own XLA program, ~950s cold inlined).
ALL_ARMS = {"bf16": eval_bf16, "int8": eval_int8, "int8-static": eval_int8s}
ARMS = os.environ.get("AZTPU_PROBE_ARMS", "bf16,int8").split(",")
for name, ev in [(a, ALL_ARMS[a]) for a in ARMS]:
    spec = spec_for(cfg.dirichlet_epsilon)
    cur, r2 = states, jax.random.PRNGKey(11)
    t0 = time.time()
    cur, *_, actions, _ = selfplay_move(cur, r2, ev, spec,
                                        cfg.temperature_threshold)
    np.asarray(actions)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(4):
        r2, k = jax.random.split(r2)
        t0 = time.time()
        cur, *_, actions, _ = selfplay_move(cur, k, ev, spec,
                                            cfg.temperature_threshold)
        np.asarray(actions)
        best = min(best, time.time() - t0)
    print(f"search {name}: {GAMES * SIMS / best:,.0f} sims/s "
          f"(compile {compile_s:.0f}s)", flush=True)
