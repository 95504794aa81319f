"""CLI: train | web | arena (reference surface, /root/reference/main.py).

  python main.py train            # restartable self-play training loop
  python main.py arena            # continuous ELO matchmaking daemon
  python main.py web              # human-vs-bot web UI + JSON API

Common overrides: --blocks/--filters/--sims/--games plus paths; run
`python main.py <cmd> -h` for all flags.
"""

import argparse
import os


def add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--blocks", type=int, default=None)
    p.add_argument("--filters", type=int, default=None)
    p.add_argument("--sims", type=int, default=None)
    p.add_argument("--games", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on NaN/Inf inside jitted code")
    p.add_argument("--profile", nargs="?", const="/tmp/aztpu_profile",
                   default=None, metavar="DIR",
                   help="capture one device trace per phase (selfplay, "
                        "learn) into DIR for TensorBoard/XProf")
    p.add_argument("--scan-blocks", action="store_true",
                   help="compile the residual tower as one scanned block "
                        "(14x faster cold compile, ~6%% slower search; "
                        "see docs/compile-latency.md)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the JAX multi-host runtime")
    p.add_argument("--value-dtype", default=None,
                   choices=["float32", "float16"],
                   help="dtype of the search tree rows. float16 is "
                        "CPU-only (numerics tests): Mosaic cannot compile "
                        "f16 kernel operands and 16-bit trees measured no "
                        "win on chip — see docs/value-dtype-closure.md")
    p.add_argument("--selfplay-quant", default=None,
                   choices=["off", "dynamic", "static"],
                   help="int8-quantize the SELF-PLAY evaluator (static = "
                        "calibrated activation scales, measured +56%% "
                        "sims/s on chip — docs/quant-int8.md). Training "
                        "math is unchanged; adopt only with a passed "
                        "strength gate (scripts/eval_quant_match.py)")
    p.add_argument("--host-replay", action="store_true",
                   help="disable the device-resident learn path "
                        "(learner.train_epoch) and stream batches from "
                        "host per step (config.py: device_replay)")
    p.add_argument("--seed", type=int, default=0)


def build_config(args):
    from alphazero_tpu.config import Config

    cfg = Config(checkpoint_dir=args.checkpoint_dir)
    over = {}
    if args.blocks is not None:
        over["num_blocks"] = args.blocks
    if args.filters is not None:
        over["num_filters"] = args.filters
    if args.sims is not None:
        over["num_simulations"] = args.sims
        over["num_simulations_inference"] = max(1, args.sims // 2)
    if args.games is not None:
        over["parallel_games"] = args.games
    if getattr(args, "selfplay_batches", None) is not None:
        over["selfplay_batches"] = args.selfplay_batches
    if getattr(args, "buffer", None) is not None:
        over["buffer_size"] = args.buffer
    if args.scan_blocks:
        over["scan_blocks"] = True
    if args.value_dtype is not None:
        over["value_dtype"] = args.value_dtype
    if args.host_replay:
        over["device_replay"] = False
    if getattr(args, "selfplay_quant", None) is not None:
        over["selfplay_quant"] = args.selfplay_quant
    return cfg.replace(**over) if over else cfg


def main() -> None:
    parser = argparse.ArgumentParser(description="AlphaZero on TPU (JAX)")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="run the training loop")
    add_common(p_train)
    p_train.add_argument("--iterations", type=int, default=None,
                         help="stop after N iterations (default: forever)")
    p_train.add_argument("--selfplay-batches", type=int, default=None,
                         help="self-play rounds per iteration (games/iter = "
                              "batches x games; reference: 8 x 128)")
    p_train.add_argument("--buffer", type=int, default=None,
                         help="replay buffer capacity (reference: 300000)")

    p_arena = sub.add_parser("arena", help="continuous ELO matchmaking")
    add_common(p_arena)
    p_arena.add_argument("--rounds", type=int, default=None)

    p_web = sub.add_parser("web", help="web UI / JSON API server")
    add_common(p_web)
    p_web.add_argument("--host", default="0.0.0.0")
    p_web.add_argument("--port", type=int, default=5051)

    args = parser.parse_args()
    if args.cpu:
        # Env vars alone are ignored here: the image's sitecustomize
        # registers the TPU plugin at interpreter startup, so the platform
        # must be pinned programmatically before any backend use (same fix
        # as tests/conftest.py and __graft_entry__.dryrun_multichip).
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", (
            f"--cpu requested but backend is {jax.default_backend()}")

    from alphazero_tpu.utils import (
        enable_compilation_cache,
        enable_debug_checks,
        init_distributed,
        setup_logging,
    )

    enable_compilation_cache()
    log = setup_logging()
    if args.debug_nans:
        enable_debug_checks()
    if args.distributed:
        proc = init_distributed()
        log.info("multi-host runtime: process %d", proc)
    cfg = build_config(args)

    if args.command == "train":
        import jax

        from alphazero_tpu.models.network import count_params
        from alphazero_tpu.train import Trainer

        trainer = Trainer(cfg, seed=args.seed)
        trainer.profile_dir = args.profile
        log.info("model: %d blocks x %d filters, %s params on %s",
                 cfg.num_blocks, cfg.num_filters,
                 f"{count_params(trainer._variables()):,}", jax.devices()[0])
        trainer.train_forever(max_iterations=args.iterations)
    elif args.command == "arena":
        from alphazero_tpu.arena import run_arena

        run_arena(cfg, max_rounds=args.rounds, seed=args.seed)
    elif args.command == "web":
        from alphazero_tpu.web.server import serve

        serve(cfg, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
