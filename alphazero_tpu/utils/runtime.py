"""Runtime setup helpers: compilation cache, logging, profiling, debug
modes, and multi-host initialization (SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import logging
import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    First compiles are slow (especially on TPU, ~20-40s); the on-disk cache
    makes every later process start fast. Must be called before the first
    compilation. The env var is not honored by this JAX version, so we set
    the config programmatically.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "AZTPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def enable_debug_checks() -> None:
    """Development mode: raise on NaNs/Infs produced inside jitted code.

    The reference has no sanitizers (single-threaded Python); the JAX-native
    analogue is nan-debugging on the functional compute path.
    """
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/aztpu_profile"):
    """``with profile_trace(): ...`` captures a device trace viewable in
    TensorBoard/XProf; used around self-play or learner phases."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def is_coordinator() -> bool:
    """True on the process that owns filesystem writes.

    Multi-host write contract: checkpoints, the training-data npz, metrics
    JSONL, and arena state JSON are written by process 0 ONLY — every host
    computes identical replicated state, so host 0's copy is the one copy.
    The reference is single-process and never needed this (SURVEY.md §5
    distributed-backend obligation). Single-process runs always return True.
    """
    import jax

    return jax.process_index() == 0


def init_distributed() -> int:
    """Initialize the JAX multi-host runtime (must run before any backend
    use — do not query devices/process_count first). JAX auto-detects the
    coordinator/process env on TPU pods. Returns the process index.
    Collectives then ride ICI within a slice and DCN across hosts; each
    host feeds its local shard of the game batch (SURVEY.md §5)."""
    import jax

    jax.distributed.initialize()
    return jax.process_index()


def setup_logging(level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger("alphazero_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger
