"""Runtime setup helpers: persistent XLA compilation cache, logging."""

from __future__ import annotations

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


def setup_logging(level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger("alphazero_tpu")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger
