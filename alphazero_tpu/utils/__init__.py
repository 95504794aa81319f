from alphazero_tpu.utils.runtime import enable_compilation_cache, setup_logging

__all__ = ["enable_compilation_cache", "setup_logging"]
