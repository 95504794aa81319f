from alphazero_tpu.utils.runtime import (
    enable_compilation_cache,
    enable_debug_checks,
    init_distributed,
    is_coordinator,
    profile_trace,
    setup_logging,
)

__all__ = [
    "enable_compilation_cache", "enable_debug_checks", "init_distributed",
    "is_coordinator",
    "profile_trace", "setup_logging",
]
