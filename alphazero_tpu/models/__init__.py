from alphazero_tpu.models.network import (
    AlphaZeroNet,
    NetVariables,
    init_network,
    policy_value_apply,
    wl_to_value,
)

__all__ = [
    "AlphaZeroNet",
    "NetVariables",
    "init_network",
    "policy_value_apply",
    "wl_to_value",
]
