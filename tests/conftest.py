"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is exercised on a virtual CPU mesh (the JAX-native
analogue of the reference's single-device test strategy, SURVEY.md §4);
the real TPU is reserved for bench.py.
"""

import os

# Force CPU unconditionally: the driver shell exports JAX_PLATFORMS=axon
# (the TPU tunnel), so setdefault would leave tests on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))
