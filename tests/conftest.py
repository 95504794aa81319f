"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is exercised on a virtual CPU mesh (the JAX-native
analogue of the reference's single-device test strategy, SURVEY.md §4);
the real TPU is reserved for bench.py.
"""

import os

# Force CPU unconditionally. Env vars are NOT enough here: the driver
# image's sitecustomize registers the axon TPU plugin (and imports jax) at
# interpreter startup, before conftest runs — so JAX_PLATFORMS set in this
# file is ignored. jax.config.update works as long as no backend has been
# *initialized* yet, which sitecustomize's register() does not do.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils import enable_compilation_cache

enable_compilation_cache()

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "src"))
