"""Import-order regression tests.

Round 1 shipped with a circular import (parallel/mesh.py -> train/__init__
-> trainer -> parallel/mesh) that only bit when ``alphazero_tpu.parallel``
was imported FIRST — exactly what the driver's ``dryrun_multichip`` gate
does — so the whole in-suite test run stayed green while the gate failed
(VERDICT.md weak #1). Import order is process-global state: once any test
imports ``alphazero_tpu.train``, an in-suite ``import alphazero_tpu.parallel``
can never reproduce the failure. These tests therefore spawn fresh
subprocesses per import order.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _import_in_subprocess(*modules: str) -> None:
    code = "; ".join(f"import {m}" for m in modules)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, (
        f"`{code}` failed (rc={proc.returncode}):\n{proc.stderr}")


def test_import_parallel_first():
    """The dryrun_multichip import order: parallel before train."""
    _import_in_subprocess("alphazero_tpu.parallel", "alphazero_tpu.train")


def test_import_train_first():
    """The order every round-1 test used (and which masked the cycle)."""
    _import_in_subprocess("alphazero_tpu.train", "alphazero_tpu.parallel")


def test_import_each_subpackage_standalone():
    """Every subpackage must import cleanly as the first package import."""
    for pkg in ("alphazero_tpu", "alphazero_tpu.parallel",
                "alphazero_tpu.train", "alphazero_tpu.search",
                "alphazero_tpu.models", "alphazero_tpu.env",
                "alphazero_tpu.arena", "alphazero_tpu.baseline",
                "alphazero_tpu.web", "alphazero_tpu.utils"):
        _import_in_subprocess(pkg)


def test_graft_entry_dryrun_multichip():
    """Run the driver's actual multi-chip gate end-to-end (8 virtual CPU
    devices). This is the command recorded in MULTICHIP_r{N}.json."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed (rc={proc.returncode}):\n"
        f"{proc.stderr[-4000:]}")
    assert "dryrun_multichip OK" in proc.stdout
