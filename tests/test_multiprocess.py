"""Real 2-process jax.distributed trainer harness (VERDICT r2 item #1).

Spawns two OS processes, each a separate JAX "host" with 4 virtual CPU
devices (global mesh: 2 processes x 4 = 8 devices), connected through
jax.distributed.initialize + gloo CPU collectives. This is the only test
that actually executes the multi-host branches of the trainer —
make_array_from_process_local_data, broadcast_one_to_all step sync with
unequal buffers, coordinator-only writes, the post-save barrier, host-local
replay shards, and multi-host resume. All assertions live in
tests/multiprocess_worker.py; this file launches, babysits, and verifies
both workers' recorded results.

The reference is single-process (/root/reference/main.py:31) and never
needed any of this; SURVEY.md §5 names it as the TPU build's obligation.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
# Exact count of checks each worker records on a passing run (the whole
# point of this harness is that nothing multi-host regresses SILENTLY, so
# a vanished check must fail the test, not slip under a >= bound).
_EXPECTED_CHECKS = 19


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_trainer_lockstep(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multiprocess_worker.py"),
             str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out (deadlock?):\n"
                    + "\n".join(o or "" for o in outs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{outs[i]}")

    for i in range(2):
        with open(tmp_path / f"result_p{i}.json") as f:
            result = json.load(f)
        assert result["ok"], result
        failed = {k: v for k, v in result["checks"].items() if not v["ok"]}
        assert not failed, failed
        assert len(result["checks"]) == _EXPECTED_CHECKS, result["checks"]
