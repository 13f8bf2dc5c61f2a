"""2-process jax.distributed smoke test (SURVEY.md §5 comm backend;
VERDICT round-1 item 5): the sharded engine's collectives must work across
real process boundaries, not just the in-process virtual mesh. Spawns two
worker processes that initialize the distributed runtime over localhost,
run a sharded push on a 2x1 mesh, and each check their own shard."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:  # noqa: D103
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_push():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # workers build their own 1-device-per-process view
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"mp-worker {pid}: ok" in out, out
