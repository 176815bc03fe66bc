"""True multi-process distributed test: 2 processes x 2 virtual CPU devices.

The virtual-mesh tests (test_ppo) validate sharding semantics in one
process; this spawns REAL separate processes connected through
jax.distributed (the DCN-path analogue on CPU) and runs the
parallel/distributed.py multi-host recipe end to end (SURVEY.md §2.4).
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # the worker is a script (sys.path[0] = tests/); make the package
    # importable without requiring an installed wheel
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (slow interpreter start)")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "DIST OK" in out, out[-2000:]
