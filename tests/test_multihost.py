"""Multi-host correctness: two coordinated JAX processes on localhost, 4
virtual CPU devices each — validates jax.distributed initialization, global
meshes spanning processes, cross-process psum/pmax, and the row-sharded
tensor-parallel ADMM whose constraint shards live on different hosts (the
DCN path of SURVEY §2.6; nothing analogous exists in the reference)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).parent / "multihost_worker.py"
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(NPROC), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(ROOT))
        for i in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "WORKER_DONE" in out

    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("RESULT psum"):
                _, _, got, want = line.split()
                assert abs(float(got) - float(want)) < 1e-5, line
            if line.startswith("RESULT tp_solve"):
                parts = dict(kv.split("=") for kv in line.split()[2:])
                assert int(parts["status"]) in (1, 2), line
                assert float(parts["xerr"]) < 5e-3, line
