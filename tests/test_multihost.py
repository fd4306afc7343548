"""Two-REAL-process multi-host test of the comm layer.

The reference's distributed surface (``lib/utils/comm.py``,
``lib/utils/utils.py:61-73``) runs one torch.distributed process per
GPU; our equivalents were previously covered only single-process (every
helper short-circuits at world_size==1). This launches two actual JAX
processes over a localhost coordinator (2 CPU devices each — a 4-device
global platform) and exercises rank bookkeeping, barriers, object/array
gathers (including UNEQUAL per-process shapes — the eval-stripe case),
metric reduction, and a cross-process jit collective."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_comm():
    port = _free_port()
    n = 2
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu after import
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), str(n), str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"CHECK rank={i} ok" in out
