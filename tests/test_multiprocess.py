"""Two-process jax.distributed smoke (VERDICT r1 item 10): initialize + the
host-aware mesh ordering assumption in multihost.make_host_mesh, driving one
cross-process render_hits_ring step on CPU.

Each worker subprocess gets 4 virtual CPU devices; the pair forms a
(dp=2 processes, tp=4 local) mesh — tp rows must stay within one process
(the chatty ppermute axis on the "fast interconnect").  Skips if the
environment cannot run multi-process CPU collectives (worker exit 42).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_ring_step():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out")
    codes = [p.returncode for p in procs]
    if 42 in codes:
        pytest.skip(f"multi-process CPU unavailable: {outs}")
    assert codes == [0, 0], f"worker failures: rc={codes}\n{outs[0]}\n{outs[1]}"
    assert "ring step exact over 2 processes" in outs[0] + outs[1]
