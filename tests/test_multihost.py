"""Multi-host simulation: 2 jax.distributed processes × 4 virtual CPU
devices each, solving the slab-sharded lattice PCG across the process
boundary (the SURVEY §4 end-note requirement — "multi-node without a real
cluster").  The agglomeration all_gather and halo ppermutes cross the
simulated DCN seam between the two processes.

Skips (loudly) when this jaxlib has no cross-process CPU collectives.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.multichip, pytest.mark.multihost]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_solve():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1100)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    joined = "\n----\n".join(outs)
    if any(code != 0 for code in (p.returncode for p in procs)):
        low = joined.lower()
        if "collectives" in low or "gloo" in low or "not implemented" in low:
            pytest.skip(f"no cross-process CPU collectives in this jaxlib:\n{joined[-2000:]}")
        raise AssertionError(f"multihost workers failed:\n{joined[-4000:]}")
    assert outs[0].count("MULTIHOST_OK") == 1, joined[-2000:]
    assert outs[1].count("MULTIHOST_OK") == 1, joined[-2000:]
