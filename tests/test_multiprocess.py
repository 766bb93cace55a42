"""Two-process simulated multi-host: jax.distributed.initialize over
localhost TCP (the DCN stand-in), 4 virtual CPU devices per process, one
global (data=2, model=4) mesh spanning both — the only way this single-chip
environment can exercise the multi-process init + cross-process collective
path (parallel/mesh.init_distributed) the north star's 2-host target uses.

The heavy lifting happens in tests/multiprocess_worker.py (one subprocess
per simulated host); this test launches both, waits, and asserts each
validated its logit shards against the single-chip reference.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multiprocess_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_tp_decode_matches_single_chip():
    port = _free_port()
    env = dict(os.environ)
    # each worker sets its own XLA_FLAGS / platform; scrub the parent's
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n{out}"
        assert f"MULTIPROCESS_OK pid={pid}" in out, f"worker {pid}:\n{out}"
