"""Multi-process (multi-host analog) execution of the distributed solver.

Spawns 2 JAX processes x 4 virtual CPU devices sharing one global
8-device mesh via jax.distributed — the CI stand-in for a 2-host TPU
slice (reference: MPI multi-rank runs, examples/amgx_mpi_capi.c:263-325;
per-rank upload + gather-to-rank-0 download, distributed_io.cu:182).
Each process runs the same SPMD program; entry/exit data movement goes
through distributed/multihost.py (device_put into cross-process
shardings, process_allgather on exit).
"""

import os
import socket
import subprocess
import sys

import pytest

_DRIVER = os.path.join(os.path.dirname(__file__), "multihost_driver.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_solve():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, _DRIVER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
    # both processes must report identical convergence (same SPMD program)
    line0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0]
    line1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0]
    assert line0.split("pid=0")[1] == line1.split("pid=1")[1]
