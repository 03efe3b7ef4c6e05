"""Multi-host (DCN) execution: 2 JAX processes x 4 CPU devices connected
through the coordination service with gloo cross-process collectives —
the CPU stand-in for a multi-host TPU pod (ICI within a process, DCN
between).  The flagship runs sharded over a mesh spanning both processes
via the GSPMD and halo+fused-kernel paths; each worker asserts both match
the replicated evaluation (tests/dcn_worker.py)."""

import os
import socket
import subprocess
import sys

NPROC = 2
WORKER = os.path.join(os.path.dirname(__file__), "dcn_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_cpu():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(NPROC), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(WORKER),
        )
        for i in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        assert "DCN_OK" in out, out[-4000:]
