"""True multi-process (multi-controller) validation on CPU.

Two separate JAX processes (2 local virtual devices each) form a 4-device
cluster via ``jax.distributed.initialize`` with gloo CPU collectives --
the closest an unnetworked single host gets to a multi-host pod. The
worker (tests/_mp_worker.py) runs the production sharded pallas step over
a process-spanning (tile=2, splat=2) mesh (cross-process psum/all_gather/
ppermute), checks it against the single-device fused step, and round-trips
the process-spanning sharded state through the orbax checkpointer.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("combine", ["fold", "scan"])
def test_two_process_sharded_step(tmp_path, combine):
    """fold = all_gather prefix; scan = log-depth ppermute ring -- both
    cross PROCESS boundaries here."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path / "ck"),
         combine],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "MP_WORKER_OK" in out, out[-4000:]
    # Both controllers computed the same loss.
    m0 = outs[0].split("mse=")[1].split()[0]
    m1 = outs[1].split("mse=")[1].split()[0]
    assert m0 == m1
