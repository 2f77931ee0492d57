"""2-process jax.distributed test (VERDICT item 7): the multi-host init +
dp/fp-sharded solver path, exercised for real across two OS processes with
gloo cross-process collectives — the runnable stand-in for a 2-host TPU pod
(same jax.distributed + global-mesh machinery, DCN replaced by localhost).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).with_name("_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(fp_mode: str, timeout: float = 300.0):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(_WORKER.parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), str(port), fp_mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "WORKER_OK" in out, out[-4000:]
    return outs


@pytest.mark.parametrize("fp_mode", ["local", "cross"])
def test_two_process_sharded_solve(fp_mode):
    """Both processes converge to the single-device answer; in `cross` mode
    every normal-equation psum crosses the process boundary."""
    _run_pair(fp_mode)
