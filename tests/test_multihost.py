"""Multi-process (simulated multi-host) validation: two processes x 4
virtual CPU devices form one 8-device global mesh via jax.distributed —
the same plumbing train.py --multihost uses on a real multi-host slice."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_tp_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/multihost_worker.py"),
             str(pid), str(port), "2"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHLOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    # the loss is a global scalar: both processes must agree exactly
    assert losses[0] == losses[1], losses
