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


def _run_workers(nproc: int):
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/multihost_worker.py"),
             str(pid), str(port), str(nproc)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses, slices = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHLOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
            elif line.startswith("MHSLICE"):
                tag, pid, rest = line.split(maxsplit=2)
                slices[int(pid)] = rest
    assert set(losses) == set(range(nproc)), outs
    return losses, slices


@pytest.mark.slow
def test_two_process_sharded_input_matches_single_process():
    """Two processes each assemble ONLY their half of every global batch
    (per-process sharded EpochBatcher + make_array_from_process_local_data);
    the global loss must agree across processes AND match a single-process
    run that assembled the identical global batch in one piece."""
    losses2, slices2 = _run_workers(2)
    # the loss is a global scalar: both processes must agree exactly
    assert losses2[0] == losses2[1], losses2
    # processes really built DIFFERENT local shards
    assert slices2[0] != slices2[1], slices2

    losses1, slices1 = _run_workers(1)
    # slice-assembled global batch == full assembly: same loss
    assert abs(losses1[0] - losses2[0]) < 1e-6, (losses1, losses2)
