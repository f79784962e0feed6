"""Multi-process (multi-host) execution test: 2 real OS processes, each
with 4 virtual CPU devices, form ONE global 8-device mesh via
jax.distributed and run a full sharded train epoch (env lanes sharded over
'data' across the process boundary, params replicated).

This is the process-boundary evidence the virtual-mesh sharding tests can't
provide: cross-host collectives, global array construction from host-local
data, and rank-0-only checkpoint/logging (replacing the reference's dead
MPI bcast/gather scaffold, train/policy/multi_ppo.py:162-164, 179-181,
320-325).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_epoch(tmp_path, reference_worlds_available):
    if not reference_worlds_available:
        pytest.skip("reference world fixtures not present")

    port = _free_port()
    nproc = 2
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
        env.update({
            "RVO3D_COORDINATOR": f"127.0.0.1:{port}",
            "RVO3D_NUM_PROCESSES": str(nproc),
            "RVO3D_PROCESS_ID": str(rank),
            # keep each process's XLA host-device count independent
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        ))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK rank={rank} nproc=2 devices=8" in out, out[-2000:]

    # the 'data'-sharded global mean must agree across ranks: lanes hold
    # rank+1 per process -> mean 1.5
    for out in outs:
        assert "gmean=1.5" in out, out[-2000:]

    # rank-0-only artifacts, exactly once
    assert os.path.isdir(tmp_path / "ckpt")
    lines = (tmp_path / "train.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1 and '"rank": 0' in lines[0]
