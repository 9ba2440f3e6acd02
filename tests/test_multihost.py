"""Multi-host correctness: a 2-process CPU run (jax.distributed over a
localhost coordinator) must produce the identical loss trajectory to a
1-process run of the same global computation.

Covers the production multi-host input path (host_local_slice +
make_global_batch), replicated-state placement, host-side metric
gathering, and barriers -- the plumbing the reference gets from
Accelerate/NCCL (SURVEY.md section 2.2)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(num_processes, out, timeout=600):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--num_processes", str(num_processes),
             "--process_id", str(i), "--port", str(port), "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(num_processes)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=timeout)
        outputs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, \
            f"worker failed (rc={p.returncode}):\n{outputs[-1][-3000:]}"
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    single = _run(1, str(tmp_path / "single.json"))
    double = _run(2, str(tmp_path / "double.json"))

    assert single["num_devices"] == 2
    assert double["num_devices"] == 4  # 2 procs x 2 virtual devices
    assert double["gathered_rows"] == 2
    # replicated metrics agree across the two processes
    assert double["gathered_loss_spread"] == 0.0
    # Loss trajectories: the same global batch on meshes of different
    # device counts -- identical computation, tiny reduction-order slack.
    np.testing.assert_allclose(single["losses"], double["losses"],
                               rtol=1e-5)
