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


def _run(num_processes, out, timeout=600, extra_args=()):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--num_processes", str(num_processes),
             "--process_id", str(i), "--port", str(port), "--out", out,
             *extra_args],
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


@pytest.mark.slow
def test_two_process_inference_matches_single_process(tmp_path):
    """The INFERENCE plumbing (VERDICT r4 next-round #4): process-strided
    init times + per-init-timestamp-folded keys + local ens-mesh rollout
    + shared-dir artifacts + rank-sharded scoring merged through the real
    merge_rank_shards must give a 2-process run IDENTICAL artifacts and
    merged score table to a 1-process run (pred_rollout.py:217,
    evaluate_ens.py:256,311-325; reference: pred_rollout.py:349-414
    split_between_processes)."""
    import glob

    w1 = str(tmp_path / "w1")
    w2 = str(tmp_path / "w2")
    single = _run(1, str(tmp_path / "s.json"),
                  extra_args=("--mode", "infer", "--workdir", w1))
    double = _run(2, str(tmp_path / "d.json"),
                  extra_args=("--mode", "infer", "--workdir", w2))

    assert single["num_devices"] == 2 and double["num_devices"] == 4
    # merged score table: same init times, same scores (sorted by init)
    assert single["init_times"] == double["init_times"]
    np.testing.assert_allclose(single["scores"], double["scores"], rtol=0,
                               atol=0)
    # every latent artifact bitwise-identical: per-init keys fold the
    # init timestamp, and the per-process local mesh is the same size in
    # both runs, so the per-init program and its PRNG streams are too
    f1 = sorted(glob.glob(os.path.join(w1, "latent_*.npy")))
    f2 = sorted(glob.glob(os.path.join(w2, "latent_*.npy")))
    assert [os.path.basename(f) for f in f1] == \
        [os.path.basename(f) for f in f2] and len(f1) == 4
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(np.load(a), np.load(b),
                                      err_msg=os.path.basename(a))
