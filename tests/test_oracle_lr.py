"""LR-schedule parity vs the ACTUAL reference scheduler code.

Two reference paths exist:
  * train_AR.py:711 / train_encdec.py:453 call plain diffusers
    ``get_scheduler('cosine', ..., num_cycles=0.5)`` (configs set
    num_cycles 0.5 -> the standard 1->0 half-cosine);
  * the Ray trainer (train_new_encdec.py:93) calls the repo-local
    ``models/utils.py get_scheduler_with_min_lr`` (cosine-with-floor and
    polynomial branches).

The diffusers side is the shim's transcription of public diffusers
v0.32.1 optimization.py; ``get_scheduler_with_min_lr`` is the actual
reference file executed from /root/reference. Parity domain is
steps 0..num_training_steps: past the end the repo schedules pin at the
floor (matching get_scheduler_with_min_lr), while plain diffusers cosine
would oscillate back up -- out of contract, trainers never step past.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ladcast_tpu.train.optim import (  # noqa: E402
    cosine_with_min_lr,
    polynomial_with_min_lr,
)
from tests.oracles.refload import load_reference  # noqa: E402

torch = pytest.importorskip("torch")

BASE_LR = 1e-4
WARMUP = 7
TOTAL = 50


def _torch_lr_trace(sched_factory):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=BASE_LR)
    sched = sched_factory(opt)
    lrs = []
    for _ in range(TOTAL + 1):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


def test_cosine_min_lr_vs_reference():
    mutils = load_reference("ladcast.models.utils")
    ref = _torch_lr_trace(lambda opt: mutils.get_scheduler_with_min_lr(
        "cosine", opt, base_lr=BASE_LR, min_lr=1e-6,
        num_warmup_steps=WARMUP, num_training_steps=TOTAL))
    sched = cosine_with_min_lr(BASE_LR, 1e-6, WARMUP, TOTAL)
    ours = np.asarray([float(sched(s)) for s in range(TOTAL + 1)])
    # repo schedule evaluates in fp32 inside jit; reference is fp64
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_polynomial_min_lr_vs_reference():
    mutils = load_reference("ladcast.models.utils")
    for power in (1.0, 2.0):
        ref = _torch_lr_trace(lambda opt: mutils.get_scheduler_with_min_lr(
            "polynomial", opt, base_lr=BASE_LR, min_lr=1e-6,
            num_warmup_steps=WARMUP, num_training_steps=TOTAL, power=power))
        sched = polynomial_with_min_lr(BASE_LR, 1e-6, WARMUP, TOTAL,
                                       power=power)
        ours = np.asarray([float(sched(s)) for s in range(TOTAL + 1)])
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cosine_production_path_vs_diffusers():
    """The trainers' actual call shape: get_scheduler('cosine',
    num_cycles=0.5) == repo cosine with min_lr 0 on [0, TOTAL]."""
    load_reference("ladcast.models.utils")  # installs the shim
    from diffusers.optimization import get_scheduler

    ref = _torch_lr_trace(lambda opt: get_scheduler(
        "cosine", opt, num_warmup_steps=WARMUP, num_training_steps=TOTAL,
        num_cycles=0.5, power=1.0))
    sched = cosine_with_min_lr(BASE_LR, 0.0, WARMUP, TOTAL)
    ours = np.asarray([float(sched(s)) for s in range(TOTAL + 1)])
    # repo schedule evaluates in fp32 inside jit; reference is fp64
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-12)
