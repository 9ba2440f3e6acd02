"""bench.py multi-chip correctness (VERDICT r4 weak #1).

With >1 device bench.py shards ensemble members over a 1-D 'ens' mesh
(the same SPMD layout as `cli/pred_rollout.py --shard_ensemble`). The
member PRNG folds the member INDEX, so the trajectory must be
mesh-independent: these tests run bench.py's OWN `make_bench` code path
at tiny shapes on the 8-device CPU mesh and assert the sharded program
reproduces the single-device trajectory, for both samplers.

Reference point for the behavior replaced: the reference host-loops
member micro-batches one device at a time (pipelines/utils.py:701-740).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    LaDCastDiTConfig,
    RolloutConfig,
)

from bench import make_bench

TINY_DIT = LaDCastDiTConfig(
    in_channels=84, out_channels=84, num_attention_heads=2,
    attention_head_dim=16, num_layers=1, num_single_layers=1,
    num_refiner_layers=1, mlp_ratio=2.0, rope_axes_dim=(4, 6, 6),
    conditioning_tensor_rope_axes_dim=(4, 6, 6),
    conditioning_tensor_in_channels=84, attention_impl="xla")

TINY_DCAE = DCAEConfig(
    in_channels=89, out_channels=89, latent_channels=84,
    attention_head_dim=4,
    encoder_block_types=("ResBlock",) * 2 + ("EfficientViTBlock",) * 2,
    decoder_block_types=("ResBlock",) * 2 + ("EfficientViTBlock",) * 2,
    encoder_block_out_channels=(84, 84, 84, 168),
    decoder_block_out_channels=(84, 84, 84, 168),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    encoder_qkv_multiscales=((), (), (5,), (5,)),
    decoder_qkv_multiscales=((), (), (5,), (5,)),
    static_channels=5)


def _build(sampler, mesh):
    rcfg = RolloutConfig(ensemble_size=16, num_inference_steps=3,
                         total_lead_time_hour=48, sampler_type=sampler)
    return make_bench(TINY_DIT, TINY_DCAE, EDMSchedulerConfig(), rcfg,
                      mesh=mesh, compute_dtype=jnp.float32,
                      latent_hw=(4, 6), grid_hw=(32, 48))


@pytest.mark.parametrize("sampler", ["edm", "dpm"])
def test_bench_sharded_trajectory_matches_single_device(sampler):
    key = jax.random.PRNGKey(7)
    traj0 = _build(sampler, None)["full_forecast_traj"](key)
    mesh = Mesh(np.asarray(jax.devices()), ("ens",))
    b = _build(sampler, mesh)
    traj1 = b["full_forecast_traj"](key)
    assert traj0.shape == (16, 8, 4, 6, 84)
    # fp32 on CPU: identical math up to XLA reduction reassociation
    np.testing.assert_allclose(traj1, traj0, rtol=2e-4, atol=2e-4)
    # the scalar contract (what main() times) also runs sharded
    acc, mean = b["full_forecast"](key)
    assert np.isfinite(acc) and np.isfinite(mean)


def test_bench_flops_cost_analysis_available():
    """The denoiser_mfu key needs PJRT cost analysis; assert the hook
    returns a sane positive FLOP count on the CPU backend so a silent
    regression can't drop the key from BENCH_r*.json."""
    b = _build("edm", None)
    fl = b["flops_per_forecast"]()
    assert fl is not None and fl > 1e6, fl
