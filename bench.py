"""Benchmark: the north-star workload (BASELINE.json).

20-member, 240h (40 x 6h) autoregressive ensemble rollout of the 375M
LaDCast DiT at 20 Heun denoise steps per 4-frame chunk -- 10 AR steps x 39
denoiser calls x 20 members = 7,800 member-forward passes -- plus the
initial DCAE encode and all 800 frame decodes, entirely on-device
(network in bfloat16, EDM trajectory in fp32).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

vs_baseline: the reference repo publishes no wall-clock numbers; the
north-star target is <60 s on a v5e-8 (BASELINE.md). We normalize by chip
count: target_this_host = 60 * 8 / n_chips seconds, and report
vs_baseline = target_this_host / measured (>1 == beating the target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ladcast_tpu.config import (
        DCAEConfig,
        EDMSchedulerConfig,
        RolloutConfig,
        ladcast_375m_config,
    )
    from ladcast_tpu.models.dcae import AutoencoderDC
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
    from ladcast_tpu.parallel.mesh import make_mesh
    from ladcast_tpu.rollout.pipeline import ForecastPipeline

    devices = jax.devices()
    n_chips = len(devices)

    dit_cfg = ladcast_375m_config()
    dcae_cfg = DCAEConfig()
    sched_cfg = EDMSchedulerConfig()
    # Pad 20 members to a multiple of the chip count for even sharding.
    ens_target = 20
    ens = -(-ens_target // n_chips) * n_chips
    rcfg = RolloutConfig(ensemble_size=ens)

    dit = LaDCastTransformer3D(dit_cfg)
    dcae = AutoencoderDC(dcae_cfg)

    T_in, H, W, C = rcfg.input_seq_len, 15, 30, 84
    GH, GW = 120, 240

    fields = jax.random.normal(jax.random.PRNGKey(0), (T_in, GH, GW, C),
                               jnp.float32)
    static = jax.random.normal(jax.random.PRNGKey(1), (GH, GW, 5),
                               jnp.float32)

    dcae_params = jax.jit(dcae.init)(jax.random.PRNGKey(2),
                                     fields, static)
    dit_params = jax.jit(dit.init)(
        jax.random.PRNGKey(3),
        jnp.zeros((1, rcfg.return_seq_len, H, W, C)), jnp.zeros((1,)),
        jnp.zeros((1, T_in, H, W, C)), jnp.zeros((1,)))

    pipe = ForecastPipeline(dit_cfg, dcae_cfg, sched_cfg, rcfg,
                            dit_params, dcae_params)

    mesh = make_mesh("ens")
    ens_sh = NamedSharding(mesh, P("ens"))

    year_progress = jnp.linspace(0.4, 0.45, rcfg.num_repetitions)

    def full_forecast(key):
        z = pipe.encode_fields(fields)
        z = pipe.normalize_latent(z)
        known = jnp.broadcast_to(z[None], (ens, *z.shape))
        if n_chips > 1:
            known = jax.device_put(known, ens_sh)
        traj = pipe.forecast_latents(known, year_progress, key)
        decoded = pipe.decode_latents(traj)
        # tiny device->host summary only
        return float(jnp.mean(traj)), float(jnp.mean(decoded[:, -1]))

    # Compile (excluded), then measure.
    full_forecast(jax.random.PRNGKey(4))

    times = []
    for i in range(2):
        t0 = time.perf_counter()
        full_forecast(jax.random.PRNGKey(5 + i))
        times.append(time.perf_counter() - t0)
    measured = min(times)

    target = 60.0 * 8 / n_chips
    print(json.dumps({
        "metric": f"375M 20-member 240h ensemble rollout wall-clock "
                  f"({n_chips} chip{'s' if n_chips > 1 else ''}, "
                  f"{ens} members incl. encode+decode)",
        "value": round(measured, 3),
        "unit": "s",
        "vs_baseline": round(target / measured, 3),
    }))


if __name__ == "__main__":
    main()
