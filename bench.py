"""Benchmark: the north-star workload (BASELINE.json).

20-member, 240h (40 x 6h) autoregressive ensemble rollout of the 375M
LaDCast DiT at 20 Heun denoise steps per 4-frame chunk -- 10 AR steps x 39
denoiser calls x 20 members = 7,800 member-forward passes -- plus the
initial DCAE encode and all 800 frame decodes, entirely on-device.

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
    from ladcast_tpu.config import (
        DCAEConfig,
        EDMSchedulerConfig,
        RolloutConfig,
        ladcast_375m_config,
    )
    from ladcast_tpu.models.dcae import AutoencoderDC
    from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
    from ladcast_tpu.parallel.mesh import make_mesh
    from ladcast_tpu.rollout.engine import ensemble_rollout
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()
    n_chips = len(devices)
    compute_dtype = jnp.bfloat16

    dit_cfg = ladcast_375m_config()
    dcae_cfg = DCAEConfig()
    sched_cfg = EDMSchedulerConfig()
    # Pad 20 members to a multiple of the chip count for even sharding.
    ens_target = 20
    ens = -(-ens_target // n_chips) * n_chips
    rcfg = RolloutConfig(ensemble_size=ens)

    dit = LaDCastTransformer3D(dit_cfg)
    dcae = AutoencoderDC(dcae_cfg)

    key = jax.random.PRNGKey(0)
    T_in, H, W, C = rcfg.input_seq_len, 15, 30, 84
    GH, GW = 120, 240

    fields = jax.random.normal(key, (T_in, GH, GW, C), jnp.float32)
    static = jax.random.normal(key, (GH, GW, 5), jnp.float32)

    dcae_params = jax.jit(dcae.init)(jax.random.PRNGKey(1), fields, static)
    lat_example = jnp.zeros((1, rcfg.return_seq_len, H, W, C), jnp.float32)
    cond_example = jnp.zeros((1, T_in, H, W, C), jnp.float32)
    dit_params = jax.jit(dit.init)(
        jax.random.PRNGKey(2), lat_example, jnp.zeros((1,)), cond_example,
        jnp.zeros((1,)))
    dit_params = jax.tree.map(lambda x: x.astype(compute_dtype), dit_params)

    mesh = make_mesh("ens")
    repl = NamedSharding(mesh, P())
    ens_sh = NamedSharding(mesh, P("ens"))

    def net_fn(latents, c_noise, cond, yp):
        out = dit.apply(dit_params, latents.astype(compute_dtype), c_noise,
                        cond.astype(compute_dtype), yp)
        return out.astype(jnp.float32)

    year_progress = jnp.linspace(0.4, 0.45, rcfg.num_repetitions)

    @jax.jit
    def full_forecast(fields, static, key):
        z = dcae.apply(dcae_params, fields, static,
                       method=AutoencoderDC.encode)
        known = jnp.broadcast_to(z[None], (ens, T_in, H, W, C))
        known = jax.lax.with_sharding_constraint(known, ens_sh)
        traj = ensemble_rollout(net_fn, known, year_progress, key,
                                sched_cfg, rcfg)
        # decode all frames, chunked over lead time
        E, T = traj.shape[:2]
        z_flat = traj.reshape(E * T, H, W, C)
        dec = jax.lax.map(
            lambda zc: dcae.apply(dcae_params, zc,
                                  method=AutoencoderDC.decode),
            z_flat.reshape(-1, E, H, W, C))
        # return small summaries to keep D2H tiny
        return traj.mean(), dec.mean()

    # Compile (excluded from timing), then measure.
    out = full_forecast(fields, static, jax.random.PRNGKey(3))
    jax.block_until_ready(out)

    times = []
    for i in range(2):
        t0 = time.perf_counter()
        out = full_forecast(fields, static, jax.random.PRNGKey(4 + i))
        jax.block_until_ready(out)
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
