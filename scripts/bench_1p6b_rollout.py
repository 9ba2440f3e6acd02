"""1.6B LaDCast: 20-member 240h ensemble rollout wall-clock on one chip.

Same workload as bench.py (the north-star protocol, BASELINE.md) with the
1.6B config (configs/ladcast_1.6B.yaml equivalent) -- demonstrates the
larger model family runs the full inference protocol single-chip.
Round-1 extrapolation (PERFORMANCE.md): ~270 s from a 0.69 s B=20
forward; this measures the real thing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import (
    DCAEConfig,
    EDMSchedulerConfig,
    RolloutConfig,
    ladcast_1p6b_config,
)
from ladcast_tpu.models.dcae import AutoencoderDC
from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
from ladcast_tpu.rollout.engine import make_repetition_fn
from ladcast_tpu.rollout.pipeline import cast_pytree


def main():
    cdt = jnp.bfloat16
    # LADCAST_INT8=1: A/B the opt-in w8a8 path at 1.6B shapes (same
    # gate/semantics as bench.py; PERFORMANCE.md science gate applies).
    int8 = bool(os.environ.get("LADCAST_INT8"))
    # --sampler edm|dpm / --nfe N mirror bench.py: dpm is the reference's
    # own pipeline_AR sampler (N NFE per chunk vs Heun's 2N-1).
    argv = sys.argv[1:]

    def flag_val(name, default):
        if name not in argv:
            return default
        i = argv.index(name)
        if i + 1 >= len(argv):
            raise SystemExit(f"{name} requires a value")
        return argv[i + 1]

    sampler = flag_val("--sampler", "edm")
    if sampler not in ("edm", "dpm"):
        raise SystemExit(f"--sampler must be edm or dpm, got {sampler!r}")
    nfe = int(flag_val("--nfe", "20"))
    dit_cfg = ladcast_1p6b_config(int8_matmuls=int8)
    dcae_cfg = DCAEConfig()
    sched_cfg = EDMSchedulerConfig()
    rcfg = RolloutConfig(ensemble_size=20, sampler_type=sampler,
                         num_inference_steps=nfe)

    dit = LaDCastTransformer3D(dit_cfg)
    dcae = AutoencoderDC(dcae_cfg)

    T_in, H, W, C = rcfg.input_seq_len, 15, 30, 84
    fields = jax.random.normal(jax.random.PRNGKey(0), (T_in, 120, 240, C))
    static = jax.random.normal(jax.random.PRNGKey(1), (120, 240, 5))
    dcae_params = cast_pytree(
        jax.jit(dcae.init)(jax.random.PRNGKey(2), fields, static), cdt)
    dit_params = cast_pytree(jax.jit(dit.init)(
        jax.random.PRNGKey(3),
        jnp.zeros((1, rcfg.return_seq_len, H, W, C)), jnp.zeros((1,)),
        jnp.zeros((1, T_in, H, W, C)), jnp.zeros((1,))), cdt)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(dit_params))
    print(f"DiT params: {n_params / 1e9:.2f}B", flush=True)

    def net_fn(p, lat, cn, cond, yp):
        return dit.apply(p, lat.astype(cdt), cn, cond.astype(cdt),
                         yp).astype(jnp.float32)

    rep_fn = make_repetition_fn(sched_cfg, rcfg)

    @jax.jit
    def encode(p, f, s):
        z = dcae.apply(p, f.astype(cdt), s.astype(cdt),
                       method=AutoencoderDC.encode)
        return z.astype(jnp.float32)

    @jax.jit
    def rep_and_decode(dit_p, dcae_p, known, yp, kk):
        new_known, samples = rep_fn(net_fn, dit_p, known, yp, kk)
        E, T_out = samples.shape[:2]
        dec = dcae.apply(dcae_p, samples.reshape(E * T_out, H, W, C)
                         .astype(cdt), method=AutoencoderDC.decode)
        return new_known, samples, dec.astype(jnp.float32).mean()

    yp = np.linspace(0.4, 0.45, rcfg.num_repetitions)

    def forecast(key):
        z = encode(dcae_params, fields, static)
        known = jnp.broadcast_to(z[None], (20, T_in, H, W, C))
        keys = jax.random.split(key, rcfg.num_repetitions)
        acc = 0.0
        for r in range(rcfg.num_repetitions):
            known, _s, m = rep_and_decode(dit_params, dcae_params, known,
                                          jnp.asarray(yp[r]), keys[r])
            acc = acc + m
        return float(acc)

    t0 = time.time()
    forecast(jax.random.PRNGKey(4))
    print(f"compile+first run: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    forecast(jax.random.PRNGKey(5))
    dt = time.time() - t0
    print(json.dumps({
        "metric": "1.6B 20-member 240h ensemble rollout wall-clock (1 chip)"
                  + (" [int8]" if int8 else "")
                  + (f" [{sampler}-{nfe}]" if sampler != "edm" else ""),
        "value": round(dt, 2), "unit": "s"}), flush=True)


if __name__ == "__main__":
    main()
