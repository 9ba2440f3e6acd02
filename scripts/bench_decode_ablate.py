"""Ablation: where does DCAE decode time go on TPU?

Variants:
  full     -- production sphere_conv2d (main conv + 4 boundary fixes)
  plain    -- plain zero-SAME conv everywhere (floor for boundary handling)
  nofix    -- main conv + pole strips only (no wrap-column fixes)
"""

import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import ladcast_tpu.ops.sphere as sphere
from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.rollout.pipeline import cast_pytree

_orig = sphere.sphere_conv2d


def plain_conv(x, kernel, bias=None, *, padding=None, groups=1):
    p = kernel.shape[0] // 2
    out = sphere._conv_nhwc(x, kernel, groups, padding=((p, p), (p, p)))
    if bias is not None:
        out = out + bias
    return out


def time_decode(label):
    # rebuild the model so the patched op is captured
    import importlib

    import ladcast_tpu.models.dcae as dcae_mod
    importlib.reload(dcae_mod)
    cdt = jnp.bfloat16
    cfg = DCAEConfig()
    dcae = dcae_mod.AutoencoderDC(cfg)
    fields = jax.random.normal(jax.random.PRNGKey(0), (1, 120, 240, 84))
    static = jax.random.normal(jax.random.PRNGKey(1), (120, 240, 5))
    params = cast_pytree(
        jax.jit(dcae.init)(jax.random.PRNGKey(2), fields, static), cdt)
    z = jax.random.normal(jax.random.PRNGKey(3), (20, 15, 30, 84))

    @jax.jit
    def decode_chunk(p, zz):
        return dcae.apply(p, zz.astype(cdt),
                          method=dcae_mod.AutoencoderDC.decode).astype(jnp.float32)

    float(decode_chunk(params, z).mean())
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(decode_chunk(params, z).mean())
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times)*1e3:.1f} ms / 20-frame chunk")


def main():
    sphere.sphere_conv2d = plain_conv
    time_decode("plain zero-pad conv")
    sphere.sphere_conv2d = _orig
    time_decode("full sphere conv   ")


if __name__ == "__main__":
    main()
