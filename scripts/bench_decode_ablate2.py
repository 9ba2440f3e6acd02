"""In-graph attribution: replace decoder components with cheap stand-ins
and measure the full-decode delta (20-frame chunk, TPU)."""

import importlib
import time

import flax.linen as nn
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.rollout.pipeline import cast_pytree


def time_decode(label, patch=None):
    import ladcast_tpu.models.dcae as dcae_mod
    importlib.reload(dcae_mod)
    if patch:
        patch(dcae_mod)
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
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(decode_chunk(params, z).mean())
        ts.append(time.perf_counter() - t0)
    print(f"{label:38s}: {min(ts)*1e3:6.1f} ms")


class _IdSana(nn.Module):
    out_channels: int
    attention_head_dim: int = 32
    kernel_sizes: tuple = (5,)
    eps: float = 1e-15
    mult: float = 1.0

    @nn.compact
    def __call__(self, x):
        return x


class _IdGLUMB(nn.Module):
    out_channels: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        return x


class _IdRes(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return x


def main():
    time_decode("baseline (full decoder)")
    time_decode("Sana attn -> identity",
                lambda m: setattr(m, "SanaMultiscaleLinearAttention", _IdSana))
    time_decode("GLUMBConv -> identity",
                lambda m: setattr(m, "GLUMBConv", _IdGLUMB))
    time_decode("ResBlock -> identity",
                lambda m: setattr(m, "ResBlock", _IdRes))


if __name__ == "__main__":
    main()
