"""Test configuration: force an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md section 4).

The image's axon TPU plugin ignores the JAX_PLATFORMS env var, so the
platform is forced through jax.config as well.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# fp32-parity numerics for all tests; the production hot path keeps JAX's
# fast default (bf16 MXU passes) -- see README "Precision policy".
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
