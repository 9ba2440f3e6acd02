"""Test configuration: force an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md section 4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the ambient env points at a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# fp32-parity numerics for all tests; the production hot path keeps JAX's
# fast default (bf16 MXU passes) -- see README "Precision policy".
jax.config.update("jax_default_matmul_precision", "float32")
