"""Test config: run on CPU with 8 virtual devices so sharding tests can
exercise a multi-chip mesh without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
# Tests check numerics, not speed — skip expensive XLA optimization passes to
# keep CPU compile times tolerable.
jax.config.update("jax_disable_most_optimizations", True)
