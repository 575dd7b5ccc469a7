"""Test config: run on CPU with 8 virtual devices so sharding tests can
exercise a multi-chip mesh without TPU hardware (SURVEY.md §4).

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so the env var must be overridden via jax.config (env
mutation after that import is ignored) — and XLA_FLAGS must be set before
the first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Tests check numerics, not speed — skip expensive XLA optimization passes to
# keep CPU compile times tolerable.
jax.config.update("jax_disable_most_optimizations", True)
