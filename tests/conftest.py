"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4 implication (c)).

Note: the environment's sitecustomize pre-imports jax and registers the
TPU plugin, so env vars alone are too late — the backend is selected via
jax.config before first device use (backend init is lazy).
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
