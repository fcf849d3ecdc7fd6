"""Test harness config: run everything on CPU with 8 virtual devices so
sharding tests work without a TPU pod (SURVEY.md section 4).

The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon
(the real TPU tunnel) before pytest starts, so plain env mutation here
is too late -- override via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
