"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
(`shard_map` over a `jax.sharding.Mesh`) are exercised without TPU pods.

Note: this environment's sitecustomize registers the TPU backend at
interpreter startup, so setting JAX_PLATFORMS in os.environ here is too
late; we switch the platform through jax.config instead (backends are
selected lazily, at first use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
