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

# Persistent compilation cache: the EC-arithmetic graphs (MSM bucket loops,
# scalar-mul fori bodies) take minutes to compile on CPU; cache them across
# test processes so only the first-ever run pays.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
# Cache-write policy: XLA:CPU's `executable.serialize()` segfaults
# deterministically on MSM bucket programs (crash inside
# put_executable_and_time; re-reproduced round 3 at
# test_circom.py::test_dummy_groth16_over_bn254), so the default is
# READ-ONLY: tests consume pre-existing entries and never write.
# ZKCP_CACHE_WRITE=1 opts into writes to repopulate the cache for
# non-MSM programs — expect the suite to die at the first Groth16
# prove; run targeted files, not the whole suite, in that mode.
if os.environ.get("ZKCP_CACHE_WRITE") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# NOTE: do NOT enable jax_persistent_cache_enable_xla_caches="all" here.
# The embedded XLA:CPU AOT kernel cache pins host CPU features into the
# entry (observed: "+prefer-no-scatter ... doesn't match the machine"
# loader errors) and its zstd serialization aborted the interpreter
# mid-write twice (Fatal Python error in put_executable_and_time).
