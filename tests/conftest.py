"""Test harness config: run everything on a fake 8-device CPU mesh.

The TPU-native answer to "test multi-node without a cluster": XLA's host
platform exposes N virtual devices, so every sharding / collective /
shard_map path is exercised for real, just on CPU. Must run before any
`import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override it back so the suite runs on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated on this
# single-core host (a cold FISRnet apply is ~30 s, cached ~6 s), and the
# per-commit fast lane mostly re-runs unchanged programs. Keys are
# content-hashes of HLO+flags, so source changes invalidate themselves.
# Point FISR_TEST_JAX_CACHE elsewhere (or at "" to disable) if needed.
_cache = os.environ.get(
    "FISR_TEST_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "fisr_tpu",
                 "jax_test_cache"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
