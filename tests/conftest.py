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
