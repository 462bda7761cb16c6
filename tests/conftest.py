"""Test configuration: force CPU with an 8-device virtual mesh.

The container's sitecustomize registers an 'axon' PJRT plugin (remote TPU
tunnel) and sets jax_platforms="axon,cpu" at interpreter start — before this
conftest runs — so the env var alone is not enough; we must update the jax
config. Multi-chip sharding paths are validated on virtual CPU devices
(numerics identical, only speed differs); real-TPU execution is covered by
bench.py and the driver's compile checks.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
