"""Test configuration: force JAX onto 8 virtual CPU devices.

Multi-chip sharding is exercised the TPU-native way — a virtual CPU mesh
(``xla_force_host_platform_device_count``), the JAX analog of testing
multi-node without a cluster (SURVEY.md §4).
"""

import os

# Must be set before the first jax backend initialisation.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests run on CPU.
jax.config.update("jax_platforms", "cpu")
