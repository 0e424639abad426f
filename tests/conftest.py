"""Test configuration: force JAX onto 8 virtual CPU devices.

Multi-chip sharding is exercised the TPU-native way — a virtual CPU mesh
(``xla_force_host_platform_device_count``), the JAX analog of testing
multi-node without a cluster (SURVEY.md §4).
"""

import os

# Keep test compilations OUT of the shared on-disk XLA cache: CLI tests
# run main() in-process, which would otherwise enable it for the rest of
# the pytest process, and a cache entry truncated by a killed writer
# segfaults jax's cache read in whatever test next compiles that program.
os.environ.setdefault("SPECTRAL_TPU_NO_COMPILE_CACHE", "1")

# Must be set before the first jax backend initialisation.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests run on CPU.
jax.config.update("jax_platforms", "cpu")
