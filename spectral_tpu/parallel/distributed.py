"""Multi-host (multi-process) runtime support.

The reference is a single desktop process (SURVEY.md C12: ``std::sync::mpsc``
channels, no sockets). The TPU-native scale-out past one host is JAX's
multi-controller SPMD model: every process runs the same program,
``jax.distributed.initialize`` wires the processes into one runtime, and the
existing row-sharded render step works unchanged over the *global* device
mesh — rows are pixel-disjoint, so per-frame work needs no collective at
all; only the final framebuffer fetch crosses hosts (an all-gather over
DCN, once per save/preview, not per frame).

Verified multi-process on CPU (2 processes x 4 virtual devices — the
multi-host analog of the virtual-device mesh tests, SURVEY.md §4); on real
pods the same entry points ride ICI/DCN via libtpu.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join this process into a multi-process JAX runtime.

    Thin, env-var-friendly wrapper over ``jax.distributed.initialize``:
    arguments left ``None`` fall back to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) or, on TPU pods, the cloud metadata autodetection
    built into JAX. Must be called before first device use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own logging / image export."""
    return jax.process_index() == 0


def fetch_global(array) -> np.ndarray:
    """Fetch a (possibly cross-host-sharded) array fully to this host.

    Single-process arrays are device_get directly; multi-process shards
    are all-gathered over DCN via ``multihost_utils`` (every process
    receives the full array, matching the reference's single framebuffer
    owner).
    """
    if getattr(array, "is_fully_addressable", True):
        return np.asarray(jax.device_get(array))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def env_configured() -> bool:
    """True when the standard JAX multi-process env vars are set."""
    return "JAX_COORDINATOR_ADDRESS" in os.environ
