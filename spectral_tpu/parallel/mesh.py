"""Device mesh construction.

The reference's only parallelism is one thread-pool task per image row
(reference ``src/main.rs:1280-1322``). The TPU-native equivalent is data
parallelism over pixel rows across a 1D ``jax.sharding.Mesh``: rows are
disjoint, per-frame work is embarrassingly parallel, and no collective is
needed until the framebuffer is gathered for display/save (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1D mesh over the first ``n_devices`` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``[H, W, ...]`` framebuffers: split the row axis."""
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
