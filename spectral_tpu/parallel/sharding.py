"""Sharding placement for scene tables and framebuffers.

Scene tables (object/material/light SoA) are tiny and read by every ray —
they are replicated across the mesh. The framebuffer (and with it the
whole per-pixel wavefront, via XLA SPMD propagation) is sharded over pixel
rows; each device traces its row slice independently, mirroring the
reference's row-per-thread fan-out (src/main.rs:1286-1307) at chip
granularity over ICI instead of a thread pool.
"""

from __future__ import annotations

import jax

from spectral_tpu.parallel.mesh import replicated, row_sharding
from spectral_tpu.scene.flatten import RenderConfig, SceneArrays


def shard_scene(
    scene: SceneArrays,
    sharding: jax.sharding.NamedSharding,
    config: RenderConfig,
):
    """Place scene tables (replicated) and return the framebuffer sharding.

    ``sharding`` may be any NamedSharding on the target mesh; its mesh is
    reused. Raises if the row count does not divide over the mesh.
    """
    mesh = sharding.mesh
    n_dev = mesh.devices.size
    if config.height % n_dev != 0:
        raise ValueError(
            f"image height {config.height} must be divisible by the mesh "
            f"size {n_dev} (pad the image or shrink the mesh)"
        )
    scene_rep = jax.device_put(scene, replicated(mesh))
    return scene_rep, row_sharding(mesh)
