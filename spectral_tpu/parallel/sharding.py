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


def build_sharded_pallas_step(
    mesh, config: RenderConfig, obj_types: tuple, interpret: bool = False,
    has_transmission: bool = False, has_emission: bool = False,
    clusters: tuple | None = None,
):
    """Row-sharded megakernel step via shard_map.

    Each device runs the VMEM-resident bounce megakernel on its own row
    slab, generating camera rays in *global* image coordinates from its
    mesh position — the multi-chip analog of the reference's
    row-per-thread fan-out, with zero per-frame collectives.
    """
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.integrator import accumulate_frame
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    n_dev = mesh.devices.size
    local_h = config.height // n_dev
    local_config = dataclasses.replace(config, height=local_h)

    def shard_fn(scene_local, accum_local, frame_id):
        idx = jax.lax.axis_index(ROW_AXIS)
        rgb = integrate_frame_pallas(
            scene_local,
            local_config,
            frame_id,
            obj_types,
            interpret=interpret,
            has_transmission=has_transmission,
            has_emission=has_emission,
            full_height=config.height,
            row_offset=idx * local_h,
            clusters=clusters,
        )
        return accumulate_frame(accum_local, rgb, frame_id)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def build_sharded_pallas_regen_step(
    mesh, config: RenderConfig, obj_types: tuple, k: int,
    interpret: bool = False,
    has_transmission: bool = False, has_emission: bool = False,
    clusters: tuple | None = None,
):
    """Row-sharded path-regeneration step: each device retires ``k``
    progressive frames of its row slab in one megakernel launch
    (``integrate_frames_pallas_regen``), then blends the k-frame sum.
    Same zero-per-frame-collectives layout as the per-frame step."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.integrator import accumulate_frames
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    n_dev = mesh.devices.size
    local_h = config.height // n_dev
    local_config = dataclasses.replace(config, height=local_h)

    def shard_fn(scene_local, accum_local, first_frame):
        idx = jax.lax.axis_index(ROW_AXIS)
        rgb_sum = integrate_frames_pallas_regen(
            scene_local,
            local_config,
            first_frame,
            obj_types,
            k,
            interpret=interpret,
            has_transmission=has_transmission,
            has_emission=has_emission,
            full_height=config.height,
            row_offset=idx * local_h,
            clusters=clusters,
        )
        return accumulate_frames(accum_local, rgb_sum, first_frame, k)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))
