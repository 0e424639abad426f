"""Primary ray generation.

Vectorized re-design of the reference's ``ray_generation_shader`` camera
math (reference ``src/shader.rs:271-293``), preserving its quirks:

* NDC y is flipped and x scaled by aspect ratio;
* the basis is ``right = forward x up``, ``true_up = right x forward``,
  and the direction is ``forward*focal - right*x + true_up*y`` — with the
  reference's (commented "no idea why") **minus** on the right axis;
* the sub-pixel jitter is one Hammersley offset per *frame*, applied to
  every pixel (screen-wide jitter, not per-pixel AA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spectral_tpu.ops.rng import hammersley
from spectral_tpu.ops.vecmath import Vec3

PI = jnp.float32(jnp.pi)


def camera_basis(cam_dir, cam_up, fov_y_deg, width: int, height: int):
    """Frame-independent camera scalars shared by host raygen and the
    megakernel's in-kernel restart raygen (free-running persist mode):
    ``(forward, right, true_up, focal_distance, aspect_ratio)`` with the
    exact op order of :func:`generate_primary_rays`."""
    w = jnp.float32(width)
    h = jnp.float32(height)
    aspect_ratio = w / h
    fov_half_rad = (fov_y_deg / 2.0) / 180.0 * PI
    focal_distance = 1.0 / jnp.tan(fov_half_rad)
    up = Vec3(cam_up[0], cam_up[1], cam_up[2]).normalize()
    forward = Vec3(cam_dir[0], cam_dir[1], cam_dir[2]).normalize()
    right = forward.cross(up).normalize()
    true_up = right.cross(forward)
    return forward, right, true_up, focal_distance, aspect_ratio


def scene_dof(scene, config):
    """``(aperture, focus)`` for :func:`generate_primary_rays` when the
    static config enables depth of field, else None (the compile-time
    pinhole path)."""
    return (scene.cam_aperture, scene.cam_focus) if config.has_dof else None


def lens_point(right, true_up, aperture, frame_id):
    """The thin-lens origin shift for ``frame_id`` — ONE lens point per
    frame (screen-wide, like the reference's Hammersley jitter), drawn
    from a PCG3D stream disjoint from the bounce RNG (whose x/y seeds are
    pixel coordinates). Shared by host raygen and the regeneration
    kernel's per-frame origin table (``pack_camera_frames``) so both are
    bit-identical."""
    from spectral_tpu.ops.rng import random_pcg3d

    u1, u2, _u3 = random_pcg3d(
        frame_id, jnp.uint32(0x9E3779B9), jnp.uint32(0x85EBCA6B)
    )
    r = aperture * jnp.sqrt(u1)
    theta = (2.0 * PI) * u2
    lens_x = r * jnp.cos(theta)
    lens_y = r * jnp.sin(theta)
    return right * lens_x + true_up * lens_y


def generate_primary_rays(
    cam_pos: jax.Array,
    cam_dir: jax.Array,
    cam_up: jax.Array,
    fov_y_deg: jax.Array,
    width: int,
    height: int,
    frame_id: jax.Array,
    intended_frames: int,
    full_width: int | None = None,
    full_height: int | None = None,
    row_offset=0,
    pixel_xy: tuple[jax.Array, jax.Array] | None = None,
    dof: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[Vec3, Vec3, jax.Array, jax.Array]:
    """Build the ``[height * width]`` wavefront of camera rays.

    Returns (origins, directions, pixel_x, pixel_y) where pixel_x/y are the
    uint32 pixel coordinates feeding the PCG3D seeds.

    ``full_width``/``full_height`` are the whole-image dimensions used for
    the NDC mapping; ``height``/``width`` and ``row_offset`` select the row
    slab actually generated (for row-sharded rendering, where each device
    builds rays for its own rows but in global image coordinates).

    ``pixel_xy`` overrides the row-major pixel coordinate arrays (flat
    uint32, any order/length) — used for permuted lane assignment: every
    per-ray quantity is elementwise in (px, py), so rays for a permuted
    coordinate list are bit-identical to their row-major twins.

    ``dof = (aperture_radius, focus_distance)`` (traced f32 scalars)
    enables thin-lens depth of field — a capability the reference lacks
    (its raygen is the fixed pinhole above). In keeping with the
    reference's SCREEN-WIDE jitter design, each frame draws ONE lens
    point for all pixels (PCG3D of the frame id — decorrelated from the
    Hammersley sub-pixel jitter), offsets the camera position by it in
    the right/true-up plane, and re-aims every ray at its pinhole ray's
    intersection with the plane ``focus_distance`` along the view axis;
    progressive accumulation over the frames integrates the aperture.
    Pass ``None`` (the default, and whenever ``config.has_dof`` is
    False) for bit-identical pinhole ray generation.
    """
    if pixel_xy is not None:
        px, py = pixel_xy
        n = px.shape[0]
    else:
        n = height * width
        py = (
            jax.lax.broadcasted_iota(jnp.uint32, (height, width), 0)
            + jnp.uint32(row_offset)
        ).reshape(n)
        px = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 1).reshape(n)
    width = full_width or width
    height = full_height or height

    xf = px.astype(jnp.float32)
    yf = py.astype(jnp.float32)
    w = jnp.float32(width)
    h = jnp.float32(height)
    forward, right, true_up, focal_distance, aspect_ratio = camera_basis(
        cam_dir, cam_up, fov_y_deg, width, height
    )

    off_x, off_y = hammersley(frame_id, jnp.uint32(intended_frames))

    y_ndc = -(((yf + off_y) / h) * 2.0 - 1.0)
    x_ndc = (((xf + off_x) / w) * 2.0 - 1.0) * aspect_ratio

    d = forward * focal_distance - right * x_ndc + true_up * y_ndc
    # reference normalizes in raygen AND in Ray::new
    d = d.normalize().normalize()

    ox, oy, oz = cam_pos[0], cam_pos[1], cam_pos[2]
    if dof is not None:
        aperture, focus = dof
        shift = lens_point(right, true_up, aperture, frame_id)
        # pinhole ray's hit with the focus plane (d is unit; forward is
        # unit, so d.forward is the cosine to the view axis), re-aimed
        # from the shifted origin: F - o' = d * t_f - shift
        t_f = focus / d.dot(forward)
        d = (d * t_f - shift).normalize().normalize()
        ox, oy, oz = ox + shift.x, oy + shift.y, oz + shift.z

    origin = Vec3(
        jnp.broadcast_to(ox, (n,)),
        jnp.broadcast_to(oy, (n,)),
        jnp.broadcast_to(oz, (n,)),
    )
    return origin, d, px, py
