"""Arbitrary output variables (AOVs): first-hit G-buffers.

A beyond-reference capability (the reference's shader produces only the
beauty image — ``apply_shader2``, reference ``src/main.rs:1280-1322``):
deterministic per-pixel depth, shading normal, first-hit albedo color
and object id from one primary-ray trace — the auxiliary feature
buffers denoisers and compositing pipelines consume alongside the
path-traced image.

Design: AOVs are a single wavefront ``trace`` over pixel-center rays
(``generate_primary_rays`` at ``frame 0 of 1``, whose screen-wide
Hammersley offset is exactly (0.5, 0.5) — the pixel center), reusing
the render path's intersection kernels and normal dispatch, so the
buffers are geometrically consistent with the beauty render by
construction. One jit program, no bounce loop, runs everywhere the jnp
path runs.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.ops.geometry import surface_normal, trace
from spectral_tpu.render.camera import generate_primary_rays
from spectral_tpu.render.color import spectra_to_rgb

__all__ = ["compute_aovs", "save_aovs", "save_aovs_exr"]


@partial(jax.jit, static_argnums=(1,))
def _aov_program(scene, config):
    origin, direction, _px, _py = generate_primary_rays(
        scene.cam_pos,
        scene.cam_dir,
        scene.cam_up,
        scene.fov_y_deg,
        config.width,
        config.height,
        frame_id=jnp.uint32(0),
        # no dof= even when the scene has an aperture: G-buffers are
        # DEFINED at the pinhole view (a lens-averaged "first hit" is not
        # a well-posed geometric quantity), so the center ray is traced
        intended_frames=1,  # Hammersley offset (0.5, 0.5): pixel centers
    )
    res = trace(origin, direction, scene)
    h, w = config.height, config.width

    depth = jnp.where(res.hit, res.t, jnp.inf).reshape(h, w)

    ip = origin + direction * res.t
    n = surface_normal(
        ip, res.obj_idx, scene, origin=origin, direction=direction
    )
    normal = jnp.stack([n.x, n.y, n.z], axis=-1)
    normal = jnp.where(res.hit[:, None], normal, 0.0).reshape(h, w, 3)

    # first-hit reflectance color: the hit object's albedo spectrum
    # through the same CIE pipeline as the beauty image (linear RGB,
    # no gamma — out-of-gamut values may be negative, like the render)
    albedo_spec = scene.albedo[res.obj_idx]
    albedo = spectra_to_rgb(albedo_spec, scene.xyz_weights, scene.xyz_to_rgb)
    if scene.textured_static:
        # checker modulation — so denoisers demodulating by this buffer
        # preserve the texture pattern exactly
        from spectral_tpu.render.integrator import checker_factor

        texf = checker_factor(
            ip.x, ip.y, ip.z,
            scene.tex_scale[res.obj_idx], scene.tex_low[res.obj_idx],
        )
        albedo = albedo * texf[:, None]
    albedo = jnp.where(res.hit[:, None], albedo, 0.0).reshape(h, w, 3)

    obj_id = jnp.where(res.hit, res.obj_idx, -1).reshape(h, w)
    return depth, normal, albedo, obj_id


def compute_aovs(scene) -> dict:
    """First-hit feature buffers for ``scene`` (a schema ``Scene``).

    Returns numpy arrays: ``depth`` ``[H, W]`` f32 ray-parameter distance
    (+inf where no geometry is hit), ``normal`` ``[H, W, 3]`` f32 unit
    shading normal (zeros on miss), ``albedo`` ``[H, W, 3]`` f32 linear
    RGB first-hit reflectance (zeros on miss), and ``obj_id`` ``[H, W]``
    int32 index into the flattened object rows (-1 on miss) — for scenes
    without meshes this is the ``scene.objects`` index; mesh faces get
    one id per triangle, which makes the buffer a per-face id map.
    """
    from spectral_tpu.scene.flatten import flatten_scene

    arrays, config = flatten_scene(scene)
    if config.n_objects == 0:
        h, w = config.height, config.width
        return {
            "depth": np.full((h, w), np.inf, np.float32),
            "normal": np.zeros((h, w, 3), np.float32),
            "albedo": np.zeros((h, w, 3), np.float32),
            "obj_id": np.full((h, w), -1, np.int32),
        }
    depth, normal, albedo, obj_id = _aov_program(arrays, config)
    return {
        "depth": np.asarray(jax.device_get(depth)),
        "normal": np.asarray(jax.device_get(normal)),
        "albedo": np.asarray(jax.device_get(albedo)),
        "obj_id": np.asarray(jax.device_get(obj_id), np.int32),
    }


def save_aovs(aovs: dict, out_dir) -> list:
    """Write each buffer as ``.npy`` (exact) plus a ``.png`` preview
    (depth: normalized over the finite range, misses white; normal:
    ``0.5 + 0.5 n``; albedo: clamped; obj_id: hashed to colors).
    Returns the written paths."""
    from spectral_tpu.render import image as image_mod

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for name, arr in aovs.items():
        p = out / f"{name}.npy"
        np.save(p, arr)
        written.append(p)

    def _png(name: str, rgb: np.ndarray):
        rgba = np.concatenate(
            [rgb.astype(np.float32), np.ones_like(rgb[..., :1])], axis=-1
        )
        p = out / f"{name}.png"
        image_mod.save_image(rgba, p)
        written.append(p)

    depth = aovs["depth"]
    finite = np.isfinite(depth)
    if finite.any():
        lo = float(depth[finite].min())
        hi = float(depth[finite].max())
        span = (hi - lo) or 1.0
        vis = np.where(finite, (depth - lo) / span, 1.0).astype(np.float32)
    else:
        vis = np.ones_like(depth, np.float32)
    _png("depth", np.repeat(vis[..., None], 3, axis=-1))

    _png("normal", 0.5 + 0.5 * aovs["normal"])
    _png("albedo", np.clip(aovs["albedo"], 0.0, 1.0))

    oid = aovs["obj_id"].astype(np.int64)
    # deterministic color hash; id -1 (miss) maps to black
    r = ((oid * 2654435761) % 255) / 255.0
    g = ((oid * 40503 + 17) % 255) / 255.0
    b = ((oid * 69069 + 101) % 255) / 255.0
    ids = np.stack([r, g, b], axis=-1).astype(np.float32)
    ids[oid < 0] = 0.0
    _png("obj_id", ids)
    return written


def save_aovs_exr(aovs: dict, path, beauty: np.ndarray | None = None):
    """Write the AOVs (plus an optional beauty pass) as ONE multi-layer
    ZIP-compressed EXR — the interchange format denoise/comp pipelines
    consume: base ``R/G/B/A`` = beauty, ``depth.Z``, ``normal.RGB``,
    ``albedo.RGB``, ``obj_id.Z`` (ids as floats; -1 = miss). The beauty
    and AOV layers are written as f32 so they round-trip bit-exactly."""
    from spectral_tpu.render.exr import write_exr_layers

    layers: dict = {
        "depth": aovs["depth"],
        "normal": aovs["normal"],
        "albedo": aovs["albedo"],
        "obj_id": aovs["obj_id"].astype(np.float32),
    }
    if beauty is not None:
        layers[""] = np.asarray(beauty, np.float32)
    return write_exr_layers(layers, path, pixel_type="float")
