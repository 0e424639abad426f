"""Scene -> SoA device arrays.

The reference snapshots its UI scene graph into ``RaytracingUniforms``
(reference ``src/main.rs:1396-1404``, ``src/shader.rs:33-41``) — an
``Arc<Vec<Aabb>>`` walked per ray. The TPU-native equivalent is a struct
of dense device arrays: per-object geometry tables, a per-object material
table with an ``[n_objects, n_lambda]`` albedo matrix, and a light table —
so a wavefront of rays intersects *all* objects with vectorized math.

Construction happens on the host in float32 with the reference's exact
operation order (AABB corner math, sphere center/radius derivation,
nalgebra's closed-form Euler rotation), so geometry constants match the
reference bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import types

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.scene.schema import (
    Mesh,
    PlainBox,
    RotatedBox,
    Scene,
    Sphere,
)
from spectral_tpu.spectral import cie

F32 = np.float32

# Object type tags.
OBJ_PLAIN_BOX = 0
OBJ_SPHERE = 1
OBJ_ROTATED_BOX = 2
OBJ_TRIANGLE = 3  # one mesh face, expanded to a first-class object row

# Conservative padding on triangle world AABBs: an axis-planar triangle
# has a zero-thickness AABB, which the strict slab test (t_max > t_min)
# and cluster-union culling would skip. The exact intersection decides
# hits; the AABB is only ever used for culling, so padding is safe.
_TRI_AABB_PAD = F32(1e-4)


def euler_to_rotation_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """nalgebra ``Rotation3::from_euler_angles`` (roll=x, pitch=y, yaw=z;
    applied roll then pitch then yaw, i.e. R = Rz @ Ry @ Rx), closed form
    in float32. Used by reference ``src/shader.rs:185``."""
    sr, cr = F32(np.sin(F32(roll))), F32(np.cos(F32(roll)))
    sp, cp = F32(np.sin(F32(pitch))), F32(np.cos(F32(pitch)))
    sy, cy = F32(np.sin(F32(yaw))), F32(np.cos(F32(yaw)))
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ],
        dtype=F32,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneArrays:
    """Device-resident scene tables. All float32 unless noted.

    Geometry is parameterized so one branchless slab test covers both box
    types: ``local_origin = inv_rot @ (origin - shift)`` then slabs against
    ``[slab_min, slab_max]``. Plain boxes use world-space min/max with
    identity rotation (bit-identical to the reference's direct AABB test);
    rotated boxes use +-half_dim in local space (reference
    ``src/shader.rs:560-579``).
    """

    # objects
    obj_type: jax.Array  # i32 [O]
    slab_min: jax.Array  # [O, 3]
    slab_max: jax.Array  # [O, 3]
    shift: jax.Array  # [O, 3] world->local translation (rotated boxes)
    inv_rot: jax.Array  # [O, 3, 3]
    rot: jax.Array  # [O, 3, 3]
    aabb_min: jax.Array  # [O, 3] world AABB (for culling / accel)
    aabb_max: jax.Array  # [O, 3]
    center: jax.Array  # [O, 3] object center (rotated-box normals)
    half_dim: jax.Array  # [O, 3]
    sphere_pos: jax.Array  # [O, 3] (reference-derived; zeros for non-spheres)
    radius: jax.Array  # [O]
    # materials (per object)
    metallicness: jax.Array  # [O]
    roughness: jax.Array  # [O]
    albedo: jax.Array  # [O, S] reflective spectrum (min1'd if Reflective)
    transmission: jax.Array  # [O] refraction branch probability
    ior: jax.Array  # [O] Cauchy A coefficient
    cauchy_b: jax.Array  # [O] Cauchy B coefficient (um^2)
    tex_scale: jax.Array  # [O] checker cell size (0 = untextured)
    tex_low: jax.Array  # [O] checker dark-cell albedo factor
    emission: jax.Array  # [O, S] emitted spectrum (area lights)
    lambda_grid: jax.Array  # [S] sample wavelengths (nm)
    # material indirection (many-object kernels select per-material rather
    # than per-object spectra; scenes share few materials across objects)
    mat_id: jax.Array  # [O] i32 index into the material tables
    mat_albedo: jax.Array  # [M, S]
    mat_emission: jax.Array  # [M, S]
    mat_scalars: jax.Array  # [M, 8]: metal rough trans ior cauchy tex_scale tex_low pad
    # lights
    light_pos: jax.Array  # [L, 3]
    light_spec: jax.Array  # [L, S] unclamped
    # camera
    cam_pos: jax.Array  # [3]
    cam_dir: jax.Array  # [3]
    cam_up: jax.Array  # [3]
    fov_y_deg: jax.Array  # scalar
    cam_aperture: jax.Array  # scalar thin-lens radius (0 = pinhole)
    cam_focus: jax.Array  # scalar focus-plane distance along the view axis
    # color pipeline
    xyz_weights: jax.Array  # [S, 3] per-sample XYZ integration weights
    xyz_to_rgb: jax.Array  # [3, 3]
    # environment emission collected on miss (beyond-reference; the
    # reference's miss shader is zero, src/shader.rs:460-463). None for
    # sky-less scenes — the absent pytree leaf doubles as the static gate,
    # so reference scenes compile none of the sky math.
    sky: jax.Array | None = None  # [S] unclamped
    # static (non-traced) copy of obj_type: lets jitted code include a
    # primitive's intersection math only when the scene actually has it
    # (triangles would otherwise tax every boxes-and-spheres scene)
    obj_types_static: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    # static: any mesh in the scene carries per-vertex normals — gates
    # the Phong interpolation + renormalize in the shading-normal path
    # (all-flat scenes keep the exact stored winding normal, no extra ops)
    smooth_tri_static: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # static: any material carries a procedural texture — gates the
    # checker-factor math in every shading path (untextured scenes pay
    # nothing, like has_transmission/has_emission)
    textured_static: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )

    @property
    def n_objects(self) -> int:
        return self.obj_type.shape[0]

    @property
    def n_lights(self) -> int:
        return self.light_pos.shape[0]

    @property
    def n_samples(self) -> int:
        return self.albedo.shape[1]


def host_meta(arrays: "SceneArrays") -> types.SimpleNamespace:
    """Host-side metadata for cluster planning / kernel specialization.

    ``flatten_scene`` attaches numpy copies as ``arrays.host`` (free);
    arrays that crossed a jit/tree boundary lose the attribute, and this
    falls back to one device readback per field (the pre-round-5 path).
    """
    host = getattr(arrays, "host", None)
    if host is not None:
        return host
    return types.SimpleNamespace(
        obj_type=np.asarray(arrays.obj_type),
        aabb_min=np.asarray(arrays.aabb_min),
        aabb_max=np.asarray(arrays.aabb_max),
        cam_pos=np.asarray(arrays.cam_pos)[:3],
        has_transmission=bool(np.asarray(arrays.transmission).any()),
        has_emission=bool(np.asarray(arrays.emission).any()),
    )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) render parameters, passed as jit-static."""

    width: int
    height: int
    n_samples: int
    max_bounces: int
    intended_frames: int
    n_objects: int
    n_lights: int
    lambda_lo: float = 380.0
    lambda_hi: float = 780.0
    n_materials: int = 0
    # static depth-of-field gate: raygen adds the thin-lens re-aim only
    # when the scene has a positive aperture, so pinhole scenes compile
    # the reference-exact ray generation (bit-identical)
    has_dof: bool = False


def _sphere_tables(center, radius_in):
    """Reference derivation chain: ``Aabb::new_sphere`` (src/shader.rs:108-115)
    stores min/max; ``intersection_shader`` re-derives
    ``sphere_pos = (min + max) * 0.5`` and ``radius = max.x - sphere_pos.x``
    (src/shader.rs:305-306). Reproduce both steps in f32."""
    c = np.asarray(center, dtype=F32)
    r = F32(radius_in)
    amin = (c - r).astype(F32)
    amax = (c + r).astype(F32)
    sphere_pos = ((amin + amax) * F32(0.5)).astype(F32)
    radius = F32(amax[0] - sphere_pos[0])
    return amin, amax, sphere_pos, radius


def _rotated_box_world_aabb(center, half, rot):
    """World AABB of a rotated box from its 8 corners
    (reference ``Aabb::new_rotated_box``, src/shader.rs:134-166)."""
    c = np.asarray(center, dtype=F32)
    corners = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                local = np.array(
                    [sx * half[0], sy * half[1], sz * half[2]], dtype=F32
                )
                corners.append((c + (rot @ local).astype(F32)).astype(F32))
    corners = np.stack(corners)
    return corners.min(axis=0).astype(F32), corners.max(axis=0).astype(F32)


def _lambda_grid(scene: Scene, n: int) -> np.ndarray:
    """Sample wavelengths, same f32 walk as ``Spectrum.get_wavelengths``."""
    lo = F32(scene.spectrum_lower_bound)
    hi = F32(scene.spectrum_upper_bound)
    step = F32(F32(hi - lo) / F32(n - 1))
    return np.array([F32(lo + F32(step * F32(i))) for i in range(n)], dtype=F32)


def flatten_scene(scene: Scene) -> tuple[SceneArrays, RenderConfig]:
    """Snapshot a validated scene into device arrays.

    Hidden objects/lights are filtered out, like the reference's dispatch
    (src/main.rs:1397-1398).
    """
    scene.validate()
    n_samples = scene.spectrum_number_of_samples
    objects = scene.visible_objects()
    lights = scene.visible_lights()

    # meshes expand: each face becomes one first-class object row (so
    # every kernel — brute force, clusters, NEE, AOVs — handles
    # triangles with zero special-casing at the orchestration layer)
    rows: list[tuple] = []
    for obj in objects:
        if isinstance(obj.object_type, Mesh):
            rows.extend((obj, f) for f in range(len(obj.object_type.faces)))
        else:
            rows.append((obj, None))

    n_obj = len(rows)
    obj_type = np.zeros(n_obj, dtype=np.int32)
    slab_min = np.zeros((n_obj, 3), dtype=F32)
    slab_max = np.zeros((n_obj, 3), dtype=F32)
    shift = np.zeros((n_obj, 3), dtype=F32)
    inv_rot = np.tile(np.eye(3, dtype=F32), (n_obj, 1, 1))
    rot = np.tile(np.eye(3, dtype=F32), (n_obj, 1, 1))
    aabb_min = np.zeros((n_obj, 3), dtype=F32)
    aabb_max = np.zeros((n_obj, 3), dtype=F32)
    center = np.zeros((n_obj, 3), dtype=F32)
    half_dim = np.zeros((n_obj, 3), dtype=F32)
    sphere_pos = np.zeros((n_obj, 3), dtype=F32)
    radius = np.zeros(n_obj, dtype=F32)
    metallicness = np.zeros(n_obj, dtype=F32)
    roughness = np.zeros(n_obj, dtype=F32)
    albedo = np.zeros((n_obj, n_samples), dtype=F32)
    transmission = np.zeros(n_obj, dtype=F32)
    ior = np.full(n_obj, F32(1.5), dtype=F32)
    cauchy_b = np.zeros(n_obj, dtype=F32)
    tex_scale = np.zeros(n_obj, dtype=F32)
    tex_low = np.ones(n_obj, dtype=F32)
    emission = np.zeros((n_obj, n_samples), dtype=F32)
    mat_id = np.zeros(n_obj, dtype=np.int32)
    material_index: dict[int, int] = {}
    material_list: list[int] = []

    for i, (obj, face) in enumerate(rows):
        pos = np.asarray(obj.position, dtype=F32)
        center[i] = pos
        t = obj.object_type
        if face is not None:
            # triangle row (Mesh face): columns are REUSED for the
            # Moller-Trumbore parameterization — shift = v0,
            # slab_min = e1, slab_max = e2. inv_rot carries the shading
            # normal as (row 0 = n0, row 1 = n1-n0, row 2 = n2-n0) so
            # every backend shades with ONE formula,
            # normalize(n0 + u*dn1 + v*dn2), from the barycentrics the
            # intersection test already computed: flat meshes store the
            # winding normal with zero deltas, smooth meshes (per-vertex
            # `normals`) get Phong interpolation. Never ray-flipped (the
            # reference's own normals are geometric too). See
            # pack_geometry/_candidate_t for the kernel-side reads.
            i0, i1, i2 = t.faces[face]
            v0 = (pos + np.asarray(t.vertices[i0], F32)).astype(F32)
            v1 = (pos + np.asarray(t.vertices[i1], F32)).astype(F32)
            v2 = (pos + np.asarray(t.vertices[i2], F32)).astype(F32)
            e1 = (v1 - v0).astype(F32)
            e2 = (v2 - v0).astype(F32)
            obj_type[i] = OBJ_TRIANGLE
            shift[i] = v0
            slab_min[i] = e1
            slab_max[i] = e2
            inv_rot[i] = 0.0
            if t.normals:
                def _unit(idx):
                    n_ = np.asarray(t.normals[idx], np.float64)
                    ln_ = np.linalg.norm(n_)
                    return (n_ / ln_ if ln_ > 0.0 else n_).astype(F32)

                n0_, n1_, n2_ = _unit(i0), _unit(i1), _unit(i2)
                inv_rot[i, 0] = n0_
                inv_rot[i, 1] = (n1_ - n0_).astype(F32)
                inv_rot[i, 2] = (n2_ - n0_).astype(F32)
            else:
                nrm = np.cross(e1.astype(np.float64), e2.astype(np.float64))
                ln = np.linalg.norm(nrm)
                if ln > 0.0:
                    inv_rot[i, 0] = (nrm / ln).astype(F32)
                # degenerate face: zero normal, never wins a hit anyway
            vs = np.stack([v0, v1, v2])
            aabb_min[i] = (vs.min(axis=0) - _TRI_AABB_PAD).astype(F32)
            aabb_max[i] = (vs.max(axis=0) + _TRI_AABB_PAD).astype(F32)
            # centroid (Morton clustering key; nothing else reads it
            # for triangles)
            center[i] = ((v0 + v1 + v2) / F32(3.0)).astype(F32)
        elif isinstance(t, PlainBox):
            obj_type[i] = OBJ_PLAIN_BOX
            half = np.array(
                [F32(t.x_length) / 2, F32(t.y_length) / 2, F32(t.z_length) / 2],
                dtype=F32,
            )
            half_dim[i] = half
            # reference Aabb::new_box (src/shader.rs:120-130)
            aabb_min[i] = (pos - half).astype(F32)
            aabb_max[i] = (pos + half).astype(F32)
            slab_min[i], slab_max[i] = aabb_min[i], aabb_max[i]
        elif isinstance(t, Sphere):
            obj_type[i] = OBJ_SPHERE
            amin, amax, spos, rad = _sphere_tables(pos, t.radius)
            aabb_min[i], aabb_max[i] = amin, amax
            slab_min[i], slab_max[i] = amin, amax
            sphere_pos[i], radius[i] = spos, rad
        elif isinstance(t, RotatedBox):
            obj_type[i] = OBJ_ROTATED_BOX
            half = np.array(
                [F32(t.x_length) / 2, F32(t.y_length) / 2, F32(t.z_length) / 2],
                dtype=F32,
            )
            half_dim[i] = half
            r = euler_to_rotation_matrix(t.x_rotation, t.y_rotation, t.z_rotation)
            rot[i] = r
            inv_rot[i] = r.T  # Rotation3::inverse == transpose
            shift[i] = pos
            slab_min[i], slab_max[i] = (-half).astype(F32), half
            aabb_min[i], aabb_max[i] = _rotated_box_world_aabb(pos, half, r)
        else:
            raise TypeError(f"unknown object type {t!r}")

        mat = obj.material
        metallicness[i] = F32(mat.metallicness)
        roughness[i] = F32(mat.roughness)
        albedo[i] = mat.spectrum.render_spectrum().values
        transmission[i] = F32(mat.transmission)
        ior[i] = F32(mat.ior)
        cauchy_b[i] = F32(mat.cauchy_b_um2)
        if mat.texture is not None:
            tex_scale[i] = F32(mat.texture.scale)
            tex_low[i] = F32(mat.texture.low)
        if mat.emission is not None:
            emission[i] = mat.emission.spectrum.values  # unclamped, like lights
        if id(mat) not in material_index:
            material_index[id(mat)] = len(material_list)
            material_list.append(i)  # representative object row
        mat_id[i] = material_index[id(mat)]

    n_lights = len(lights)
    light_pos = np.zeros((n_lights, 3), dtype=F32)
    light_spec = np.zeros((n_lights, n_samples), dtype=F32)
    for i, light in enumerate(lights):
        light_pos[i] = np.asarray(light.position, dtype=F32)
        # unclamped, regardless of effect type (src/shader.rs:205-210)
        light_spec[i] = light.spectrum.spectrum.values

    # color integration weights: [K, 3] rows from the f32 sample walk,
    # padded/truncated to an [S, 3] matrix acting on the sample axis.
    w = cie.xyz_integration_weights(
        scene.spectrum_lower_bound, scene.spectrum_upper_bound, n_samples
    )
    xyz_weights = np.zeros((n_samples, 3), dtype=F32)
    k = min(len(w), n_samples)
    xyz_weights[:k] = w[:k]

    np_fields = dict(
        obj_type=obj_type,
        slab_min=slab_min,
        slab_max=slab_max,
        shift=shift,
        inv_rot=inv_rot,
        rot=rot,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        center=center,
        half_dim=half_dim,
        sphere_pos=sphere_pos,
        radius=radius,
        metallicness=metallicness,
        roughness=roughness,
        albedo=albedo,
        transmission=transmission,
        ior=ior,
        cauchy_b=cauchy_b,
        tex_scale=tex_scale,
        tex_low=tex_low,
        emission=emission,
        lambda_grid=_lambda_grid(scene, n_samples),
        mat_id=mat_id,
        mat_albedo=albedo[material_list].reshape(-1, n_samples),
        mat_emission=emission[material_list].reshape(-1, n_samples),
        mat_scalars=(
            np.stack(
                [
                    metallicness[material_list],
                    roughness[material_list],
                    transmission[material_list],
                    ior[material_list],
                    cauchy_b[material_list],
                    tex_scale[material_list],
                    tex_low[material_list],
                    np.zeros(len(material_list), F32),
                ],
                axis=1,
            ).astype(F32)
            if material_list
            else np.zeros((0, 8), F32)
        ),
        light_pos=light_pos,
        light_spec=light_spec,
        sky=(
            scene.sky.spectrum.values.astype(F32)
            if scene.sky is not None
            else None  # no-sky scenes keep the pytree leaf absent: every
            # compiled program is bit-identical to the pre-sky framework
        ),
        cam_pos=np.asarray(scene.camera.position, dtype=F32),
        cam_dir=np.asarray(scene.camera.direction, dtype=F32),
        cam_up=np.asarray(scene.camera.up, dtype=F32),
        fov_y_deg=F32(scene.camera.fov_y_deg),
        cam_aperture=F32(scene.camera.aperture_radius),
        cam_focus=F32(scene.camera.focus_distance),
        xyz_weights=xyz_weights,
        xyz_to_rgb=cie.XYZ_TO_RGB_MATRIX,
    )
    arrays = SceneArrays(
        **{k: None if v is None else jnp.asarray(v) for k, v in np_fields.items()},
        obj_types_static=tuple(int(x) for x in obj_type),
        smooth_tri_static=any(
            isinstance(o.object_type, Mesh) and bool(o.object_type.normals)
            for o in objects
        ),
        textured_static=any(
            o.material.texture is not None for o in objects
        ),
    )
    # host-side copies of everything callers read back before the first
    # kernel (cluster planning, kernel-specialization flags, the checkpoint
    # scene digest): a D2H readback of data this function JUST uploaded is
    # pure waste, and on the tunneled TPU platform readbacks can stall for
    # minutes when the relay is congested. Plain attribute, NOT a pytree
    # field — it does not survive jit/tree transforms; consumers fall back
    # to D2H via ``host_meta()`` when absent.
    arrays.host = types.SimpleNamespace(
        obj_type=obj_type,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        cam_pos=np_fields["cam_pos"],
        has_transmission=bool(transmission.any()),
        has_emission=bool(emission.any()),
        np_fields=np_fields,
    )
    config = RenderConfig(
        width=scene.width,
        height=scene.height,
        n_samples=n_samples,
        max_bounces=scene.nbr_of_ray_bounces,
        intended_frames=scene.nbr_of_iterations,
        n_objects=n_obj,
        n_lights=n_lights,
        lambda_lo=float(scene.spectrum_lower_bound),
        lambda_hi=float(scene.spectrum_upper_bound),
        n_materials=len(material_list),
        has_dof=scene.camera.aperture_radius > 0.0,
    )
    return arrays, config
