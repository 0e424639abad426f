"""Triangle-mesh geometry (schema.Mesh + scene.mesh helpers).

Beyond-reference capability: the reference's geometry catalog is boxes
and spheres only (``UIObjectType``, reference src/main.rs:2070-2076).
Meshes flatten to first-class triangle rows (Moller-Trumbore in every
backend), so these tests pin: construction/IO, flattening layout, the
intersection math against the scalar oracle and analytic cases, jnp ==
interpret-pallas equivalence (incl. the many-object fori and clustered
loops), and the guard rails.
"""

import numpy as np
import pytest

from spectral_tpu.ops.geometry import surface_normal, trace, triangle_t
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import OBJ_TRIANGLE, flatten_scene
from spectral_tpu.scene.mesh import icosahedron, icosphere, load_obj
from spectral_tpu.scene.schema import Mesh, SceneError, SceneObject


def _vec(x, y, z):
    import jax.numpy as jnp

    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


# ------------------------------------------------------------- primitives


def test_triangle_t_analytic_cases():
    v0, e1, e2 = _vec(0, 0, 5), _vec(2, 0, 0), _vec(0, 2, 0)
    o, d = _vec(0.5, 0.5, 0), _vec(0, 0, 1)
    t, ok, u, v = triangle_t(o, d, v0, e1, e2)
    assert bool(ok) and float(t) == pytest.approx(5.0)
    assert float(u) == pytest.approx(0.25) and float(v) == pytest.approx(0.25)

    # outside the barycentric box
    o2 = _vec(1.9, 1.9, 0)
    _, ok2, _, _ = triangle_t(o2, d, v0, e1, e2)
    assert not bool(ok2)

    # behind the origin
    o3, d3 = _vec(0.5, 0.5, 10), _vec(0, 0, 1)
    _, ok3, _, _ = triangle_t(o3, d3, v0, e1, e2)
    assert not bool(ok3)

    # two-sided: hit from the back face too
    o4, d4 = _vec(0.5, 0.5, 10), _vec(0, 0, -1)
    t4, ok4, _, _ = triangle_t(o4, d4, v0, e1, e2)
    assert bool(ok4) and float(t4) == pytest.approx(5.0)

    # parallel ray (det == 0) rejects without NaN leakage
    o5, d5 = _vec(0.5, 0.5, 0), _vec(1, 0, 0)
    _, ok5, _, _ = triangle_t(o5, d5, v0, e1, e2)
    assert not bool(ok5)


def test_icosahedron_winding_and_radius():
    m = icosahedron(2.5)
    v = np.array(m.vertices)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 2.5, rtol=1e-6)
    assert m.n_triangles == 20
    for f in m.faces:
        v0, v1, v2 = v[list(f)]
        n = np.cross(v1 - v0, v2 - v0)
        assert np.dot(n, (v0 + v1 + v2) / 3) > 0  # CCW faces outward


def test_icosphere_subdivision():
    m = icosphere(1.0, 2)
    assert m.n_triangles == 20 * 16
    v = np.array(m.vertices)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-6)


def test_load_obj(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"  # quad -> fan-triangulated
        "f -4 -3 -2\n"  # negative indices
    )
    m = load_obj(p, scale=2.0)
    assert len(m.vertices) == 4 and m.vertices[2] == (2.0, 2.0, 0.0)
    assert m.faces == ((0, 1, 2), (0, 2, 3), (0, 1, 2))

    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 3\n")
    with pytest.raises(ValueError, match="out of range"):
        load_obj(bad)


def test_mesh_validation():
    sc = presets.default_scene()
    mat = sc.objects[0].material
    sc.objects.append(SceneObject((0, 0, 0), Mesh(((0, 0, 0),), ((0, 0, 5),)),
                                  mat, name="bad"))
    with pytest.raises(SceneError, match="outside"):
        sc.validate()
    sc.objects[-1] = SceneObject((0, 0, 0), Mesh((), ()), mat, name="empty")
    with pytest.raises(SceneError, match="no faces"):
        sc.validate()


def test_scene_json_round_trip_with_mesh(tmp_path):
    from spectral_tpu.utils import sceneio

    sc = presets.default_scene()
    sc.objects.append(SceneObject((0.0, 1.0, 6.0), icosahedron(1.2),
                                  sc.objects[0].material, name="ico"))
    path = tmp_path / "mesh_scene.json"
    sceneio.save_scene(sc, path)
    back = sceneio.load_scene(path)
    m0, m1 = sc.objects[-1].object_type, back.objects[-1].object_type
    assert isinstance(m1, Mesh)
    assert m1.vertices == m0.vertices and m1.faces == m0.faces
    a0, _ = flatten_scene(sc)
    a1, _ = flatten_scene(back)
    np.testing.assert_array_equal(np.asarray(a0.shift), np.asarray(a1.shift))


# ------------------------------------------------------------- flattening


def _mesh_scene(n_samples=8, sub=None, bounces=3):
    sc = presets.default_scene(n_samples=n_samples)
    sc.width, sc.height = 24, 16
    sc.nbr_of_ray_bounces = bounces
    sc.nbr_of_iterations = 2
    geom = icosahedron(1.2) if sub is None else icosphere(1.2, sub)
    sc.objects.append(SceneObject((0.0, 1.0, 6.0), geom,
                                  sc.objects[0].material, name="mesh"))
    return sc


def test_flatten_expands_faces_to_rows():
    sc = _mesh_scene()
    arrays, config = flatten_scene(sc)
    n_base = len(sc.objects) - 1
    assert config.n_objects == n_base + 20
    tri = [i for i, t in enumerate(arrays.obj_types_static)
           if t == OBJ_TRIANGLE]
    assert len(tri) == 20
    # triangle rows: shift = v0, slabs = e1/e2, inv_rot row 0 = unit normal
    i = tri[0]
    n = np.asarray(arrays.inv_rot)[i, 0]
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)
    amin = np.asarray(arrays.aabb_min)[i]
    amax = np.asarray(arrays.aabb_max)[i]
    assert (amax - amin > 0).all()  # padded: never zero-thickness
    # all 20 rows share the mesh object's material id
    mid = np.asarray(arrays.mat_id)[tri]
    assert (mid == mid[0]).all()


def test_surface_normal_is_stored_winding_normal():
    sc = _mesh_scene()
    arrays, config = flatten_scene(sc)
    import jax.numpy as jnp

    tri = [i for i, t in enumerate(arrays.obj_types_static)
           if t == OBJ_TRIANGLE][0]
    # a point on that triangle: v0 + 0.25*e1 + 0.25*e2
    v0 = np.asarray(arrays.shift)[tri]
    e1 = np.asarray(arrays.slab_min)[tri]
    e2 = np.asarray(arrays.slab_max)[tri]
    ip = v0 + 0.25 * e1 + 0.25 * e2
    p = Vec3(jnp.float32(ip[0:1]), jnp.float32(ip[1:2]), jnp.float32(ip[2:3]))
    n = surface_normal(p, jnp.int32([tri]), arrays)
    want = np.asarray(arrays.inv_rot)[tri, 0]
    got = np.array([float(n.x[0]), float(n.y[0]), float(n.z[0])])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trace_hits_the_mesh():
    sc = _mesh_scene()
    sc.objects = [sc.objects[-1]]  # isolate the mesh (material stays valid)
    arrays, _ = flatten_scene(sc)
    import jax.numpy as jnp

    o = Vec3(jnp.float32([0.0]), jnp.float32([1.0]), jnp.float32([0.0]))
    d = Vec3(jnp.float32([0.0]), jnp.float32([0.0]), jnp.float32([1.0]))
    res = trace(o, d, arrays)
    assert bool(res.hit[0])
    assert arrays.obj_types_static[int(res.obj_idx[0])] == OBJ_TRIANGLE
    # front face of an icosahedron of radius 1.2 centered 6 away
    assert 4.5 < float(res.t[0]) < 6.0


# ------------------------------------------------------- oracle / pallas


def test_mesh_scene_matches_oracle_direct():
    from tests.oracle import OracleRenderer

    sc = _mesh_scene(bounces=1)
    arrays, config = flatten_scene(sc)
    got = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    want = OracleRenderer(arrays, config).render_frame(0)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    # this framing includes a grazing sphere silhouette pixel where the
    # f32 quadratic is catastrophically sensitive (oracle-vs-XLA t
    # differs ~1e-4 on a near-tangent hit — pre-existing envelope, not a
    # triangle effect); everything else must be tight
    assert float(err.max()) < 1e-3
    assert float(np.quantile(err, 0.99)) < 1e-5


def test_mesh_scene_matches_oracle_multibounce_statistical():
    from tests.oracle import OracleRenderer

    sc = _mesh_scene(bounces=3)
    arrays, config = flatten_scene(sc)
    got = np.asarray(integrate_frame(arrays, config, np.uint32(1)))
    want = OracleRenderer(arrays, config).render_frame(1)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.15 * err.size
    assert float(err[err <= 1e-3].max()) < 1e-5


def test_mesh_pallas_interpret_matches_jnp_direct():
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    sc = _mesh_scene(bounces=1)
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, interpret=True))
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-5


def test_mesh_many_object_fori_and_clustered_match_jnp():
    """320-triangle icosphere: the type-run fori loop and the
    Morton-clustered culled loop must agree with the jnp path on a
    deterministic direct-only frame."""
    from spectral_tpu.ops.pallas.megakernel import plan_clusters
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    sc = _mesh_scene(sub=2, bounces=1)
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    assert config.n_objects > 64  # actually exercises the fori loop
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    scale = max(1.0, float(np.abs(want).max()))

    got = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, interpret=True))
    assert np.abs(got - want).max() / scale < 1e-5

    cl = plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max), obj_types,
        cluster_size=64, camera_pos=np.asarray(arrays.cam_pos)[:3],
    )
    got_cl = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, interpret=True, clusters=cl))
    np.testing.assert_array_equal(got_cl, got)  # culling is bit-exact


# ------------------------------------------------------------ guard rails


def test_grid_accel_refuses_meshes():
    from spectral_tpu.render.renderer import Renderer

    with pytest.raises(ValueError, match="mesh"):
        Renderer(_mesh_scene(), backend="jnp", accel="grid")


def test_cli_render_and_describe_mesh(tmp_path):
    from spectral_tpu.cli import main
    from spectral_tpu.utils import sceneio

    sc = _mesh_scene()
    path = tmp_path / "scene.json"
    sceneio.save_scene(sc, path)
    out = tmp_path / "img.png"
    rc = main(["render", "--scene", str(path), "--iterations", "1",
               "--quiet", "--out", str(out)])
    assert rc == 0 and out.exists()

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["describe", "--scene", str(path)]) == 0
    assert "Mesh (20 triangles)" in buf.getvalue()


def test_mesh_preset_flattens_and_round_trips(tmp_path):
    from spectral_tpu.utils import sceneio

    sc = presets.PRESETS["mesh"]()
    sc.validate()
    arrays, config = flatten_scene(sc)
    n_tri = sum(1 for t in arrays.obj_types_static if t == OBJ_TRIANGLE)
    assert n_tri == 320 + 20  # mirror icosphere + blue icosahedron
    assert config.n_objects == 5 + n_tri

    path = tmp_path / "mesh_preset.json"
    sceneio.save_scene(sc, path)
    back = sceneio.load_scene(path)
    a1, _ = flatten_scene(back)
    np.testing.assert_array_equal(
        np.asarray(arrays.shift), np.asarray(a1.shift)
    )


def test_mesh_regen_matches_per_frame_blend():
    """The production dispatch mode (in-kernel path regeneration) on a
    mesh scene: a K=2 regen launch must equal the two per-frame
    monolithic launches' blend up to f32 sum reassociation."""
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        render_frames_step_pallas_regen,
    )

    sc = _mesh_scene(bounces=2)
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    import jax.numpy as jnp

    accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
    got = np.asarray(render_frames_step_pallas_regen(
        arrays, config, accum, np.uint32(0), obj_types, 2, interpret=True))

    accum2 = jnp.zeros((config.height, config.width, 4), jnp.float32)
    from spectral_tpu.render.renderer import _blend
    for f in range(2):
        rgb = integrate_frame_pallas(
            arrays, config, np.uint32(f), obj_types, interpret=True)
        accum2 = _blend(accum2, rgb, jnp.uint32(f))
    want = np.asarray(accum2)
    np.testing.assert_allclose(got, want, atol=2e-6)


# -------------------------------------------------------- smooth shading


def test_smooth_helpers():
    from spectral_tpu.scene.mesh import smooth_normals

    m = icosphere(2.0, 1, smooth=True)
    v = np.array(m.vertices)
    n = np.array(m.normals)
    # icosphere smooth normals are the exact unit vertex directions
    np.testing.assert_allclose(n, v / 2.0, atol=1e-12)

    # area-weighted normals of an icosahedron align with vertex
    # directions by symmetry
    ms = smooth_normals(icosahedron(1.0))
    v = np.array(ms.vertices)
    n = np.array(ms.normals)
    dots = np.sum(n * v, axis=1)
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)

    sc = presets.default_scene()
    sc.objects.append(SceneObject(
        (0, 0, 0), Mesh(((0, 0, 0), (1, 0, 0), (0, 1, 0)), ((0, 1, 2),),
                        normals=((0, 0, 1),)),
        sc.objects[0].material, name="bad-normals"))
    with pytest.raises(SceneError, match="normals"):
        sc.validate()


def test_smooth_round_trip_and_flatten_layout(tmp_path):
    from spectral_tpu.utils import sceneio

    sc = presets.default_scene()
    sc.objects.append(SceneObject(
        (0.0, 1.0, 6.0), icosphere(1.2, 1, smooth=True),
        sc.objects[0].material, name="smooth"))
    p = tmp_path / "smooth.json"
    sceneio.save_scene(sc, p)
    back = sceneio.load_scene(p)
    assert back.objects[-1].object_type.normals == \
        sc.objects[-1].object_type.normals

    arrays, _ = flatten_scene(sc)
    assert arrays.smooth_tri_static
    tri = [i for i, t in enumerate(arrays.obj_types_static)
           if t == OBJ_TRIANGLE][0]
    ir = np.asarray(arrays.inv_rot)[tri]
    np.testing.assert_allclose(np.linalg.norm(ir[0]), 1.0, atol=1e-6)
    # smooth rows carry nonzero normal deltas
    assert np.abs(ir[1:]).max() > 0

    # flat scenes: static flag off, delta rows zero
    flat, _ = flatten_scene(_mesh_scene())
    assert not flat.smooth_tri_static
    trif = [i for i, t in enumerate(flat.obj_types_static)
            if t == OBJ_TRIANGLE][0]
    assert np.abs(np.asarray(flat.inv_rot)[trif][1:]).max() == 0


def test_smooth_icosphere_shades_like_analytic_sphere():
    """Shading normals of a smooth icosphere approach the analytic
    sphere normal; the flat version of the same mesh is visibly worse.
    Parallel-ray scan over the isolated mesh (no camera model in the
    loop)."""
    import jax.numpy as jnp

    def angular_err(smooth):
        sc = presets.default_scene()
        center = np.array([0.0, 0.0, 3.0])
        sc.objects = [SceneObject(
            tuple(center), icosphere(1.0, 2, smooth=smooth),
            sc.objects[0].material, name="ball")]
        arrays, _ = flatten_scene(sc)
        k = 31
        xs, ys = np.meshgrid(
            np.linspace(-0.9, 0.9, k), np.linspace(-0.9, 0.9, k)
        )
        o = Vec3(jnp.float32(xs.ravel()), jnp.float32(ys.ravel()),
                 jnp.float32(np.full(k * k, -2.0)))
        d = Vec3(jnp.float32(np.zeros(k * k)), jnp.float32(np.zeros(k * k)),
                 jnp.float32(np.ones(k * k)))
        res = trace(o, d, arrays)
        hit = np.asarray(res.hit)
        assert hit.sum() > 300
        t = np.asarray(res.t)
        ipz = -2.0 + t  # d = +z, o z = -2
        ip = np.stack([xs.ravel(), ys.ravel(), ipz], axis=1)[hit]
        n_true = ip - center
        n_true /= np.linalg.norm(n_true, axis=1, keepdims=True)
        nv = surface_normal(
            o + d * res.t, res.obj_idx, arrays, origin=o, direction=d
        )
        n = np.stack(
            [np.asarray(nv.x), np.asarray(nv.y), np.asarray(nv.z)], axis=1
        )[hit]
        cos = np.clip(np.sum(n * n_true, axis=1), -1, 1)
        return np.degrees(np.arccos(cos))

    err_smooth = angular_err(True)
    err_flat = angular_err(False)
    assert np.median(err_smooth) < 1.0, np.median(err_smooth)
    assert np.median(err_flat) > 3.0 * np.median(err_smooth)


def _smooth_scene(bounces=1):
    sc = presets.default_scene(n_samples=8)
    sc.width, sc.height = 24, 16
    sc.nbr_of_ray_bounces = bounces
    sc.nbr_of_iterations = 2
    sc.objects.append(SceneObject(
        (0.0, 1.0, 6.0), icosphere(1.2, 1, smooth=True),
        sc.objects[0].material, name="smooth"))
    return sc


def test_smooth_mesh_pallas_matches_jnp_direct():
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    arrays, config = flatten_scene(_smooth_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, interpret=True))
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-5


def test_smooth_mesh_matches_oracle_direct():
    from tests.oracle import OracleRenderer

    arrays, config = flatten_scene(_smooth_scene())
    got = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    want = OracleRenderer(arrays, config).render_frame(0)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    assert float(err.max()) < 1e-3  # grazing-hit envelope
    assert float(np.quantile(err, 0.99)) < 1e-5
