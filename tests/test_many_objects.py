"""Many-object scenes: chunked trace equivalence and the stress preset."""

import numpy as np
import pytest

from spectral_tpu.ops import geometry
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene


def test_chunked_trace_matches_dense(monkeypatch):
    scene = presets.sphere_field(n_spheres=64)
    arrays, config = flatten_scene(scene)

    rng = np.random.default_rng(0)
    n = 512
    origins = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = Vec3.from_array(origins.astype(np.float32))
    d = Vec3.from_array(dirs.astype(np.float32))

    dense = geometry.trace(o, d, arrays)
    # force the chunked path (budget smaller than 512 * 65)
    monkeypatch.setattr(geometry, "_BROADCAST_BUDGET", 4096)
    chunked = geometry.trace(o, d, arrays)

    hit_d, hit_c = np.asarray(dense.hit), np.asarray(chunked.hit)
    assert np.array_equal(hit_d, hit_c)
    assert np.array_equal(np.asarray(dense.obj_idx), np.asarray(chunked.obj_idx))
    # the two compilations may differ in the last ulp (FMA grouping)
    t_d, t_c = np.asarray(dense.t)[hit_d], np.asarray(chunked.t)[hit_d]
    assert np.allclose(t_d, t_c, rtol=1e-5)


def test_sphere_field_preset_flattens():
    scene = presets.sphere_field(n_spheres=1000)
    arrays, config = flatten_scene(scene)
    assert config.n_objects == 1001  # floor + spheres
    assert config.width == 1024 and config.height == 768
    # deterministic: same seed, same scene
    arrays2, _ = flatten_scene(presets.sphere_field(n_spheres=1000))
    assert np.array_equal(np.asarray(arrays.sphere_pos), np.asarray(arrays2.sphere_pos))


def test_sphere_field_renders_small():
    import jax

    from spectral_tpu.render.renderer import Renderer

    scene = presets.sphere_field(n_spheres=200)
    scene.width, scene.height = 64, 48
    scene.nbr_of_iterations = 1
    scene.nbr_of_ray_bounces = 2
    r = Renderer(scene)
    # few materials: many-object scenes stay on pallas (fori loop) on TPU
    # and use the portable jnp path on CPU
    want = "pallas" if "tpu" in jax.devices()[0].platform.lower() else "jnp"
    assert r.backend == want
    img = r.render()
    assert not np.isnan(img).any()
    assert float(img[..., :3].max()) > 0.05


def test_fori_kernel_rejects_too_many_materials():
    # the fori object loop's material indirection selects with a cost
    # linear in the material count; the builder refuses beyond 256
    # (platform-independent)
    from spectral_tpu.ops.pallas.megakernel import build_megakernel
    from spectral_tpu.scene.flatten import RenderConfig

    config = RenderConfig(
        width=16, height=8, n_samples=8, max_bounces=2, intended_frames=1,
        n_objects=100, n_lights=1, n_materials=300,
    )
    with pytest.raises(ValueError, match="256 distinct materials"):
        build_megakernel(tuple([1] * 100), config, object_loop="fori")


def test_fori_kernel_many_materials_bit_exact():
    """>32 distinct materials on the many-object megakernel (the former
    silent 30x jnp-fallback cliff, VERDICT r2 #3): a scene whose 64
    materials duplicate 5 value-identical originals must render BIT-
    identically to the 5-material scene — the only difference is the
    material indirection (inline-mask select path for M > 32)."""
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    def small(scene):
        scene.width, scene.height = 16, 16
        scene.nbr_of_iterations = 2
        scene.nbr_of_ray_bounces = 2
        scene.spectrum_number_of_samples = 8
        scene.update_all_spectrum_sample_sizes()
        return scene

    base = small(presets.sphere_field(n_spheres=100))

    import dataclasses

    many = small(presets.sphere_field(n_spheres=100))
    clones = []
    for i in range(64):
        src = many.materials[i % len(many.materials)]
        clones.append(dataclasses.replace(src, name=f"{src.name} #{i}"))
    many.materials = clones
    # value-identity across the two scenes: base object i uses material
    # (i%64)%5, many object i uses clone i%64 — which duplicates exactly
    # material (i%64)%5
    for i, obj in enumerate(base.objects):
        obj.material = base.materials[(i % 64) % len(base.materials)]
    for i, obj in enumerate(many.objects):
        obj.material = clones[i % 64]

    a_arrays, a_config = flatten_scene(base)
    b_arrays, b_config = flatten_scene(many)
    assert a_config.n_materials <= 5
    assert b_config.n_materials == 64
    # per-object material VALUES agree even though the tables differ
    assert np.array_equal(
        np.asarray(a_arrays.metallicness), np.asarray(b_arrays.metallicness)
    )

    obj_types = tuple(np.asarray(a_arrays.obj_type).tolist())
    img_a = np.asarray(
        integrate_frame_pallas(
            a_arrays, a_config, np.uint32(1), obj_types, interpret=True
        )
    )
    img_b = np.asarray(
        integrate_frame_pallas(
            b_arrays, b_config, np.uint32(1), obj_types, interpret=True
        )
    )
    assert np.array_equal(img_a, img_b)


def _cluster_scene(n_spheres=100, bounces=3):
    scene = presets.sphere_field(n_spheres=n_spheres)
    scene.width, scene.height = 16, 16
    scene.nbr_of_iterations = 3
    scene.nbr_of_ray_bounces = bounces
    scene.spectrum_number_of_samples = 8
    scene.update_all_spectrum_sample_sizes()
    return scene


def test_clustered_object_loop_bit_exact():
    """The Morton-clustered, AABB-culled object loop must produce BIT-
    identical results to the brute-force fori loop: cluster skips are
    conservative (a skipped cluster could not be hit by any live lane)
    and exact ties resolve by original object index."""
    import numpy as np

    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        integrate_frames_pallas_regen,
    )

    arrays, config = flatten_scene(_cluster_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    sigma, runs = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=16,
    )
    assert sorted(sigma) == list(range(config.n_objects))
    clusters = (sigma, runs)

    plain = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, interpret=True
        )
    )
    clustered = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, interpret=True,
            clusters=clusters,
        )
    )
    assert np.array_equal(plain, clustered)

    plain_r = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        )
    )
    clustered_r = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            clusters=clusters,
        )
    )
    assert np.array_equal(plain_r, clustered_r)


def test_clustered_tie_rule_lowest_original_index():
    """Two IDENTICAL overlapping spheres: every hit is an exact t tie.
    The clustered loop's Morton visit order differs from the original,
    so the carried original-index tie-break is what keeps the winner—
    and with it the material—the lowest-original-index object, exactly
    like the reference's stable sort (src/shader.rs:481-483)."""
    import dataclasses

    import numpy as np

    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas
    from spectral_tpu.scene.schema import Material, SceneObject, Sphere

    scene = _cluster_scene(n_spheres=80, bounces=1)
    # two coincident spheres in front of the camera with very different
    # albedos: red (low index) must win the tie everywhere
    red = dataclasses.replace(
        scene.materials[1], name="tie-red"
    )
    green = dataclasses.replace(scene.materials[2], name="tie-green")
    scene.materials += [red, green]
    tie_lo = SceneObject((0.0, 0.0, 6.0), Sphere(3.0), red, "tie-lo")
    tie_hi = SceneObject((0.0, 0.0, 6.0), Sphere(3.0), green, "tie-hi")
    # insert at spread-out ORIGINAL indices so Morton order could reorder
    scene.objects.insert(5, tie_lo)
    scene.objects.append(tie_hi)

    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    plain = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True
        )
    )
    sigma, runs = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=16,
    )
    clustered = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True,
            clusters=(sigma, runs),
        )
    )
    assert np.array_equal(plain, clustered)


def test_clustered_tie_across_cluster_boundary_small_scene():
    """Regression for two review findings in one scene.

    (a) Tie at the cluster-AABB boundary: a plain box whose world AABB IS
    its cluster's union AABB yields a cluster entry t bitwise equal to a
    member hit t (both are the same `_slab_t` arithmetic). If an earlier
    cluster already holds a coincident box, `t_best == ct_min` exactly —
    the pre-test must use <= or the later cluster (holding the
    tie-winning LOWER-original-index box) is skipped, breaking the
    reference's stable-sort tie rule (src/shader.rs:481-483).

    (b) A clustered scene with <= 64 objects: build_megakernel forces the
    fori loop whenever clusters are passed, so the integrator's material-
    table trim decision must follow (it used to trim the indirection
    tables to one row in `auto` mode, leaving the kernel reading OOB).
    """
    import dataclasses

    import numpy as np

    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas
    from spectral_tpu.scene.flatten import OBJ_PLAIN_BOX, OBJ_SPHERE
    from spectral_tpu.scene.schema import Material, PlainBox, SceneObject

    scene = _cluster_scene(n_spheres=40, bounces=2)
    red = dataclasses.replace(scene.materials[1], name="tie-red")
    green = dataclasses.replace(scene.materials[2], name="tie-green")
    scene.materials += [red, green]
    # coincident boxes straight in front of the camera, nearer than the
    # sphere field: every primary hit on them is an exact t tie
    tie_lo = SceneObject((0.0, 1.0, 2.0), PlainBox(2.0, 2.0, 2.0), red,
                         "tie-lo")
    tie_hi = SceneObject((0.0, 1.0, 2.0), PlainBox(2.0, 2.0, 2.0), green,
                         "tie-hi")
    scene.objects.insert(1, tie_lo)   # original index 1 (after the floor)
    scene.objects.append(tie_hi)      # original index 42

    arrays, config = flatten_scene(scene)
    assert config.n_objects == 43 and config.n_objects <= 64  # case (b)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    assert obj_types[0] == obj_types[1] == OBJ_PLAIN_BOX
    assert obj_types[42] == OBJ_PLAIN_BOX

    plain = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True
        )
    )
    # hand-built plan: the HIGHER-original-index twin sits in an EARLIER
    # single-box cluster, so its hit t becomes t_best before the cluster
    # holding the tie winner is pre-tested (case (a))
    sigma = (42, 1, 0) + tuple(range(2, 42))
    runs = (
        (OBJ_PLAIN_BOX, 0, 1, True),   # green twin, visited first
        (OBJ_PLAIN_BOX, 1, 2, True),   # red twin: ct_min == t_best exactly
        (OBJ_PLAIN_BOX, 2, 3, False),  # floor
        (OBJ_SPHERE, 3, 43, True),
    )
    clustered = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True,
            clusters=(sigma, runs),
        )
    )
    assert np.array_equal(plain, clustered)


def test_shadow_interval_matches_root_test():
    """The sqrt-free shadow-occlusion predicate (``shadow_interval``)
    must reproduce the root-based test everywhere except lanes whose
    occluder sits within rounding of exactly t=0 or t=maxd (see the
    derivation on ``build_megakernel``). On this deterministic scene no
    lane is on a boundary, so the rendered frames are bit-identical —
    with and without the clustered loop (the latched blocked mask feeds
    the cluster relevance pre-test)."""
    import numpy as np

    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    arrays, config = flatten_scene(_cluster_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    sigma, runs = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=16,
    )
    clusters = (sigma, runs)

    base = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            object_loop="fori",
        )
    )
    interval = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            object_loop="fori", shadow_interval=True,
        )
    )
    assert np.array_equal(base, interval)

    interval_cl = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            clusters=clusters, shadow_interval=True,
        )
    )
    assert np.array_equal(base, interval_cl)


def test_shadow_interval_rejects_unrolled_loop():
    from spectral_tpu.ops.pallas.megakernel import build_megakernel
    from spectral_tpu.scene.flatten import RenderConfig

    config = RenderConfig(
        width=16, height=8, n_samples=8, max_bounces=2, intended_frames=1,
        n_objects=4, n_lights=1, n_materials=2,
    )
    with pytest.raises(ValueError, match="fori"):
        build_megakernel(
            tuple([1] * 4), config, object_loop="unrolled",
            shadow_interval=True,
        )


def test_shadow_interval_predicate_algebra():
    """Property test of the sign-test occlusion predicate against the
    root-based formulation in float64 (where both are exact for random
    coefficients): blocked ⟺ the reference-chosen root lies in
    (0, maxd]. Validates the boolean algebra across all sign cases of
    (b, c, disc, vertex, f(maxd))."""
    rng = np.random.default_rng(7)
    n = 200_000
    a = rng.uniform(0.5, 2.0, n)
    b = rng.uniform(-4.0, 4.0, n)
    c = rng.uniform(-4.0, 4.0, n)
    maxd = rng.uniform(0.1, 5.0, n)

    disc = b * b - 4.0 * a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    t = np.where(t1 >= 0.0, t1, t2)
    blocked_root = (disc >= 0.0) & (t > 0.0) & (t <= maxd)

    fm = a * maxd * maxd + b * maxd + c
    v_ok = b + 2.0 * a * maxd >= 0.0
    near = (b < 0.0) & (c > 0.0) & (v_ok | (fm <= 0.0))
    far = (c < 0.0) & v_ok & (fm >= 0.0)
    blocked_interval = (disc >= 0.0) & (near | far)

    assert np.array_equal(blocked_root, blocked_interval)


def test_dynamic_cluster_loop_bit_exact_and_auto_selected():
    """The DYNAMIC cluster loop (one lax.fori_loop per uniform streak of
    clusters — program size O(types), the many-cluster fix for the
    mesh5k scalar-core instruction-memory fault) must be bit-identical
    to both the brute-force fori loop and the static per-cluster
    emission, and the `auto` policy must actually select it at
    many-cluster scale."""
    import numpy as np

    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        integrate_frames_pallas_regen,
    )

    # 220 spheres + floor at cluster_size=8 -> ~28 clustered sphere runs:
    # over CLUSTER_LOOP_DYNAMIC_MIN, so `auto` picks the dynamic loop
    scene = _cluster_scene(n_spheres=220, bounces=3)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    sigma, runs = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=8,
    )
    n_cl = sum(1 for r in runs if r[3])
    assert n_cl >= mk.CLUSTER_LOOP_DYNAMIC_MIN
    # the segmentation folds the uniform sphere streak into O(1) dynamic
    # segments (ragged tail chunk may split it; unclustered floor run
    # stays static)
    segs = mk._cluster_segments(runs, 2)
    dyn = [s for s in segs if s[0] == "dyn"]
    assert dyn, "uniform cluster streak should fold into a dyn segment"
    assert len(segs) <= 6
    covered = sum(hi - lo for _k, _t, lo, hi, _b, _s in dyn)
    assert covered >= n_cl - 2  # at most the ragged tail stays static

    clusters = (sigma, runs)
    plain = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, interpret=True
        )
    )
    auto_dyn = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, interpret=True,
            clusters=clusters,
        )
    )
    assert np.array_equal(plain, auto_dyn)

    # force the static emission for the same plan and compare: the two
    # cluster-loop compilations must agree bitwise
    mk.CLUSTER_LOOP_AUTO_OVERRIDE = "static"
    try:
        from spectral_tpu.render import pallas_integrator as pi
        pi._kernel.cache_clear()
        forced_static = np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(1), obj_types, interpret=True,
                clusters=clusters,
            )
        )
    finally:
        mk.CLUSTER_LOOP_AUTO_OVERRIDE = None
        pi._kernel.cache_clear()
    assert np.array_equal(auto_dyn, forced_static)

    # the regen (multi-frame) kernel goes through the same loops
    plain_r = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        )
    )
    clustered_r = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            clusters=clusters,
        )
    )
    assert np.array_equal(plain_r, clustered_r)
