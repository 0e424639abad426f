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
