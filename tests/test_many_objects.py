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
    # the fori object loop's material indirection caps at 32 distinct
    # materials; the builder must refuse beyond that (platform-independent)
    from spectral_tpu.ops.pallas.megakernel import build_megakernel
    from spectral_tpu.scene.flatten import RenderConfig

    config = RenderConfig(
        width=16, height=8, n_samples=8, max_bounces=2, intended_frames=1,
        n_objects=100, n_lights=1, n_materials=40,
    )
    with pytest.raises(ValueError, match="32 distinct materials"):
        build_megakernel(tuple([1] * 100), config, object_loop="fori")
