"""Uniform-grid DDA traversal vs brute force."""

import numpy as np
import pytest

from spectral_tpu.ops.geometry import trace
from spectral_tpu.ops.grid_trace import trace_grid
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.scene import presets
from spectral_tpu.scene.accel import build_grid
from spectral_tpu.scene.flatten import flatten_scene


def _rays(n, seed, spread=25.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Vec3.from_array(o), Vec3.from_array(d.astype(np.float32))


@pytest.mark.parametrize("preset,n_obj", [("spheres", 200), ("cornell", None)])
def test_grid_matches_brute_force(preset, n_obj):
    if preset == "spheres":
        scene = presets.sphere_field(n_spheres=n_obj)
    else:
        scene = presets.PRESETS[preset]()
    arrays, _config = flatten_scene(scene)
    grid, static = build_grid(arrays)

    o, d = _rays(1024, seed=7)
    want = trace(o, d, arrays)
    got = trace_grid(o, d, arrays, grid, static)

    w_hit = np.asarray(want.hit)
    g_hit = np.asarray(got.hit)
    w_t = np.asarray(want.t)
    g_t = np.asarray(got.t)
    w_i = np.asarray(want.obj_idx)
    g_i = np.asarray(got.obj_idx)

    hit_mismatch = int((w_hit != g_hit).sum())
    assert hit_mismatch <= 2, f"{hit_mismatch} hit mismatches"
    both = w_hit & g_hit
    # t agrees to f32 rounding; object index agrees except boundary ties
    t_bad = int((np.abs(w_t[both] - g_t[both]) > 1e-4 * np.maximum(1, w_t[both])).sum())
    assert t_bad <= 2, f"{t_bad} t mismatches"
    idx_bad = int((w_i[both] != g_i[both]).sum())
    assert idx_bad <= 0.01 * both.sum() + 2


def test_grid_rays_from_inside_objects():
    scene = presets.sphere_field(n_spheres=100)
    arrays, _ = flatten_scene(scene)
    grid, static = build_grid(arrays)
    # rays starting at sphere centers (inside geometry)
    centers = np.asarray(arrays.sphere_pos)[1:65]
    o = Vec3.from_array(centers.astype(np.float32))
    d = Vec3.from_array(
        np.tile(np.float32([0.267, 0.534, 0.802]), (len(centers), 1))
    )
    want = trace(o, d, arrays)
    got = trace_grid(o, d, arrays, grid, static)
    assert np.array_equal(np.asarray(want.hit), np.asarray(got.hit))
    assert np.allclose(np.asarray(want.t), np.asarray(got.t), rtol=1e-5)


def test_grid_build_shapes():
    scene = presets.sphere_field(n_spheres=300)
    arrays, _ = flatten_scene(scene)
    grid, static = build_grid(arrays, res=(8, 8, 8))
    assert static.res == (8, 8, 8)
    cs = np.asarray(grid.cell_start)
    assert cs[0] == 0 and cs[-1] == static.n_items
    assert (np.diff(cs) >= 0).all()
    assert int(np.asarray(grid.items).max()) < 301


def test_renderer_grid_accel_matches_brute_force():
    from spectral_tpu.render.renderer import Renderer

    def scene():
        s = presets.sphere_field(n_spheres=150)
        s.width, s.height = 48, 32
        s.nbr_of_iterations = 2
        s.nbr_of_ray_bounces = 3
        return s

    brute = Renderer(scene(), accel="none").render()
    grid = Renderer(scene(), accel="grid").render()
    # multi-bounce diffuse chains flip on last-ulp differences (see
    # test_integrator_vs_oracle); the overwhelming majority must agree
    err = np.abs(brute - grid).max(axis=-1)
    flips = int((err > 1e-3).sum())
    assert flips <= 0.1 * err.size
    agree = err[err <= 1e-3]
    assert float(agree.max()) < 1e-3


def test_accel_policy():
    from spectral_tpu.render.renderer import Renderer

    small = presets.cornell_box()
    small.width, small.height = 8, 8
    assert Renderer(small).grid is None

    # measured slower than dense brute force everywhere, so never automatic
    big = presets.sphere_field(n_spheres=400)
    big.width, big.height = 8, 8
    assert Renderer(big).grid is None
    assert Renderer(big, accel="grid").grid is not None  # opt-in (CPU)
