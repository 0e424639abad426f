"""Vectorized intersection/normal kernels vs the scalar oracle."""

import numpy as np
import pytest

from spectral_tpu.ops.geometry import surface_normal, trace, trace_shadow
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene
from tests.oracle import OracleRenderer

F = np.float32


@pytest.fixture(scope="module", params=["default", "cornell"])
def scene_pair(request):
    scene = presets.PRESETS[request.param]()
    arrays, config = flatten_scene(scene)
    return arrays, config, OracleRenderer(arrays, config)


def _random_rays(n, seed):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-4, 4, size=(n, 3)).astype(F)
    dirs = rng.normal(size=(n, 3)).astype(F)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True).astype(F)
    return origins, dirs.astype(F)


def test_trace_matches_oracle(scene_pair):
    arrays, config, orc = scene_pair
    origins, dirs = _random_rays(256, seed=1)
    res = trace(Vec3.from_array(origins), Vec3.from_array(dirs), arrays)
    t = np.asarray(res.t)
    idx = np.asarray(res.obj_idx)
    hit = np.asarray(res.hit)

    mismatches = 0
    for k in range(len(origins)):
        best_t, best_i = np.inf, -1
        for i in range(orc.n_obj):
            ti = orc.intersection_shader(origins[k], dirs[k], i)
            if ti is not None and ti > 0.0 and ti < best_t:
                best_t, best_i = float(ti), i
        if best_i < 0:
            if hit[k]:
                mismatches += 1
        else:
            if not hit[k] or idx[k] != best_i or abs(t[k] - best_t) > 1e-4 * max(1.0, best_t):
                mismatches += 1
    # boundary-grazing rays may differ by an ulp; require near-total agreement
    assert mismatches <= 1, f"{mismatches} trace mismatches of {len(origins)}"


def test_shadow_matches_oracle(scene_pair):
    arrays, config, orc = scene_pair
    origins, dirs = _random_rays(128, seed=2)
    max_d = np.full(len(origins), 3.0, dtype=F)
    blocked = np.asarray(
        trace_shadow(Vec3.from_array(origins), Vec3.from_array(dirs), max_d, arrays)
    )
    mismatches = 0
    for k in range(len(origins)):
        _spec, want, _ = orc.submit_ray(
            origins[k], dirs[k], 2, 0, 0, 0, skip_hit=True, max_hit_distance=F(3.0)
        )
        if bool(blocked[k]) != bool(want):
            mismatches += 1
    assert mismatches <= 1


def test_normals_match_oracle(scene_pair):
    arrays, config, orc = scene_pair
    origins, dirs = _random_rays(256, seed=3)
    res = trace(Vec3.from_array(origins), Vec3.from_array(dirs), arrays)
    t = np.asarray(res.t)
    idx = np.asarray(res.obj_idx)
    hit = np.asarray(res.hit)

    ip = Vec3.from_array(origins) + Vec3.from_array(dirs) * np.where(hit, t, 0.0).astype(F)
    n = surface_normal(ip, res.obj_idx, arrays)
    nx, ny, nz = np.asarray(n.x), np.asarray(n.y), np.asarray(n.z)

    checked = 0
    for k in range(len(origins)):
        if not hit[k]:
            continue
        ip_k = (origins[k] + dirs[k] * t[k]).astype(F)
        want = orc._normal(int(idx[k]), ip_k)
        got = np.array([nx[k], ny[k], nz[k]], dtype=F)
        assert np.allclose(got, want, atol=2e-5), (k, got, want)
        checked += 1
    assert checked > 50  # sanity: enough hits exercised


def test_empty_scene_misses():
    scene = presets.default_scene()
    for o in scene.objects:
        o.hidden = True
    arrays, config = flatten_scene(scene)
    origins, dirs = _random_rays(8, seed=4)
    res = trace(Vec3.from_array(origins), Vec3.from_array(dirs), arrays)
    assert not np.any(np.asarray(res.hit))
