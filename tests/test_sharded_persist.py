"""Row-sharded persistent (lane-asynchronous) rendering over a mesh.

Each device owns its row slab's carried lane state; restart raygen is
in-kernel and elementwise in the lanes' GLOBAL pixel coordinates, so the
only cross-device traffic is one pmin scalar per launch. Tests follow
the other sharded-step tests' convention: one bounce and a 1e-4
envelope, because the single-device and sharded renders are different
XLA programs whose fusion ulps would roll the un-offset diffuse
self-intersection coin at deeper bounces (documented chaos envelope).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.parallel.mesh import make_mesh
from spectral_tpu.parallel.sharding import render_persistent_sharded
from spectral_tpu.render.pallas_integrator import render_persistent
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene


def _setup(w=16, h=16, bounces=1, samples=8, iters=8):
    scene = presets.PRESETS["cornell"](n_samples=samples)
    scene.width, scene.height = w, h
    scene.nbr_of_ray_bounces = bounces
    scene.nbr_of_iterations = iters
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    return arrays, config, obj_types, ht, he


def test_sharded_persist_matches_single_device():
    """8-way row-sharded persist == single-device persist (1e-4): global
    pixel coordinates, per-shard padding, the pmin scheduler and the
    slab-major unpack all have to line up for this to hold."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    arrays, config, obj_types, ht, he = _setup()
    want, info_w = render_persistent(
        arrays, config, obj_types, n_frames=4, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=12,
    )
    mesh = make_mesh(8)
    got, info = render_persistent_sharded(
        arrays, config, obj_types, mesh, n_frames=4, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        budget=12,
    )
    assert info["n_devices"] == 8
    assert got.shape == want.shape
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-4


def test_sharded_persist_adaptive_stops():
    """Adaptive stopping composes with sharding: an infinite tolerance
    stops every lane at its first two-launch test, well short of the
    cap, and the counts come back in global pixel order."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    arrays, config, obj_types, ht, he = _setup(iters=16)
    rgb, info = render_persistent_sharded(
        arrays, config, obj_types, make_mesh(8), n_frames=16, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        budget=4, adaptive=(3, 1e9, 1e9),
    )
    assert info["min_counts"] >= 3
    assert info["max_counts"] < 16
    assert info["counts"].shape == (config.width * config.height,)
    assert np.isfinite(np.asarray(rgb)).all()


def test_sharded_compaction_is_bit_exact():
    """Shard-local lane compaction (block-diagonal repack, zero
    collectives) relabels which tile computes a pixel and nothing else:
    with and without it, sharded adaptive images and counts are
    bit-identical, and the tiny budget staggers stops so the repack
    actually fires."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    arrays, config, obj_types, ht, he = _setup(w=16, h=16, bounces=4,
                                               iters=16)
    mesh = make_mesh(8)
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        budget=3, adaptive=(2, 1e9, 1e9), tile=128,
    )
    plain, info_p = render_persistent_sharded(
        arrays, config, obj_types, mesh, n_frames=16, compact=False, **kw,
    )
    packed, info_c = render_persistent_sharded(
        arrays, config, obj_types, mesh, n_frames=16, compact=True, **kw,
    )
    assert info_p["compactions"] == 0
    assert info_c["compactions"] >= 1
    assert (np.asarray(plain) == np.asarray(packed)).all()
    assert (info_p["counts"] == info_c["counts"]).all()


def test_renderer_sharded_persist():
    """Renderer(persist=True, sharding=...) routes to the sharded persist
    render and matches the unsharded persist Renderer (1e-4, 1 bounce)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from spectral_tpu.parallel.mesh import row_sharding
    from spectral_tpu.render.renderer import Renderer

    scene = presets.PRESETS["cornell"](n_samples=8)
    scene.width, scene.height = 16, 16
    scene.nbr_of_ray_bounces = 1
    scene.nbr_of_iterations = 4
    want = Renderer(
        scene, persist=True, persist_budget=12, _interpret=True,
    ).render()
    r = Renderer(
        scene, persist=True, _interpret=True,  # default budget: cost probe
        sharding=row_sharding(make_mesh(8)),
    )
    got = r.render()
    assert r.persist_info["n_devices"] == 8
    assert r.persist_info["budget"] >= 8
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-4


def test_sharded_persist_validates_height():
    arrays, config, obj_types, ht, he = _setup(h=12)  # 12 % 8 != 0
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    with pytest.raises(ValueError):
        render_persistent_sharded(
            arrays, config, obj_types, make_mesh(8), n_frames=2,
            interpret=True, has_transmission=ht, has_emission=he,
            budget=8,
        )


def test_sharded_persist_abort_drains_and_refuses_checkpoint():
    """An aborted sharded persist render drains its in-flight paths (the
    returned image is finite and positive, not a partial-path-biased
    buffer) and save_checkpoint refuses with a message naming the
    sharded-persist limitation (the CLI skips its auto-checkpoint on
    this path instead of crashing)."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from spectral_tpu.parallel.mesh import row_sharding
    from spectral_tpu.render.renderer import Renderer

    scene = presets.PRESETS["cornell"](n_samples=8)
    scene.width, scene.height = 16, 16
    scene.nbr_of_ray_bounces = 2
    scene.nbr_of_iterations = 6
    r = Renderer(
        scene, persist=True, persist_budget=2, _interpret=True,
        sharding=row_sharding(make_mesh(8)),
    )
    got = r.render(abort=lambda: True)
    assert r.persist_info["aborted"]
    g = np.asarray(got)
    assert np.isfinite(g).all() and g.max() > 0.0
    with pytest.raises(ValueError, match="sharded persist"):
        r.save_checkpoint("/tmp/never_written.npz")
