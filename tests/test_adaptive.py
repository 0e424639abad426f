"""Variance-adaptive sampling on the free-running persist kernel.

Each lane tracks its pixel's running luminance mean and per-frame
variance; once the standard error of the mean falls inside the
tolerance (and at least ``min_frames`` rendered), the lane stops
restarting and the tile retires early. Stopping is evaluated one frame
late by design (the convergence test needs the completed frame's
luminance, which is only known after shading — the restart gate reads
the PREVIOUS test's flag), so a converged pixel renders at most one
extra frame, which is included in its average.

Interpret mode is slow, so scenes here are tiny.
"""

import numpy as np
import pytest

from spectral_tpu.render.pallas_integrator import render_persistent
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene


def _setup(w=32, h=24, bounces=4, samples=8, iters=64):
    scene = presets.PRESETS["cornell"](n_samples=samples)
    scene.width, scene.height = w, h
    scene.nbr_of_ray_bounces = bounces
    scene.nbr_of_iterations = iters
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    return arrays, config, obj_types, ht, he


def test_adaptive_zero_tol_matches_plain_persist():
    """rtol=0, atol=0: the convergence test can never pass, so every
    lane renders all n_frames and the image is BIT-identical to the
    non-adaptive free-running render (the adaptive kernel carries extra
    planes but the path arithmetic is untouched)."""
    arrays, config, obj_types, ht, he = _setup()
    plain, _ = render_persistent(
        arrays, config, obj_types, n_frames=6, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64,
    )
    adap, info = render_persistent(
        arrays, config, obj_types, n_frames=6, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64, adaptive=(2, 0.0, 0.0),
    )
    assert (np.asarray(plain) == np.asarray(adap)).all()
    assert info["min_counts"] == 6 and info["max_counts"] == 6


def test_adaptive_huge_tol_stops_at_min_frames_plus_lag():
    """An infinite tolerance converges every pixel at its first test
    (count == min_frames); the one-frame evaluation lag means each lane
    renders at most min_frames + 1 frames."""
    arrays, config, obj_types, ht, he = _setup(iters=32)
    rgb, info = render_persistent(
        arrays, config, obj_types, n_frames=32, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64, adaptive=(3, 1e9, 1e9),
    )
    assert 3 <= info["min_counts"] <= 4
    assert info["max_counts"] <= 4
    assert np.isfinite(np.asarray(rgb)).all()


def test_adaptive_counts_vary_and_image_is_close():
    """A moderate tolerance stops smooth pixels early while noisy ones
    keep sampling; the adaptive image must stay close to the full
    fixed-count render (it IS an average of each pixel's completed
    frames — a valid estimator, just with per-pixel counts)."""
    arrays, config, obj_types, ht, he = _setup(iters=48)
    full, _ = render_persistent(
        arrays, config, obj_types, n_frames=48, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=96,
    )
    adap, info = render_persistent(
        arrays, config, obj_types, n_frames=48, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=96, adaptive=(4, 0.05, 1e-4),
    )
    # some pixels must stop early, and the early stops must save work
    assert info["min_counts"] < 48
    assert info["mean_counts"] < 48
    full_a, adap_a = np.asarray(full), np.asarray(adap)
    scale = max(1.0, float(np.abs(full_a).max()))
    # adaptive pixels that ran all 48 frames are bit-equal; early-stopped
    # ones differ by at most their own Monte-Carlo noise envelope
    rel = np.abs(adap_a - full_a).max() / scale
    assert rel < 0.5
    assert np.isfinite(adap_a).all()


def test_adaptive_launch_split_invariant():
    """Budget partitioning must not change WHICH frame a lane stops at:
    the convergence test runs at frame completions with carried
    statistics, independent of launch boundaries."""
    arrays, config, obj_types, ht, he = _setup(iters=32)
    imgs, counts = [], []
    for budget in (13, 96):
        rgb, info = render_persistent(
            arrays, config, obj_types, n_frames=32, tile=256,
            interpret=True, has_transmission=ht, has_emission=he,
            ring_slots=0, budget=budget, adaptive=(4, 0.05, 1e-4),
        )
        imgs.append(np.asarray(rgb))
        counts.append((info["min_counts"], info["max_counts"]))
    assert (imgs[0] == imgs[1]).all()
    assert counts[0] == counts[1]


def test_adaptive_requires_free_running():
    arrays, config, obj_types, ht, he = _setup()
    with pytest.raises(ValueError):
        render_persistent(
            arrays, config, obj_types, n_frames=8, tile=256,
            interpret=True, has_transmission=ht, has_emission=he,
            ring_slots=4, budget=16, adaptive=(2, 0.1, 0.0),
        )
