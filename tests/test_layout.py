"""Morton pixel->lane layout (render/layout.py): permutation validity,
block structure, and bit-identical rendering through the regen kernel's
lane_perm contract."""

import numpy as np

from spectral_tpu.render.layout import morton_layout


def test_is_permutation_and_inverse():
    perm, inv = morton_layout(37, 21)  # non-power-of-two, W != H
    p = np.asarray(perm)
    i = np.asarray(inv)
    n = 37 * 21
    assert sorted(p.tolist()) == list(range(n))
    np.testing.assert_array_equal(p[i], np.arange(n))


def test_aligned_chunks_are_square_blocks():
    w = h = 256
    perm, _ = morton_layout(w, h)
    p = np.asarray(perm)
    # every aligned 4096-lane tile covers exactly one 64x64 pixel block
    for t in range(0, w * h, 4096):
        xs = p[t:t + 4096] % w
        ys = p[t:t + 4096] // w
        assert xs.max() - xs.min() == 63
        assert ys.max() - ys.min() == 63
    # and every aligned 1024-lane sub-group a 32x32 block
    xs = p[:1024] % w
    ys = p[:1024] // w
    assert xs.max() - xs.min() == 31 and ys.max() - ys.min() == 31


def test_regen_kernel_bit_identical_under_morton(monkeypatch):
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    sc = presets.default_scene()
    sc.width, sc.height = 40, 26
    sc.nbr_of_ray_bounces = 3
    sc.nbr_of_iterations = 4
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    base = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        )
    )
    perm, inv = morton_layout(config.width, config.height)
    got = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            lane_perm=perm, lane_inv=inv,
        )
    )
    np.testing.assert_array_equal(base, got)
