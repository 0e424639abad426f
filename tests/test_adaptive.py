"""Variance-adaptive sampling on the free-running persist kernel.

Host-side design: after every launch, a jitted update reduces the
radiance accumulator to per-lane luminance, treats the launch's
per-frame mean as one weighted Welford sample, and sets a stop mask for
converged lanes (standard error of the mean under rtol*|mean| + atol,
at least ``min_frames`` frames and two launch samples). The kernel's
only change is that the restart gate reads the mask, so a stopped lane
finishes its in-flight frame and idles; its pixel's average divides by
its own completed count. Stops are therefore launch-granular — the
statistics (and so WHICH launch a pixel stops at) depend on the budget
partitioning, unlike the rejected in-kernel per-frame design
(PARITY.md round-3 adaptive ledger).

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
    """rtol=0, atol=0: the convergence test can never pass (strict
    squared comparison), so the stop mask stays zero, every lane renders
    all n_frames, and the image is BIT-identical to the non-adaptive
    free-running render (the mask-gated kernel's arithmetic is
    untouched)."""
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


def test_adaptive_huge_tol_stops_after_two_launches():
    """An infinite tolerance converges every pixel at its first possible
    test: two launch samples (j >= 2) with at least min_frames completed.
    With a small budget (~2 frames of bounce iterations per launch) every
    lane must stop well short of the 32-frame cap, and no lane may stop
    below min_frames."""
    arrays, config, obj_types, ht, he = _setup(iters=32)
    rgb, info = render_persistent(
        arrays, config, obj_types, n_frames=32, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=10, adaptive=(3, 1e9, 1e9),
    )
    assert info["min_counts"] >= 3
    assert info["max_counts"] < 32
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
        ring_slots=0, budget=24,
    )
    adap, info = render_persistent(
        arrays, config, obj_types, n_frames=48, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=24, adaptive=(4, 0.05, 1e-4),
    )
    # some pixels must stop early, and the early stops must save work
    assert info["min_counts"] < 48
    assert info["mean_counts"] < 48
    full_a, adap_a = np.asarray(full), np.asarray(adap)
    scale = max(1.0, float(np.abs(full_a).max()))
    rel = np.abs(adap_a - full_a).max() / scale
    assert rel < 0.5
    assert np.isfinite(adap_a).all()


def test_adaptive_full_count_pixels_bit_match_fixed():
    """A pixel that never stops renders exactly the frames the fixed
    render does — same RNG streams (elementwise in px/py/frame/bounce),
    same per-iteration accumulation order — so its RGB must be
    BIT-equal to the fixed render's. This pins the estimator: adaptive
    stopping may only change WHICH frames a pixel averages, never the
    frames themselves."""
    arrays, config, obj_types, ht, he = _setup(iters=48)
    full, _ = render_persistent(
        arrays, config, obj_types, n_frames=48, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=24,
    )
    adap, info = render_persistent(
        arrays, config, obj_types, n_frames=48, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=24, adaptive=(4, 0.05, 1e-4),
    )
    counts = info["counts"].reshape(config.height, config.width)
    fullc = counts == 48
    assert fullc.any()  # cornell's noisy pixels exhaust a 48-frame cap
    full_a, adap_a = np.asarray(full), np.asarray(adap)
    assert (full_a[fullc] == adap_a[fullc]).all()


def test_adapt_update_weighted_welford_math():
    """The between-launch update implements West's weighted incremental
    mean/M2 over launch aggregates: feed a synthetic lane three launches
    of known per-frame luminances and check mean, M2 and the stop
    decision against a direct numpy evaluation."""
    import jax.numpy as jnp

    from spectral_tpu.render.pallas_integrator import _adapt_update_fn

    rng = np.random.default_rng(7)
    # one row of 128 lanes; lane i completes c[j, i] frames in launch j
    # with per-frame luminance samples drawn i.i.d. per lane
    n_l = 128
    counts = np.array([[3] * n_l, [4] * n_l, [5] * n_l])
    per_frame = rng.gamma(2.0, 1.0, size=(12, n_l)).astype(np.float32)

    minf, rtol, atol = 2, 0.25, 1e-6
    upd = _adapt_update_fn(n_l, minf, rtol, atol)

    stop = jnp.zeros((1, n_l), jnp.float32)
    stats = [jnp.zeros((1, n_l), jnp.float32) for _ in range(5)]
    cum = np.zeros(n_l, np.float32)
    done = np.zeros(n_l, np.int64)
    # reference weighted Welford (West 1979), per lane — a stopped lane
    # freezes its statistics (and its frame counter, since the real
    # kernel stops restarting it), exactly like the jitted update
    w_mean = np.zeros(n_l)
    w_m2 = np.zeros(n_l)
    w_tot = np.zeros(n_l)
    w_j = np.zeros(n_l)
    stopped = np.zeros(n_l, bool)
    for j in range(3):
        c = np.where(stopped, 0, counts[j])
        lo = done.max()  # shared sample stream; per-lane slice by count
        new_sum = per_frame[lo:lo + counts[j, 0]].sum(axis=0)
        cum = cum + np.where(stopped, 0.0, new_sum)
        done = done + c
        live = ~stopped
        x = np.where(live, new_sum / np.maximum(c, 1), 0.0)
        w_new = w_tot + c
        delta = x - w_mean
        w_mean = np.where(live, w_mean + (c / np.maximum(w_new, 1)) * delta,
                          w_mean)
        w_m2 = np.where(live, w_m2 + c * delta * (x - w_mean), w_m2)
        w_tot = np.where(live, w_new, w_tot)
        w_j = np.where(live, w_j + 1, w_j)
        sigma2 = w_m2 / np.maximum(w_j - 1, 1)
        stderr2 = sigma2 / np.maximum(done, 1)
        thresh = rtol * np.abs(cum / np.maximum(done, 1)) + atol
        stopped |= live & (w_j >= 2) & (done >= minf) & (
            stderr2 < thresh * thresh
        )
        # the jitted update sees the cumulative accumulator state; a
        # stopped lane's accumulator and frame counter no longer move
        rad = jnp.asarray(cum.reshape(1, 1, n_l))  # s_dim == 1
        fid = jnp.asarray((done - 1).reshape(1, n_l).astype(np.uint32))
        alive = jnp.zeros((1, n_l), jnp.float32)  # dead = frame complete
        stop, *stats, n_work = upd(
            rad, fid, alive, stop, *stats, jnp.uint32(1000)
        )
        np.testing.assert_allclose(
            np.asarray(stats[2]).ravel(), w_mean, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(stats[3]).ravel(), w_m2, rtol=1e-3, atol=1e-4
        )
        assert (np.asarray(stop).ravel() > 0.0).tolist() == stopped.tolist()
    assert stopped.any() and not stopped.all()


def test_adaptive_compaction_is_bit_exact():
    """Launch-boundary lane compaction relabels which TILE computes a
    pixel and nothing else: with and without it, images and per-pixel
    counts are bit-identical. The tiny budget (< one frame of bounce
    iterations) staggers each lane's frame completions, so stops arrive
    in waves and the repack actually fires mid-render."""
    arrays, config, obj_types, ht, he = _setup(iters=16)
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=3, adaptive=(2, 1e9, 1e9),
    )
    plain, info_p = render_persistent(
        arrays, config, obj_types, n_frames=16, tile=128, compact=False,
        **kw,
    )
    packed, info_c = render_persistent(
        arrays, config, obj_types, n_frames=16, tile=128, compact=True,
        **kw,
    )
    assert info_p["compactions"] == 0
    assert info_c["compactions"] >= 1
    assert (np.asarray(plain) == np.asarray(packed)).all()
    assert (info_p["counts"] == info_c["counts"]).all()


def test_adapt_update_skips_partial_frame_launches():
    """A launch in which a lane completes ZERO frames must not move any
    of its statistics OR its snapshots: the in-flight frame's radiance
    stays in the accumulator delta so the frame's FULL luminance lands
    in the next real sample (small budgets would otherwise sample only
    frame tails and underestimate the per-frame variance)."""
    import jax.numpy as jnp

    from spectral_tpu.render.pallas_integrator import _adapt_update_fn

    upd = _adapt_update_fn(128, 2, 0.1, 1e-3)

    def call(lum_total, fid, alive, stop, stats):
        rad = jnp.full((1, 1, 128), lum_total, jnp.float32)
        fid_a = jnp.full((1, 128), fid, jnp.uint32)
        alive_a = jnp.full((1, 128), alive, jnp.float32)
        return upd(rad, fid_a, alive_a, stop, *stats, jnp.uint32(100))

    stop = jnp.zeros((1, 128), jnp.float32)
    stats = [jnp.zeros((1, 128), jnp.float32) for _ in range(5)]
    # launch 1: frames 0-1 complete (dead), total luminance 4.0
    stop, *out = call(4.0, fid=1, alive=0.0, stop=stop, stats=stats)
    stats1 = [np.asarray(a) for a in out[:5]]
    # launch 2: mid-frame 2 (alive, fid=2, cnt still 2) — radiance grew
    stop, *out = call(6.0, fid=2, alive=1.0, stop=stop, stats=out[:5])
    stats2 = [np.asarray(a) for a in out[:5]]
    for a, b in zip(stats1, stats2):
        assert (a == b).all()  # nothing moved, snapshots included
    # launch 3: frame 2 completes with total 7.0 — the sample must be
    # the FULL frame (7.0 - 4.0), not just the post-launch-2 tail (1.0)
    stop, *out = call(7.0, fid=2, alive=0.0, stop=stop, stats=out[:5])
    mean = np.asarray(out[2]).ravel()
    # weighted mean of samples (2.0 w=2, 3.0 w=1) = (4 + 3) / 3
    np.testing.assert_allclose(mean, 7.0 / 3.0, rtol=1e-6)


def test_adaptive_requires_free_running():
    arrays, config, obj_types, ht, he = _setup()
    with pytest.raises(ValueError):
        render_persistent(
            arrays, config, obj_types, n_frames=8, tile=256,
            interpret=True, has_transmission=ht, has_emission=he,
            ring_slots=4, budget=16, adaptive=(2, 0.1, 0.0),
        )
