"""Persistent lane-asynchronous regeneration (interpret mode on CPU).

``render_persistent`` must be BIT-exact against fixed-window regeneration
(``integrate_frames_pallas_regen``): both accumulate each pixel's frames
in ascending order from the same host-precomputed primary directions and
the same per-lane (frame, bounces_left) RNG counters, so the per-pixel
sums are identical f32 sequences. Tests force the hard scheduler regimes:
multi-launch progress, a tiny ring (lanes stall waiting for `lead`), and
a budget smaller than one frame's bounce count.

Eager refill (``jit_refill=False``) is used throughout: a jitted refill
compiles raygen in a different program and lands ulps away, flipping the
un-offset diffuse self-intersection coin (the documented cross-program
FMA effect) — both are valid estimators, but only eager refill is
comparable bit-for-bit with the regen path's eager raygen.

Interpret mode is slow, so scenes here are tiny.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.render.pallas_integrator import (
    integrate_frame_pallas,
    integrate_frames_pallas_regen,
    render_persistent,
)
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene


def _setup(w=32, h=24, bounces=4, samples=8):
    scene = presets.PRESETS["cornell"](n_samples=samples)
    scene.width, scene.height = w, h
    scene.nbr_of_ray_bounces = bounces
    scene.nbr_of_iterations = 8
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    return arrays, config, obj_types, ht, he


def _regen_mean(arrays, config, obj_types, ht, he, n_frames, tile):
    s = integrate_frames_pallas_regen(
        arrays, config, jnp.uint32(0), obj_types, n_frames,
        tile=tile, interpret=True, has_transmission=ht, has_emission=he,
    )
    return np.asarray(s) / n_frames


@pytest.mark.parametrize(
    "ring,budget",
    [
        (4, 13),   # tiny ring: lanes stall on `lead`, many launches
        (8, 64),   # budget > frames*bounces: single launch does it all
    ],
)
def test_persist_bitexact_vs_regen(ring, budget):
    arrays, config, obj_types, ht, he = _setup()
    n_frames = 6
    want = _regen_mean(arrays, config, obj_types, ht, he, n_frames, tile=256)
    got, info = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=ring, budget=budget, jit_refill=False,
    )
    assert info["frames_done"] >= n_frames
    assert (np.asarray(got) == want).all()


def test_persist_single_frame():
    """n_frames=1: the ring is never consulted (no restarts owed);
    compare against the monolithic per-frame kernel (regen needs k>=2)."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    want = np.asarray(integrate_frame_pallas(
        arrays, config, np.uint32(0), obj_types, tile=128, interpret=True,
        has_transmission=ht, has_emission=he,
    ))
    got, info = render_persistent(
        arrays, config, obj_types, n_frames=1, tile=128,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=2, budget=5, jit_refill=False,
    )
    assert (np.asarray(got) == want).all()


def test_persist_abort_returns_partial_average():
    """Aborting after the first launch yields the per-pixel average of
    each pixel's COMPLETED frames — finite, non-black, and within the
    radiance range of the full render (a valid estimator, unlike a
    partially-summed un-normalized buffer)."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return calls["n"] >= 2

    got, info = render_persistent(
        arrays, config, obj_types, n_frames=32, tile=128,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=4, budget=7, jit_refill=False, should_abort=abort,
    )
    assert info["aborted"]
    g = np.asarray(got)
    assert np.isfinite(g).all()
    assert g.max() > 0.0
    full = _regen_mean(arrays, config, obj_types, ht, he, 4, tile=128)
    assert g.max() <= 4.0 * max(full.max(), 1.0)


def test_persist_free_running_launch_split_invariant():
    """Free-running persist (ring_slots=0, in-kernel restart raygen):
    different per-launch budgets partition the same deterministic
    iteration stream, so the rendered image must be BIT-identical across
    launch splits (single-launch vs many tiny launches)."""
    arrays, config, obj_types, ht, he = _setup()
    imgs = []
    for budget in (11, 64):
        rgb, info = render_persistent(
            arrays, config, obj_types, n_frames=6, tile=256,
            interpret=True, has_transmission=ht, has_emission=he,
            ring_slots=0, budget=budget,
        )
        assert info["frames_done"] >= 6
        imgs.append(np.asarray(rgb))
    assert (imgs[0] == imgs[1]).all()


def test_persist_free_running_within_coinflip_envelope():
    """Free-running restarts recompute raygen in-kernel, landing FMA-ulps
    from the host primaries the regen path uses — which flips the
    un-offset diffuse self-intersection coin on a bounded share of paths
    (the documented reference-chaos envelope). Over 6 averaged frames
    (5 restart frames at ~11%/frame independent flip odds) roughly 20%
    of pixels diverge (measured 160/768); the envelope below allows 50%.
    A raygen logic bug (wrong jitter, wrong basis column) would flip
    essentially every pixel — frame 0 alone caps divergence at ~1/6 of
    each pixel's value, nowhere near the bound."""
    arrays, config, obj_types, ht, he = _setup()
    n_frames = 6
    want = _regen_mean(arrays, config, obj_types, ht, he, n_frames, tile=256)
    got, _ = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64,
    )
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(np.asarray(got) - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.5 * err.size
    assert (err <= 1e-3).sum() >= 0.5 * err.size


def test_persist_cost_sort_is_pure_relabeling():
    """cost_sort permutes pixels into tiles by probed cost; every
    per-pixel quantity (raygen, RNG streams) is elementwise in (px, py),
    so the rendered image must be BIT-identical to the unsorted
    free-running render."""
    arrays, config, obj_types, ht, he = _setup()
    plain, _ = render_persistent(
        arrays, config, obj_types, n_frames=6, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64,
    )
    sorted_, info = render_persistent(
        arrays, config, obj_types, n_frames=6, tile=256,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=64, cost_sort=2,
    )
    assert (np.asarray(plain) == np.asarray(sorted_)).all()


def test_persist_progress_monotonic():
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    seen = []
    render_persistent(
        arrays, config, obj_types, n_frames=5, tile=128,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=4, budget=9, jit_refill=False,
        progress=lambda done, launches: seen.append((done, launches)),
    )
    dones = [d for d, _ in seen]
    assert dones == sorted(dones)
    launches = [l for _, l in seen]
    assert launches == list(range(1, len(launches) + 1))


def test_persist_preview_closure_matches_final():
    """The per-launch preview closure materializes the same estimator the
    final image uses; at the LAST launch (all frames done) it must equal
    the returned image bit-for-bit, and every preview is finite."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    previews = []

    def preview(make_rgb):
        previews.append(np.asarray(make_rgb()))

    rgb, info = render_persistent(
        arrays, config, obj_types, n_frames=5, tile=128,
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=6, preview=preview,
    )
    assert len(previews) == info["launches"]
    for p in previews:
        assert p.shape == np.asarray(rgb).shape
        assert np.isfinite(p).all()
    assert (previews[-1] == np.asarray(rgb)).all()


def test_persist_abort_resume_bit_identical():
    """Abort after two launches, capture the carried state, resume: the
    final image is BIT-identical to an uninterrupted render — the saved
    state sits at a launch boundary and the same budget partitions the
    same iteration sequence (launch-split invariance, tested above)."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=4, tile=128,
    )
    full, _ = render_persistent(
        arrays, config, obj_types, n_frames=8, **kw)

    def abort():
        return True  # first poll: abort after one launch

    part, info = render_persistent(
        arrays, config, obj_types, n_frames=8, should_abort=abort,
        return_state=True, **kw)
    assert info["aborted"] and info["frames_done"] < 8
    resumed, info2 = render_persistent(
        arrays, config, obj_types, n_frames=8,
        resume_state=info["resume_state"], **kw)
    assert not info2["aborted"]
    assert (np.asarray(resumed) == np.asarray(full)).all()


def test_persist_adaptive_abort_resume_bit_identical():
    """Resuming an aborted ADAPTIVE render restores the convergence
    statistics, stop mask and compaction slot map, so the continued
    render makes the same stop decisions as the uninterrupted one."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=3, tile=128, adaptive=(2, 1e9, 1e9),
    )
    full, info_f = render_persistent(
        arrays, config, obj_types, n_frames=16, **kw)

    def abort():
        return True  # first poll: abort after one launch

    part, info = render_persistent(
        arrays, config, obj_types, n_frames=16, should_abort=abort,
        return_state=True, **kw)
    assert info["aborted"]
    resumed, info2 = render_persistent(
        arrays, config, obj_types, n_frames=16,
        resume_state=info["resume_state"], **kw)
    assert (np.asarray(resumed) == np.asarray(full)).all()
    assert (info2["counts"] == info_f["counts"]).all()


def test_persist_resume_rejects_mismatched_run():
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=7, tile=128,
    )
    _, info = render_persistent(
        arrays, config, obj_types, n_frames=6, return_state=True, **kw)
    with pytest.raises(ValueError, match="6-frame"):
        render_persistent(
            arrays, config, obj_types, n_frames=12,
            resume_state=info["resume_state"], **kw)
    with pytest.raises(ValueError, match="adaptive"):
        render_persistent(
            arrays, config, obj_types, n_frames=6, adaptive=(2, 0.1, 0.0),
            resume_state=info["resume_state"], **kw)


def test_renderer_persist_checkpoint_roundtrip(tmp_path):
    """Renderer-level persist checkpointing: abort mid-render, save, load
    into a FRESH renderer, resume — bit-identical to uninterrupted, and
    the checkpoint refuses wrong-kind and wrong-settings consumers."""
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets as _presets

    def make_scene():
        scene = _presets.PRESETS["cornell"](n_samples=8)
        scene.width, scene.height = 16, 8
        scene.nbr_of_ray_bounces = 3
        scene.nbr_of_iterations = 8
        return scene

    kw = dict(persist=True, persist_budget=4, _interpret=True)
    want = Renderer(make_scene(), **kw).render()

    r1 = Renderer(make_scene(), **kw)
    r1.render(abort=lambda: True)  # aborts after the first launch
    assert r1.persist_info["aborted"]
    path = tmp_path / "persist.ckpt.npz"
    r1.save_checkpoint(path)

    r2 = Renderer(make_scene(), **kw)
    r2.load_checkpoint(path)
    got = r2.render()
    assert not r2.persist_info["aborted"]
    assert (np.asarray(got) == np.asarray(want)).all()

    # wrong kind: a non-persist renderer must refuse the persist file
    with pytest.raises(ValueError, match="persist=True"):
        Renderer(make_scene()).load_checkpoint(path)
    # wrong settings: adaptive mismatch is refused
    with pytest.raises(ValueError, match="adaptive"):
        Renderer(
            make_scene(), adaptive=(2, 0.1, 0.0), **kw
        ).load_checkpoint(path)


def test_persist_abort_drain_completes_in_flight_paths():
    """An aborted image must contain NO partial-path radiance: the abort
    drain (end=0 launches) walks every in-flight path to its terminal
    hit first, so each pixel is EXACTLY the mean of its first
    ``counts[p]`` frames. Verified bit-for-bit: every pixel of an
    immediately-aborted 2-frame render equals the same pixel of a full
    1-frame or full 2-frame render according to its completed count
    (pre-drain, mid-path lanes left partial bounce contributions in the
    numerator over a completed-frame divisor — an upward bias)."""
    arrays, config, obj_types, ht, he = _setup(w=16, h=8, bounces=3)
    # zero tolerances never stop a lane, so 'adaptive' only exposes the
    # per-pixel completed counts; budget=1 maximizes mid-path aborts
    kw = dict(
        interpret=True, has_transmission=ht, has_emission=he,
        ring_slots=0, budget=1, tile=128, adaptive=(2, 0.0, 0.0),
    )
    full1, _ = render_persistent(
        arrays, config, obj_types, n_frames=1, **kw)
    full2, _ = render_persistent(
        arrays, config, obj_types, n_frames=2, **kw)

    got, info = render_persistent(
        arrays, config, obj_types, n_frames=2,
        should_abort=lambda: True, **kw)
    assert info["aborted"]
    counts = info["counts"].reshape(config.height, config.width)
    assert set(np.unique(counts)) <= {1, 2}
    g, f1, f2 = (np.asarray(a) for a in (got, full1, full2))
    assert (g[counts == 1] == f1[counts == 1]).all()
    assert (g[counts == 2] == f2[counts == 2]).all()
