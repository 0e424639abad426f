"""Progressive renderer: the orchestration layer.

TPU-native re-design of the reference's render thread (``App::render`` +
``dispatch_render``, reference ``src/main.rs:1280-1427``): the per-row
thread pool becomes one jit-compiled device step per progressive frame
(optionally sharded over a device mesh, see ``spectral_tpu.parallel``);
the mpsc progress/abort channels become per-frame host callbacks — the
same frame-granular cooperative abort the reference documents ("the
current frame will be finished").
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.render import image as image_mod
from spectral_tpu.render.integrator import render_frame_step
from spectral_tpu.scene.flatten import (
    RenderConfig,
    SceneArrays,
    flatten_scene,
    host_meta as _host_meta,
)
from spectral_tpu.scene.schema import Scene


@dataclasses.dataclass
class RenderProgress:
    """Per-frame progress report (the reference's ``AppActions`` updates,
    src/main.rs:1490-1506) plus first-class throughput counters
    (SURVEY.md §5: the reference only has wall-clock timing)."""

    frame_id: int
    total_frames: int
    elapsed_s: float
    pixels: int = 0
    n_samples: int = 0

    @property
    def fraction(self) -> float:
        return (self.frame_id + 1) / self.total_frames

    @property
    def seconds_per_frame(self) -> float:
        return self.elapsed_s / max(1, self.frame_id + 1)

    @property
    def mpaths_per_s(self) -> float:
        """Camera paths per second (millions)."""
        return self.pixels / max(self.seconds_per_frame, 1e-9) / 1e6

    @property
    def eta_s(self) -> float:
        done = self.fraction
        return self.elapsed_s / done * (1.0 - done) if done > 0 else float("inf")


@partial(jax.jit, static_argnums=(1,), donate_argnums=(2,))
def _step(scene: SceneArrays, config: RenderConfig, accum, frame_id):
    return render_frame_step(scene, config, accum, frame_id)


@partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
def _step_k(scene: SceneArrays, config: RenderConfig, accum, first_frame, k):
    """k progressive frames fused into one dispatch via ``lax.scan``.

    Bit-identical to k calls of ``_step`` (the scan body IS the per-frame
    step; the 1/(frame+1) blend happens inside it), but pays one dispatch
    instead of k. Measured on v5e (tools/multiframe_bench.py, cornell512):
    5.35 ms/frame per-frame dispatch -> 4.98-5.22 ms/frame at k=5..20 —
    the axon tunnel's per-dispatch latency is not fully hidden by async
    enqueue at ~5 ms frames."""
    def body(acc, i):
        return render_frame_step(scene, config, acc, first_frame + i), None

    accum, _ = jax.lax.scan(body, accum, jnp.arange(k, dtype=jnp.uint32))
    return accum


@partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8), donate_argnums=(2,))
def _step_pallas_k(
    scene: SceneArrays, config: RenderConfig, accum, first_frame, k,
    obj_types, has_transmission, has_emission, clusters=None,
):
    """Pallas-path twin of ``_step_k`` (see measured note there)."""
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas

    def body(acc, i):
        return render_frame_step_pallas(
            scene, config, acc, first_frame + i, obj_types,
            has_transmission=has_transmission, has_emission=has_emission,
            clusters=clusters,
        ), None

    accum, _ = jax.lax.scan(body, accum, jnp.arange(k, dtype=jnp.uint32))
    return accum


@partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9), donate_argnums=(2,))
def _step_regen(
    scene: SceneArrays, config: RenderConfig, accum, first_frame, k,
    obj_types, has_transmission, has_emission, interpret=False,
    clusters=None,
):
    """K progressive frames in ONE megakernel launch via in-kernel path
    regeneration (terminating lanes immediately start the same pixel's
    next frame). Same estimator up to f32 summation order; harvests the
    bounce loop's dead-lane tail. See integrate_frames_pallas_regen."""
    from spectral_tpu.render.pallas_integrator import (
        render_frames_step_pallas_regen,
    )

    return render_frames_step_pallas_regen(
        scene, config, accum, first_frame, obj_types, k,
        has_transmission=has_transmission, has_emission=has_emission,
        interpret=interpret, clusters=clusters,
    )


@partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 11), donate_argnums=(2,))
def _step_regen_sorted(
    scene: SceneArrays, config: RenderConfig, accum, first_frame, k,
    obj_types, has_transmission, has_emission, interpret,
    lane_perm, lane_inv, clusters=None,
):
    """Regeneration step with cost-sorted pixel->lane assignment: pixel
    ``lane_perm[p]`` rides wavefront lane ``p``, so systematically
    expensive pixels share tiles and cheap tiles retire early. Per-pixel
    bit-identical to ``_step_regen`` (pure relabeling — tested)."""
    from spectral_tpu.render.pallas_integrator import (
        render_frames_step_pallas_regen,
    )

    return render_frames_step_pallas_regen(
        scene, config, accum, first_frame, obj_types, k,
        has_transmission=has_transmission, has_emission=has_emission,
        interpret=interpret, lane_perm=lane_perm, lane_inv=lane_inv,
        clusters=clusters,
    )


@partial(jax.jit, static_argnums=(1, 5), donate_argnums=(2,))
def _step_grid(scene: SceneArrays, config: RenderConfig, accum, frame_id,
               grid, grid_static):
    return render_frame_step(
        scene, config, accum, frame_id, grid=grid, grid_static=grid_static
    )


@partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8), donate_argnums=(2,))
def _step_pallas(
    scene: SceneArrays, config: RenderConfig, accum, frame_id, obj_types,
    has_transmission, has_emission, interpret=False, clusters=None,
):
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas

    return render_frame_step_pallas(
        scene, config, accum, frame_id, obj_types,
        has_transmission=has_transmission, has_emission=has_emission,
        interpret=interpret, clusters=clusters,
    )


@partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7, 8, 9))
def _phased_rgb(
    scene: SceneArrays, config: RenderConfig, frame_id, obj_types,
    stages, has_transmission, has_emission, interpret, tile, clusters,
):
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_cascade,
    )

    return integrate_frame_pallas_cascade(
        scene, config, frame_id, obj_types, stages,
        interpret=interpret, tile=tile,
        has_transmission=has_transmission, has_emission=has_emission,
        clusters=clusters,
    )


@partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7, 8))
def _mono_rgb(
    scene: SceneArrays, config: RenderConfig, frame_id, obj_types,
    has_transmission, has_emission, interpret, tile, clusters,
):
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    return integrate_frame_pallas(
        scene, config, frame_id, obj_types, interpret=interpret, tile=tile,
        has_transmission=has_transmission, has_emission=has_emission,
        clusters=clusters,
    )


@partial(jax.jit, donate_argnums=(0,))
def _blend(accum, rgb, frame_id):
    from spectral_tpu.render.integrator import accumulate_frame

    return accumulate_frame(accum, rgb, frame_id)


# MEASURED AND REJECTED (v5e, 1000-sphere config): fusing the previous
# frame's resolve (lax.cond monolithic fallback) + blend + the current
# frame's phased trace into ONE jit program ran 702 ms/frame vs 124 ms for
# the two-program pipelined loop below — a lax.cond whose branch contains
# the monolithic megakernel degrades the whole program ~6x on this stack.
# The production design instead pipelines the overflow check one frame
# deep: by the time frame f-1's flag is read, frame f is already
# dispatched, so the host sync (which costs ~26 ms when done same-frame)
# is hidden behind device work.


def choose_stages(
    occ,
    n_pad: int,
    tile: int,
    margin: float = 1.7,
    extract_slope: float = 2.4,
    extract_const: float = 0.10,
    max_cap_frac: float = 0.25,
    max_stages: int = 3,
) -> tuple | None:
    """Pick cascade compaction stages from an occupancy profile.

    ``occ[b]`` is the fraction of lanes alive *entering* bounce ``b``
    (``occ[0] == 1``). Enumerates every split set of size <= ``max_stages``
    and minimizes modeled cost in full-wavefront bounce-equivalents: each
    segment costs ``capacity_fraction x n_bounces`` (dead lanes execute at
    full price inside a wavefront — the whole point), each extraction
    costs ``extract_slope x dest_fraction + extract_const``.

    The extraction model and the ``max_cap_frac`` ceiling are CALIBRATED
    ON v5e (tools/phased_bench.py, 1000-sphere config, full-wavefront
    bounce ~24.5 ms): extracting into a 1/8-capacity wavefront costs
    ~6.8 ms (0.28 units), but the cost grows super-linearly with
    capacity — an 11/16-capacity extraction measured ~165 ms, 24x the
    1/8 one, sinking every large-capacity cascade (mono 127 ms/frame vs
    casc[1,3] 270 ms with per-frame sync). Splits whose tile-rounded
    capacity exceeds ``max_cap_frac`` are therefore ineligible rather
    than merely penalized: the linear model is only trusted in the
    regime where it was measured. Capacities carry ``margin`` headroom
    over the observed occupancy (1/16 caps sized at ~1.06x measured
    occupancy overflowed every frame in the same sweep) and are rounded
    up to whole tiles. Returns ``((split, capacity_lanes), ...)`` or
    None when no split beats the monolithic kernel under the model.
    """
    from itertools import combinations

    occ = np.asarray(occ, np.float64)
    n_bounces = len(occ)

    def cap_lanes(b: int) -> int:
        want = min(1.0, float(occ[b]) * margin)
        return max(tile, int(np.ceil(want * n_pad / tile)) * tile)

    def cap_frac(b: int) -> float:
        return min(1.0, cap_lanes(b) / n_pad)

    def cost(splits: tuple) -> float:
        bounds = (0,) + splits + (n_bounces,)
        fracs = (1.0,) + tuple(cap_frac(s) for s in splits)
        total = sum(
            f * (hi - lo) for f, lo, hi in zip(fracs, bounds, bounds[1:])
        )
        total += sum(
            extract_slope * dest + extract_const for dest in fracs[1:]
        )
        return total

    best_splits: tuple = ()
    best_cost = float(n_bounces)  # monolithic
    candidates = [
        b for b in range(1, n_bounces) if cap_frac(b) <= max_cap_frac
    ]
    for k in range(1, max_stages + 1):
        for splits in combinations(candidates, k):
            # a split that doesn't shrink the wavefront only adds overhead
            fracs = [cap_frac(s) for s in splits]
            if any(b >= a for a, b in zip([1.0] + fracs, fracs)):
                continue
            c = cost(splits)
            if c < best_cost:
                best_cost, best_splits = c, splits
    if not best_splits:
        return None
    return tuple((s, cap_lanes(s)) for s in best_splits)


def scene_digest(arrays: SceneArrays, config: RenderConfig) -> str:
    """Content hash of a flattened scene snapshot + render config.

    Stored in checkpoints: two scenes that flatten to the same arrays
    render identically, so equal digests are exactly the resumable set.

    ``None`` and static (Python-scalar) fields hash a type-tagged repr,
    never ``np.asarray``: ``np.asarray(None)`` is a 0-d object array whose
    bytes are the interpreter's ``None`` pointer — different per process
    under ASLR, which silently refused every cross-process ``--resume``.
    (Digests produced by that scheme were process-unique and therefore
    never resumable anyway, so no migration path exists: old checkpoints
    get the explicit different-scene error.)"""
    import hashlib

    # fresh flatten_scene outputs carry bit-identical host numpy copies
    # (arrays.host.np_fields) — digesting those avoids one D2H readback
    # per field (the tunneled TPU platform can stall minutes on readback)
    np_fields = getattr(getattr(arrays, "host", None), "np_fields", {})

    h = hashlib.sha256()
    h.update(b"spectral_tpu-digest-v2:")
    h.update(repr(config).encode())
    for field in dataclasses.fields(arrays):
        v = getattr(arrays, field.name)
        h.update(field.name.encode())
        if v is None:
            h.update(b"<none>")
            continue
        if isinstance(v, (bool, int, float, str, tuple)):
            h.update(repr(v).encode())
            continue
        a = np.asarray(np_fields.get(field.name, v))
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _is_tpu_platform() -> bool:
    plat = jax.default_backend()
    return plat in ("tpu", "axon") or "tpu" in jax.devices()[0].platform.lower()


def resolve_backend(backend: str) -> str:
    """'auto' picks the Pallas megakernel on TPU (including the axon
    tunnel platform), the portable jnp path everywhere else — the Mosaic
    kernel neither compiles for GPU nor runs acceptably interpreted."""
    if backend == "auto":
        return "pallas" if _is_tpu_platform() else "jnp"
    if backend not in ("jnp", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "pallas" and not _is_tpu_platform():
        raise ValueError(
            "backend='pallas' requires a TPU (the Mosaic megakernel does "
            "not compile for CPU/GPU); use backend='auto' or 'jnp'"
        )
    return backend


class Renderer:
    """Progressive wavefront renderer for a single scene snapshot.

    The scene is flattened once at construction (the reference's uniforms
    snapshot); frames are then rendered one `1/(frame+1)`-blended
    iteration at a time, resumable at any frame boundary.

    ``backend``: 'jnp' (portable XLA path), 'pallas' (VMEM-resident
    megakernel, ~10x faster on TPU), or 'auto'.

    ``regen_frames`` defaults to 'auto' — the production in-kernel
    path-regeneration chunking (1.5-1.8x on TPU, same default as the
    CLI), which coarsens progress/abort/checkpoint granularity to
    ~100-frame chunks. Pass ``regen_frames=1`` for strict per-frame
    stepping (the reference's frame-granular semantics).
    """

    def __init__(
        self,
        scene: Scene,
        sharding: jax.sharding.NamedSharding | None = None,
        backend: str = "auto",
        accel: str = "auto",
        phase_split: int | None = None,
        phase_capacity: int | None = None,
        frames_per_dispatch: int = 1,
        regen_frames: "int | str" = "auto",
        regen_sort: bool | str = "auto",
        lane_layout: str = "auto",
        persist: bool = False,
        persist_budget: int | None = None,
        persist_frames_per_launch: int | None = None,
        adaptive: tuple | None = None,
        _interpret: bool = False,
        _phase_tile: int | None = None,
        _flattened: tuple | None = None,
        _scene_schedule: "Callable[[int], SceneArrays] | None" = None,
    ):
        import numpy as _np

        # NOTE: unlike the reference's dispatch (src/main.rs:1377), the
        # scene is NOT regenerated here — that would silently overwrite
        # hand-edited spectrum values and mutate the caller's scene.
        # validate() (inside flatten) still rejects sample-count mismatch;
        # call scene.update_all_spectrum_sample_sizes() explicitly after
        # changing the sample count (the CLI does).
        # ``_flattened``: a (SceneArrays, RenderConfig) pair the caller
        # already built for THIS scene (render_animation pre-flattens to
        # check config equality across frames) — skips re-flattening.
        if _flattened is not None:
            self.scene_arrays, self.config = _flattened
        else:
            self.scene_arrays, self.config = flatten_scene(scene)
        # ``_scene_schedule``: frame_id -> SceneArrays for renders whose
        # scene varies per progressive frame (motion blur — the shutter
        # integral sampled one time-point per frame, reference-style
        # screen-wide). Same shapes/config/object types as the base
        # scene; the caller guarantees it (render_animation does).
        self._scene_schedule = _scene_schedule
        # identity of the flattened snapshot: checkpoints carry it so a
        # resume against a DIFFERENT scene with the same dimensions is
        # refused instead of silently blending two unrelated renders
        self.scene_digest = scene_digest(self.scene_arrays, self.config)
        self.backend = resolve_backend(backend)
        # intersection backend. Measured verdict (see PARITY.md): the
        # dense/chunked brute force beats the uniform-grid DDA on both CPU
        # and TPU wavefronts (lockstep stepping + gather costs dominate),
        # so 'auto' always uses brute force; the grid stays available as a
        # validated opt-in on CPU. On the TPU its gather-heavy executions
        # run long enough to trip the worker watchdog, so it is refused.
        if accel not in ("auto", "none", "grid"):
            raise ValueError(f"unknown accel {accel!r}")
        if accel == "grid":
            if backend == "pallas":
                raise ValueError(
                    "accel='grid' runs on the jnp backend (the megakernel "
                    "is brute-force); drop backend='pallas' or accel='grid'"
                )
            if _is_tpu_platform():  # regardless of the requested backend
                raise ValueError(
                    "accel='grid' is CPU-only: its gather-heavy traversal "
                    "exceeds the TPU worker's execution limits (and dense "
                    "brute force is faster there anyway)"
                )
            self.backend = "jnp"  # the grid tracer lives on the jnp path
        use_grid = accel == "grid"
        self.grid = self.grid_static = None
        if use_grid and 3 in self.scene_arrays.obj_types_static:
            # OBJ_TRIANGLE: the grid's cell tests treat every non-sphere
            # as a slab box, but triangle rows reuse the slab columns
            # for Moller-Trumbore edges
            raise ValueError(
                "accel='grid' does not support mesh/triangle scenes; "
                "use the default dense path (triangles cluster-cull on "
                "the megakernel)"
            )
        if use_grid and self.config.n_objects > 0:
            from spectral_tpu.scene.accel import build_grid

            self.grid, self.grid_static = build_grid(self.scene_arrays)
        _host = _host_meta(self.scene_arrays)
        self.has_transmission = _host.has_transmission
        self.has_emission = _host.has_emission
        if (
            self.backend == "pallas"
            and self.config.n_objects > 64
            and not 0 < self.config.n_materials <= 256
        ):
            # many-object scenes use the kernel's fori object loop, which
            # selects materials by index: cost linear in the material count
            # (masks recomputed inline above 32 so VMEM stays flat), capped
            # at 256; beyond that, fall back to the chunked jnp path
            if backend == "pallas":
                raise ValueError(
                    "the pallas backend supports >64 objects only with at "
                    "most 256 distinct materials; use backend='jnp'"
                )
            import warnings

            warnings.warn(
                f"scene has {self.config.n_objects} objects and "
                f"{self.config.n_materials} materials: the Pallas megakernel"
                "'s many-object loop supports at most 256 materials, so "
                "this render falls back to the chunked jnp path (measured "
                "~30x slower on the 1000-sphere profile). Consolidate "
                "materials to stay on the megakernel.",
                stacklevel=3,
            )
            self.backend = "jnp"
        self.obj_types = tuple(_host.obj_type.tolist())
        # cluster-culled object loop for many-object scenes: Morton-sort
        # objects into 64-object clusters whose union AABB is pre-tested
        # per tile, skipping whole clusters no live ray can hit. Measured
        # on v5e (tools/cluster_bench.py + block_tile_bench.py,
        # 1000-sphere config): regeneration 78.4 -> 37.1 ms/frame (2.1x)
        # composing with the 8-wide member unroll; BIT-identical to brute
        # force (original-index tie rule). C=64 is the measured optimum
        # with the unrolled members (C=16/32/64/96 = 48.3/37.9/37.1/39.9).
        # accel='none' disables; small scenes use the unrolled loop anyway.
        self.clusters = None
        if (
            self.backend == "pallas"
            and self.config.n_objects > 64
            and accel != "none"
        ):
            from spectral_tpu.ops.pallas.megakernel import plan_clusters

            # camera_pos orders clusters front-to-back: near clusters
            # tighten t_best early so the relevance pre-test skips far
            # clusters (48.6 -> 48.2 ms/frame on the 1000-sphere config —
            # small but free; visit order never changes results)
            self.clusters = plan_clusters(
                _host.aabb_min,
                _host.aabb_max,
                self.obj_types,
                cluster_size=64,
                camera_pos=_host.cam_pos[:3],
            )
        self.sharding = sharding
        if sharding is not None:
            from spectral_tpu.parallel.sharding import shard_scene

            self.scene_arrays, self._accum_sharding = shard_scene(
                self.scene_arrays, sharding, self.config
            )
            if self.backend == "pallas":
                from spectral_tpu.parallel.sharding import build_sharded_pallas_step

                self._sharded_step = build_sharded_pallas_step(
                    sharding.mesh, self.config, self.obj_types,
                    interpret=_interpret,
                    has_transmission=self.has_transmission,
                    has_emission=self.has_emission,
                    clusters=self.clusters,
                )
        else:
            self._accum_sharding = None
        # phased (occupancy-compacted) rendering: bounces [0, split) on the
        # full wavefront, the surviving ~10% of lanes compacted for the
        # tail bounces. Measured 1.24x on the 1000-sphere config BEFORE
        # pipelining; the overflow check is pipelined one frame deep here
        # because a same-frame host sync costs ~26 ms/frame on v5e.
        # phase_split may be an int (one split), a tuple of ints (cascade),
        # or "auto" (occupancy-probe tuning, see _autotune_stages).
        self.phase_split = phase_split
        self.phase_capacity = phase_capacity
        self._interpret = _interpret
        self._phase_tile = _phase_tile
        self.overflow_frames = 0
        self._pending: tuple | None = None
        self.phase_stages: tuple | None = None
        if phase_split is not None:
            if self.backend != "pallas" and not _interpret:
                raise ValueError("phase_split requires the pallas backend")
            if sharding is not None:
                raise ValueError(
                    "phase_split is per-device; combine it with sharding "
                    "once per-shard wavefronts exist"
                )
            self.phase_stages = self._resolve_phase_stages(
                phase_split, phase_capacity
            )
        # frames_per_dispatch > 1 fuses k progressive frames into one jit
        # dispatch (lax.scan over frame ids) — same estimator, one dispatch
        # instead of k (~7% on v5e cornell512, tools/multiframe_bench.py).
        # Progress/abort/check_finite granularity coarsens to k frames,
        # mirroring how the reference only reports at frame boundaries
        # (src/main.rs:1351-1357) — here the boundary is a chunk.
        if frames_per_dispatch < 1:
            raise ValueError("frames_per_dispatch must be >= 1")
        if frames_per_dispatch > 1 and (
            phase_split is not None or sharding is not None
            or self.grid is not None
        ):
            raise ValueError(
                "frames_per_dispatch > 1 supports the plain jnp/pallas "
                "paths only (the phased pipeline needs per-frame overflow "
                "checks; the sharded/grid steps are per-frame programs)"
            )
        self.frames_per_dispatch = int(frames_per_dispatch)
        # regen_frames = K > 1: K progressive frames per megakernel launch
        # via in-kernel path regeneration (same estimator up to f32 sum
        # order — terminating lanes immediately start the pixel's next
        # frame, harvesting the bounce loop's dead-lane tail). Pallas-only;
        # not composable with phased/grid/frames_per_dispatch.
        # "auto": largest measured-good K the scoped VMEM allows on the
        # pallas path (1.5-1.75x on the BASELINE configs), 1 elsewhere or
        # when a conflicting mode is requested explicitly. ("auto", cap)
        # bounds the chosen K (live viewers want short chunks).
        if _scene_schedule is not None:
            # the schedule changes the scene BETWEEN frames, so every
            # frame must be its own dispatch of the per-frame step; the
            # multi-frame-fused modes bake one scene across their window
            if (
                persist
                or phase_split is not None
                or frames_per_dispatch > 1
                or sharding is not None
                or self.grid is not None
            ):
                raise ValueError(
                    "a per-frame scene schedule (motion blur) runs on "
                    "the plain per-frame jnp/pallas step only; drop "
                    "persist/phase_split/frames_per_dispatch/sharding/"
                    "accel='grid'"
                )
            # a track may animate material.transmission from 0 through
            # nonzero mid-shutter; the schedule carries conservative
            # flags so the kernel compiles the needed branches
            self.has_transmission = self.has_transmission or bool(
                getattr(_scene_schedule, "has_transmission", False)
            )
            self.has_emission = self.has_emission or bool(
                getattr(_scene_schedule, "has_emission", False)
            )
            is_auto = regen_frames == "auto" or (
                isinstance(regen_frames, tuple) and regen_frames[:1] == ("auto",)
            )
            if not is_auto and regen_frames != 1:
                raise ValueError(
                    "regen_frames fuses K frames of ONE scene per launch "
                    "and cannot compose with a per-frame scene schedule"
                )
            regen_frames = 1
        auto_cap = None
        if (
            isinstance(regen_frames, tuple)
            and len(regen_frames) == 2
            and regen_frames[0] == "auto"
        ):
            auto_cap = int(regen_frames[1])
            regen_frames = "auto"
        if persist and regen_frames == "auto":
            regen_frames = 1  # persist supersedes the default regen chunking
        if self.config.has_dof and persist:
            # depth of field draws one lens point per FRAME; fixed-window
            # regeneration ships the per-frame lens origins as a [K-1,4]
            # SMEM table (pack_camera_frames), but the persist kernels
            # restart from a single packed camera origin (free-running
            # re-derives raygen from the frame-INDEPENDENT basis table),
            # so persist cannot compose with it
            raise ValueError(
                "persist=True cannot render depth-of-field scenes "
                "(the in-kernel frame restarts assume the pinhole "
                "camera); drop persist or set aperture_radius=0"
            )
        if regen_frames == "auto":
            if self.backend != "pallas" or (
                phase_split is not None or self.grid is not None
                or frames_per_dispatch > 1
            ):
                regen_frames = 1
            else:
                cap = 100 if self.config.n_samples <= 64 else 64
                # the regeneration launch materializes 3*(K-1) full-image
                # f32 direction planes in HBM (12*(K-1)*W*H bytes — ~2.4 GB
                # at 1080p K=100); bound the DEFAULT K by an HBM budget so
                # large-resolution renders cannot OOM out of the box
                # (explicit regen_frames=K remains the user's call)
                hbm_budget = 2 * 1024**3
                cap = min(
                    cap,
                    1 + hbm_budget // (12 * self.config.width * self.config.height),
                )
                # single-launch device-time budget: the serving path kills
                # any ONE kernel launch past ~60s (measured on v5e: mesh5k
                # 512^2 K=100 ~= 80s faults with "UNAVAILABLE: TPU device
                # error"; ~22s launches run clean). Bound the DEFAULT K by
                # the analytic dense roofline (utils/flops.py) with a 2x
                # realized/dense margin (measured range 0.6-2.2x across the
                # bench configs) so heavy scenes stay well under the
                # deadline out of the box; explicit regen_frames=K remains
                # the user's call.
                from spectral_tpu.utils import flops as _flops

                _dense_s = (
                    _flops.kernel_ops(
                        self.config, self.obj_types, self.config.n_materials,
                        clusters=self.clusters,
                        has_transmission=self.has_transmission,
                        has_emission=self.has_emission,
                    ).per_frame / _flops.V5E_VPU_PEAK_OPS
                )
                cap = min(cap, max(1, int(20.0 / (2.0 * _dense_s))))
                if auto_cap is not None:
                    cap = min(cap, auto_cap)
                regen_frames = max(1, min(self.config.intended_frames, cap))
                if regen_frames < 2:
                    regen_frames = 1
        if regen_frames < 1:
            raise ValueError("regen_frames must be >= 1")
        if regen_frames > 1:
            if self.backend != "pallas" and not _interpret:
                raise ValueError("regen_frames requires the pallas backend")
            if (
                phase_split is not None or self.grid is not None
                or frames_per_dispatch > 1
            ):
                raise ValueError(
                    "regen_frames composes with the plain or row-sharded "
                    "pallas step only (not phase_split/grid/"
                    "frames_per_dispatch)"
                )
        self.regen_frames = int(regen_frames)
        # cost-sorted pixel->lane assignment for the regeneration kernel:
        # probe each pixel's realized path length once (megakernel cost
        # instrumentation), then permute pixels into tiles by descending
        # cost so a tile's slowest lane is no slower than its peers.
        # Bit-exact per pixel (pure relabeling). MEASURED AND REJECTED as
        # a default on v5e (tools/lane_sort_bench.py, K=100 tile=4096):
        # 0.93-0.98x on every BASELINE config — per-pixel path cost is
        # ~90% per-FRAME stochastic (frame-pair correlation 0.097 on
        # cornell512), so the regen straggler tail is sqrt(K)-noise no
        # static permutation can remove. Kept as a validated opt-in for
        # scenes with genuinely systematic cost structure.
        if regen_sort == "auto":
            regen_sort = False
        if regen_sort and (self.regen_frames < 2 or sharding is not None):
            raise ValueError(
                "regen_sort requires regen_frames >= 2 on the "
                "single-device path"
            )
        self.regen_sort = bool(regen_sort)
        # pixel->lane layout for the regeneration kernel (render/layout.py):
        # 'morton' makes every 4096-lane tile a compact 64x64 pixel block
        # so the tile-uniform cluster pre-test culls far clusters for the
        # whole tile. Pure relabeling — bit-identical per pixel. 'auto'
        # resolves by the measured policy: morton for clustered scenes
        # (layout A/B in PARITY.md), rowmajor otherwise.
        if lane_layout not in ("auto", "rowmajor", "morton"):
            raise ValueError(f"unknown lane_layout {lane_layout!r}")
        if lane_layout == "auto":
            lane_layout = (
                "morton"
                if self.clusters is not None and self.regen_frames > 1
                and sharding is None and not self.regen_sort
                else "rowmajor"
            )
        if lane_layout == "morton" and (
            self.regen_frames < 2 or sharding is not None or self.regen_sort
        ):
            raise ValueError(
                "lane_layout='morton' rides the single-device regeneration "
                "kernel (regen_frames >= 2, no sharding, no regen_sort)"
            )
        self.lane_layout = lane_layout
        self._lane_perm = self._lane_inv = None
        self._sharded_regen_steps: dict = {}
        # persist: the free-running lane-asynchronous kernel — every lane
        # advances through its OWN frame stream with state carried in HBM
        # between launches, so no tile ever waits for its slowest lane to
        # finish a fixed K-frame window (the regeneration straggler,
        # measured 1.6-1.8x). Whole-render batch mode: renders all frames
        # in one call from frame 0; no mid-render checkpoints (the carried
        # state is not a frame-boundary accumulator), abort at launch
        # granularity with a per-pixel completed-frame average.
        self.persist = bool(persist)
        self.persist_budget = persist_budget
        self.persist_fpl = persist_frames_per_launch
        # adaptive=(min_frames, rtol, atol): per-pixel variance-adaptive
        # stopping on the persist kernel — nbr_of_iterations becomes the
        # per-pixel CAP and each pixel stops once the standard error of
        # its per-frame luminance mean is under rtol*|mean| + atol
        # (host-evaluated at launch boundaries — see render_persistent).
        # A quality-target mode the reference lacks (its iteration count
        # is fixed up front, src/main.rs render loop).
        self.adaptive = None
        if adaptive is not None:
            if not persist:
                raise ValueError(
                    "adaptive sampling runs on the persist kernel: pass "
                    "persist=True"
                )
            self.adaptive = (
                int(adaptive[0]), float(adaptive[1]), float(adaptive[2])
            )
        self.persist_info: dict | None = None
        self._persist_resume: dict | None = None
        if self.persist:
            if self.backend != "pallas" and not _interpret:
                raise ValueError("persist requires the pallas backend")
            if (
                phase_split is not None or self.grid is not None
                or frames_per_dispatch > 1 or self.regen_frames > 1
                or self.regen_sort
            ):
                raise ValueError(
                    "persist is a standalone dispatch mode: drop "
                    "phase_split/grid/frames_per_dispatch/regen_frames/"
                    "regen_sort"
                )
            # persist + sharding routes to render_persistent_sharded
            # (row-DP persist launches, one pmin scalar per launch)
        self.accum = self._zero_accum()
        self.next_frame = 0

    def _ensure_lane_perm(self) -> None:
        """Probe per-pixel path cost (2 frames) and build the cost-sorted
        lane permutation. Runs once, lazily, at the first regen chunk."""
        if self._lane_perm is not None:
            return
        from spectral_tpu.render.pallas_integrator import (
            _cost_sort_perm,
            probe_path_cost,
        )

        cost = probe_path_cost(
            self.scene_arrays, self.config, self.obj_types,
            n_probe_frames=2, interpret=self._interpret,
            has_transmission=self.has_transmission,
            has_emission=self.has_emission,
            clusters=self.clusters,
        )
        self._lane_perm, self._lane_inv = _cost_sort_perm(cost)

    def _resolve_phase_stages(self, phase_split, phase_capacity):
        """Normalize the phased-rendering request into a static stages
        tuple ``((split, capacity_lanes), ...)`` for the cascade kernel
        path. ``phase_split='auto'`` measures per-bounce occupancy on a
        low-resolution probe and chooses splits/capacities by cost model
        (may return None: monolithic wins for high-occupancy scenes)."""
        from spectral_tpu.render.pallas_integrator import _pick_tile

        n = self.config.width * self.config.height
        tile = self._phase_tile or _pick_tile(n)
        n_pad = -(-n // tile) * tile
        if phase_split == "auto":
            return self._autotune_stages(tile, n_pad)
        splits = (
            (int(phase_split),)
            if isinstance(phase_split, int)
            else tuple(int(s) for s in phase_split)
        )
        if phase_capacity is None:
            if len(splits) != 1:
                raise ValueError(
                    "multi-split phased rendering needs explicit "
                    "phase_capacity values (or phase_split='auto')"
                )
            caps = (max(tile, n_pad // 16),)
        elif isinstance(phase_capacity, int):
            caps = (phase_capacity,)
        else:
            caps = tuple(int(c) for c in phase_capacity)
        if len(caps) != len(splits):
            raise ValueError(
                f"{len(splits)} phase splits need {len(splits)} capacities, "
                f"got {len(caps)}"
            )
        return tuple(zip(splits, caps))

    def _autotune_stages(
        self, tile: int, n_pad: int,
        probe_lanes: int = 32768, probe_frames: int = 3, margin: float = 1.7,
    ) -> tuple | None:
        """Choose cascade stages from a measured occupancy profile.

        Renders ``probe_frames`` frames of the scene at a reduced
        resolution through the instrumented jnp path (occupancy fractions
        are per-lane statistics, so they transfer across resolutions), then
        enumerates split sets (size <= 3) under ``choose_stages``'s
        calibrated cost model: segment cost = capacity_fraction x bounces,
        extraction cost = 2.4 x dest_fraction + 0.10 bounce-equivalents
        (v5e: ~6.8 ms extraction into a 1/8 wavefront vs ~24.5 ms
        full-wavefront bounce on the 1000-sphere config, super-linear in
        destination capacity). Capacities get a ``margin`` safety factor —
        an underestimate only costs an overflow-fallback frame, never
        correctness. Returns None when the monolithic kernel wins.
        """
        import math

        from spectral_tpu.render.integrator import integrate_frame

        if self.config.max_bounces < 2:
            return None
        # probe at reduced resolution, preserving aspect ratio
        scale = math.sqrt(
            probe_lanes / (self.config.width * self.config.height)
        )
        pw = max(8, min(self.config.width, int(self.config.width * scale)))
        ph = max(8, min(self.config.height, int(self.config.height * scale)))
        probe_cfg = dataclasses.replace(self.config, width=pw, height=ph)

        @partial(jax.jit, static_argnums=(1,))
        def probe(scn, cfg, fid):
            _rgb, _rays, hist = integrate_frame(
                scn, cfg, fid, return_stats=True, return_occupancy=True
            )
            return hist

        occ = np.zeros((self.config.max_bounces,), np.float64)
        for f in range(probe_frames):
            hist = np.asarray(
                probe(self.scene_arrays, probe_cfg, jnp.uint32(f)),
                np.float64,
            )
            occ = np.maximum(occ, hist / (pw * ph))
        return choose_stages(occ, n_pad, tile, margin=margin)

    # --------------------------------------------------------------- phased

    def _resolve_pending(self) -> None:
        """Blend the previous phased frame, re-rendering it monolithically
        if its compacted wavefront overflowed (exact estimator always).
        Called right AFTER the next frame is dispatched, so the host sync
        on the overflow flag is hidden behind device work."""
        if self._pending is None:
            return
        fid, rgb, overflow = self._pending
        self._pending = None
        if bool(overflow):
            self.overflow_frames += 1
            rgb = _mono_rgb(
                self.scene_arrays, self.config, fid, self.obj_types,
                self.has_transmission, self.has_emission, self._interpret,
                self._phase_tile, self.clusters,
            )
        self.accum = _blend(self.accum, rgb, fid)

    def _flush_pending(self) -> None:
        self._resolve_pending()

    def _advance(self, frame_id) -> None:
        fid = jnp.uint32(frame_id)
        if self._scene_schedule is not None:
            # motion blur: this frame's scene snapshot (same shapes, so
            # the jitted step is compiled once and reused across frames)
            arrays = self._scene_schedule(int(frame_id))
            if self.backend == "pallas":
                self.accum = _step_pallas(
                    arrays, self.config, self.accum, fid,
                    self.obj_types, self.has_transmission, self.has_emission,
                    self._interpret, self.clusters,
                )
            else:
                self.accum = _step(arrays, self.config, self.accum, fid)
            return
        if self.phase_stages is not None:
            rgb, overflow = _phased_rgb(
                self.scene_arrays, self.config, fid, self.obj_types,
                self.phase_stages,
                self.has_transmission, self.has_emission,
                self._interpret, self._phase_tile, self.clusters,
            )
            self._resolve_pending()  # f-1 is done by now; sync is hidden
            self._pending = (fid, rgb, overflow)
        elif self.backend == "pallas":
            if self.sharding is not None:
                self.accum = self._sharded_step(self.scene_arrays, self.accum, fid)
            else:
                self.accum = _step_pallas(
                    self.scene_arrays, self.config, self.accum, fid,
                    self.obj_types, self.has_transmission, self.has_emission,
                    self._interpret, self.clusters,
                )
        elif self.grid is not None:
            self.accum = _step_grid(
                self.scene_arrays, self.config, self.accum, fid,
                self.grid, self.grid_static,
            )
        else:
            self.accum = _step(self.scene_arrays, self.config, self.accum, fid)

    def _advance_fused(self, first_frame: int, k: int) -> None:
        """Render frames [first_frame, first_frame + k) in ONE dispatch.
        Only reached on the plain jnp/pallas paths (guarded in __init__)."""
        fid = jnp.uint32(first_frame)
        if self.regen_frames > 1 and k > 1:
            if self.sharding is not None:
                step = self._sharded_regen_steps.get(k)
                if step is None:
                    from spectral_tpu.parallel.sharding import (
                        build_sharded_pallas_regen_step,
                    )

                    step = build_sharded_pallas_regen_step(
                        self.sharding.mesh, self.config, self.obj_types, k,
                        interpret=self._interpret,
                        has_transmission=self.has_transmission,
                        has_emission=self.has_emission,
                        clusters=self.clusters,
                    )
                    self._sharded_regen_steps[k] = step
                self.accum = step(self.scene_arrays, self.accum, fid)
            elif self.regen_sort or self.lane_layout == "morton":
                if self.regen_sort:
                    self._ensure_lane_perm()
                else:  # morton: static Z-curve permutation, built once
                    if self._lane_perm is None:
                        from spectral_tpu.render.layout import morton_layout

                        self._lane_perm, self._lane_inv = morton_layout(
                            self.config.width, self.config.height
                        )
                self.accum = _step_regen_sorted(
                    self.scene_arrays, self.config, self.accum, fid, k,
                    self.obj_types, self.has_transmission, self.has_emission,
                    self._interpret, self._lane_perm, self._lane_inv,
                    self.clusters,
                )
            else:
                self.accum = _step_regen(
                    self.scene_arrays, self.config, self.accum, fid, k,
                    self.obj_types, self.has_transmission, self.has_emission,
                    self._interpret, self.clusters,
                )
        elif self.backend == "pallas":
            self.accum = _step_pallas_k(
                self.scene_arrays, self.config, self.accum, fid, k,
                self.obj_types, self.has_transmission, self.has_emission,
                self.clusters,
            )
        else:
            self.accum = _step_k(
                self.scene_arrays, self.config, self.accum, fid, k
            )

    def _zero_accum(self):
        accum = jnp.zeros(
            (self.config.height, self.config.width, 4), dtype=jnp.float32
        )
        if self._accum_sharding is not None:
            accum = jax.device_put(accum, self._accum_sharding)
        return accum

    def reset(self) -> None:
        self._pending = None  # pre-reset frames are discarded, not blended
        self.accum = self._zero_accum()
        self.next_frame = 0

    def render_frames(
        self,
        n_frames: int,
        progress: Callable[[RenderProgress], None] | None = None,
        abort: Callable[[], bool] | None = None,
        check_finite: bool = False,
    ) -> np.ndarray:
        """Render up to ``n_frames`` more progressive iterations.

        ``abort`` is polled once per frame, after the frame completes —
        frame-granular cancellation exactly like the reference
        (src/main.rs:1351-1357). ``check_finite`` validates the
        accumulator per frame and raises on NaN/Inf (numerical failure
        detection the reference lacks, SURVEY.md §5). Returns the current
        framebuffer.

        With ``frames_per_dispatch=k > 1``, progress/abort/check_finite
        all operate at k-frame-chunk granularity instead.

        With ``persist=True`` the whole render runs as one free-running
        batch (all intended frames from frame 0, in ~64-frame launches);
        progress/abort operate at launch granularity and an aborted
        render returns the per-pixel average of completed frames.
        """
        if self.persist:
            return self._render_persistent(
                n_frames, progress, abort, check_finite
            )
        begin = time.monotonic()
        total = self.config.intended_frames
        pixels = self.config.width * self.config.height
        rendered = 0
        chunk = max(self.frames_per_dispatch, self.regen_frames)
        while rendered < n_frames and self.next_frame < total:
            k = min(chunk, n_frames - rendered, total - self.next_frame)
            if k > 1 and self.regen_frames > 1 and k < self.regen_frames:
                # ragged tail of a regeneration render: K is a static arg,
                # so a k-sized chunk would compile a NEW tail-sized regen
                # kernel per distinct k (20-40 s each) to save k * ~2 ms.
                # Step the tail on the monolithic per-frame kernel instead:
                # its one compile is k-independent (amortized across every
                # tail size and persisted in the XLA compile cache), though
                # a pure-regen first run does pay it on the first tail frame
                for j in range(k):
                    self._advance(self.next_frame + j)
            elif k > 1:
                self._advance_fused(self.next_frame, k)
            else:
                self._advance(self.next_frame)
            self.next_frame += k
            rendered += k
            if check_finite:
                if not bool(jnp.isfinite(self.accum).all()):
                    raise FloatingPointError(
                        f"non-finite accumulator after frame {self.next_frame - 1}"
                    )
            if progress is not None:
                jax.block_until_ready(self.accum)
                progress(
                    RenderProgress(
                        self.next_frame - 1,
                        total,
                        time.monotonic() - begin,
                        pixels=pixels,
                        n_samples=self.config.n_samples,
                    )
                )
            if abort is not None and abort():
                break
        return self.framebuffer()

    def _render_persistent(
        self, n_frames, progress, abort, check_finite
    ) -> np.ndarray:
        """Whole-render free-running batch (``persist=True``). Renders
        ALL intended frames from frame 0 in one call — the carried lane
        state is not a frame-boundary accumulator, so partial/resumed
        renders are not expressible; ask for the full render."""
        total = self.config.intended_frames
        resume = self._persist_resume
        self._persist_resume = None
        if (self.next_frame != 0 and resume is None) or n_frames < total:
            raise ValueError(
                "persist renders the whole image in one batch: call "
                "render()/render_frames(intended_frames) from frame 0, "
                "or load a persist checkpoint to continue an aborted one"
            )
        from spectral_tpu.render.pallas_integrator import render_persistent

        begin = time.monotonic()
        pixels = self.config.width * self.config.height

        def on_launch(min_done, launches):
            if progress is not None:
                progress(
                    RenderProgress(
                        max(min_done - 1, 0), total,
                        time.monotonic() - begin,
                        pixels=pixels, n_samples=self.config.n_samples,
                    )
                )

        # live preview: refresh self.accum (what framebuffer() serves)
        # from the carried state at most once a second — viewers polling
        # framebuffer() during a persist render then see real progress
        last_preview = [0.0]

        def on_preview(make_rgb):
            now = time.monotonic()
            if now - last_preview[0] < 1.0:
                return
            last_preview[0] = now
            rgb = make_rgb()
            alpha = jnp.ones(rgb.shape[:2] + (1,), jnp.float32)
            self.accum = jnp.concatenate([rgb, alpha], axis=-1)

        kwargs = dict(
            n_frames=total,
            interpret=self._interpret,
            has_transmission=self.has_transmission,
            has_emission=self.has_emission,
            clusters=self.clusters,
            budget=self.persist_budget,
            frames_per_launch=self.persist_fpl,
            progress=on_launch,
            should_abort=abort,
            adaptive=self.adaptive,
            preview=on_preview if progress is not None else None,
        )
        if self.sharding is None:
            # single-chip persist is checkpointable: carry the state out
            # so save_checkpoint can persist it (zero copies — just refs)
            kwargs.update(return_state=True, resume_state=resume)
        elif resume is not None:
            raise ValueError(
                "persist checkpoints are single-chip for now (the sharded "
                "carried state is mesh-layout-dependent)"
            )
        if self.sharding is not None:
            from spectral_tpu.parallel.sharding import (
                render_persistent_sharded,
            )

            rgb, info = render_persistent_sharded(
                self.scene_arrays, self.config, self.obj_types,
                self.sharding.mesh, **kwargs,
            )
        else:
            rgb, info = render_persistent(
                self.scene_arrays, self.config, self.obj_types, **kwargs,
            )
        self.persist_info = info
        alpha = jnp.ones(rgb.shape[:2] + (1,), jnp.float32)
        self.accum = jnp.concatenate([rgb, alpha], axis=-1)
        self.next_frame = total if not info["aborted"] else info["frames_done"]
        if check_finite and not bool(jnp.isfinite(self.accum).all()):
            raise FloatingPointError("non-finite framebuffer after persist render")
        return self.framebuffer()

    def render(
        self,
        progress: Callable[[RenderProgress], None] | None = None,
        abort: Callable[[], bool] | None = None,
        check_finite: bool = False,
    ) -> np.ndarray:
        """Render all configured iterations (the reference's full
        ``App::render`` loop)."""
        return self.render_frames(
            self.config.intended_frames,
            progress=progress,
            abort=abort,
            check_finite=check_finite,
        )

    def framebuffer(self) -> np.ndarray:
        """Fetch the ``[H, W, 4]`` float32 accumulation buffer to host.

        Under a multi-process (multi-host) mesh the buffer is sharded
        across hosts; it is all-gathered over DCN so every process gets
        the full image (``parallel.distributed.fetch_global``)."""
        from spectral_tpu.parallel.distributed import fetch_global

        self._flush_pending()  # a phased frame may still be in flight
        return fetch_global(self.accum)

    def save_image(self, path, exposure=None, gamma=None) -> None:
        """Save the current framebuffer.

        Multi-process safe: the framebuffer gather is a collective every
        process joins; only process 0 writes the file. Call this from ALL
        processes in a distributed render. ``exposure``/``gamma`` opt
        into a display transform (default: the reference's linear
        no-gamma output)."""
        from spectral_tpu.parallel.distributed import is_primary

        fb = self.framebuffer()
        if is_primary():
            image_mod.save_image(fb, path, exposure=exposure, gamma=gamma)

    # --------------------------------------------------------- checkpoint

    def save_checkpoint(self, path) -> None:
        """Persist accumulator + frame counter so long renders are
        resumable (a capability the reference lacks, SURVEY.md §5).

        Persist-mode renders checkpoint their full carried lane state
        instead (the accumulator alone cannot continue a lane-
        asynchronous render); the file records which kind it is and
        ``load_checkpoint`` routes accordingly."""
        from spectral_tpu.parallel.distributed import is_primary

        if self.persist:
            info = self.persist_info
            if not info or "resume_state" not in info:
                raise ValueError(
                    "no persist state to checkpoint: sharded persist "
                    "renders carry no host-side resume state; otherwise, "
                    "render (or abort) first"
                    if self.sharding is not None else
                    "no persist state to checkpoint: render (or abort) "
                    "first"
                )
            if not is_primary():
                return
            rs = info["resume_state"]
            meta = rs["meta"]
            payload = {
                f"state_{i}": np.asarray(a)
                for i, a in enumerate(rs["state"])
            }
            payload.update(
                px=np.asarray(rs["px"]), py=np.asarray(rs["py"]),
                kind="persist",
                frames_done=info["frames_done"],
                meta_n_frames=meta["n_frames"],
                meta_budget=meta["budget"],
                meta_tile=meta["tile"],
                intended_frames=self.config.intended_frames,
                width=self.config.width,
                height=self.config.height,
                scene_digest=self.scene_digest,
            )
            if meta["adaptive"] is not None:
                payload["meta_adaptive"] = np.asarray(
                    meta["adaptive"], np.float64
                )
                payload.update(
                    stop=np.asarray(rs["stop"]),
                    pixel_of_slot=rs["pixel_of_slot"],
                    packed_workable=rs["packed_workable"],
                    compactions=rs["compactions"],
                    **{f"stat_{i}": np.asarray(a)
                       for i, a in enumerate(rs["stats"])},
                )
            with open(path, "wb") as f:
                np.savez(f, **payload)
            return

        fb = self.framebuffer()  # collective under a multi-process mesh
        if not is_primary():
            return
        # write through a file handle: np.savez(path) would silently
        # append '.npz' to names without it, breaking resume-by-name
        with open(path, "wb") as f:
            np.savez(
                f,
                accum=fb,
                next_frame=self.next_frame,
                intended_frames=self.config.intended_frames,
                width=self.config.width,
                height=self.config.height,
                scene_digest=self.scene_digest,
            )

    def load_checkpoint(self, path) -> None:
        data = np.load(path)
        if (
            int(data["width"]) != self.config.width
            or int(data["height"]) != self.config.height
            or int(data["intended_frames"]) != self.config.intended_frames
        ):
            raise ValueError(
                "checkpoint was produced by an incompatible render config"
            )
        is_persist_ckpt = (
            "kind" in data.files and str(data["kind"]) == "persist"
        )
        if is_persist_ckpt != self.persist:
            raise ValueError(
                "checkpoint kind mismatch: "
                + ("a persist checkpoint needs persist=True"
                   if is_persist_ckpt else
                   "an accumulator checkpoint cannot continue a persist "
                   "render")
            )
        if "scene_digest" in data.files:
            ckpt_digest = str(data["scene_digest"])
            if ckpt_digest != self.scene_digest:
                raise ValueError(
                    "checkpoint was rendered from a DIFFERENT scene (same "
                    "dimensions, different content) — resuming would blend "
                    "two unrelated renders"
                )
        elif is_persist_ckpt:
            pass  # persist checkpoints always carry a digest
        else:
            import warnings

            warnings.warn(
                "checkpoint predates scene fingerprinting; cannot verify it "
                "matches this scene",
                stacklevel=2,
            )
        if is_persist_ckpt:
            self._load_persist_checkpoint(data)
            return
        accum = jnp.asarray(data["accum"], dtype=jnp.float32)
        if self._accum_sharding is not None:
            accum = jax.device_put(accum, self._accum_sharding)
        self._pending = None
        self.accum = accum
        self.next_frame = int(data["next_frame"])

    def _load_persist_checkpoint(self, data) -> None:
        meta_ad = (
            tuple(np.asarray(data["meta_adaptive"]).tolist())
            if "meta_adaptive" in data.files else None
        )
        if meta_ad is not None:
            meta_ad = (int(meta_ad[0]), float(meta_ad[1]), float(meta_ad[2]))
        if (meta_ad is None) != (self.adaptive is None) or (
            meta_ad is not None and tuple(self.adaptive) != meta_ad
        ):
            raise ValueError(
                f"persist checkpoint was saved with adaptive={meta_ad}; "
                f"this renderer has adaptive={self.adaptive}"
            )
        # plane counts are inferred from the file, not hardcoded, so a
        # checkpoint survives the carried-state tuple growing a plane
        n_state = sum(1 for k in data.files if k.startswith("state_"))
        n_stats = sum(1 for k in data.files if k.startswith("stat_"))
        rs = {
            "state": tuple(data[f"state_{i}"] for i in range(n_state)),
            "px": data["px"], "py": data["py"],
            "meta": {
                "n_frames": int(data["meta_n_frames"]),
                "budget": int(data["meta_budget"]),
                "tile": int(data["meta_tile"]),
                "adaptive": meta_ad,
            },
        }
        if meta_ad is not None:
            rs.update(
                stop=data["stop"],
                stats=tuple(data[f"stat_{i}"] for i in range(n_stats)),
                pixel_of_slot=data["pixel_of_slot"],
                packed_workable=int(data["packed_workable"]),
                compactions=int(data["compactions"]),
            )
        self._persist_resume = rs
        self.next_frame = int(data["frames_done"])  # display/ETA only
