"""Analytic VPU-op accounting for the Pallas megakernel (roofline/MFU).

The megakernel is pure VPU work — there are no matmuls, so the MXU peak
is irrelevant; the meaningful silicon-utilization question is "what
fraction of the VPU's elementwise throughput does the kernel sustain".
The kernel structure is static per (scene, config), so the executed op
count is countable analytically: every lane executes every bounce
(masked retirement, no divergence), which makes

    executed_ops_per_frame = n_lanes * sum_over_bounces(ops_per_lane)

exact for the dense (unclustered) object loop and an upper bound for the
clustered loop (cluster skips only remove work; pass ``visited_fraction``
to scale the member-loop terms if a measured visit rate is available).

Counting convention: every elementwise f32/u32 lane operation — add, sub,
mul, div, sqrt, rsqrt, compare, select, min/max, and/or, int mul/xor/
shift — counts as ONE op. Transcendentals (sin, cos) count as one op
too (they run on the VPU's special-function path; the kernel has ~6 per
bounce, noise at this resolution). Scalar (SMEM) arithmetic is free.
The constants below were counted from ``ops/pallas/megakernel.py``'s
kernel bodies (fori/clustered variants — the ones every BASELINE config
uses); they are ~±10% faithful, which is enough to say compute-bound vs
overhead-bound.

VPU peak (v5e): the VPU is an (8, 128) vector unit with 4 independent
ALUs per lane position = 4096 lane-ops/cycle; at the ~1.5 GHz clock
implied by the chip's published 197 bf16 TFLOP/s (4 MXUs * 128*128 * 2
flops = 131072 flops/cycle), that is 6.1e12 ops/s issue rate, or
1.23e13 ops/s counting a fused multiply-add as two of our ops. We use
the FMA-fused figure as the peak, so ``pct_vpu_peak`` is a conservative
utilization floor (code that cannot fuse everything into FMAs can never
reach 100%).
"""

from __future__ import annotations

import dataclasses

V5E_CLOCK_HZ = 1.5e9
V5E_VPU_LANES = 8 * 128 * 4  # (sublanes, lanes) x 4 ALUs
# FMA-fused peak: each ALU can retire a multiply+add (2 counted ops)/cycle
V5E_VPU_PEAK_OPS = V5E_VPU_LANES * V5E_CLOCK_HZ * 2  # 1.23e13

# --- per-member op counts in the fori/clustered nearest-hit loop
# (intersection + winner-accumulate per lane), counted from
# megakernel.trace_tile_fori bodies
NEAREST_MEMBER_OPS = {
    "sphere": 44,  # _sphere_t 30 + clustered accum 14
    "plain_box": 91,  # slab 32 + face normal 39 + ip 6 + accum 14
    "rotated_box": 149,  # rotate 30 + slab 32 + face-scan normal 64 + ...
    "triangle": 87,  # Moller-Trumbore 52 + Phong normal 21 + accum 14
}
# per-member, PER SHADOW RAY (one fused loop serves all lights)
SHADOW_MEMBER_OPS = {
    "sphere": 36,  # sqrt-free interval test + latch
    "plain_box": 34,
    "rotated_box": 67,
    "triangle": 54,
}
CLUSTER_PRETEST_OPS = 34  # slab 28 + relevance mask + tile reduction
SHADOW_CLUSTER_PRETEST_OPS = 34  # per light

_TYPE_NAME = {0: "plain_box", 1: "sphere", 2: "rotated_box", 3: "triangle"}


@dataclasses.dataclass(frozen=True)
class OpsBreakdown:
    trace: float  # nearest-hit object loop (incl. cluster pre-tests)
    shadow: float  # NEE occlusion object loop
    shading: float  # per-wavelength radiance/throughput math
    continuation: float  # cone/hemisphere/refract continuation rays
    fixed: float  # RNG, raygen, masks, bookkeeping
    per_lane_bounce: float  # total of the above
    per_frame: float  # n_lanes * bounces * per_lane_bounce + frame-fixed

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def kernel_ops(
    config,
    obj_types: tuple[int, ...],
    n_materials: int,
    clusters=None,
    has_transmission: bool = False,
    has_emission: bool = False,
    has_sky: bool = False,
    has_texture: bool = False,
    visited_fraction: float = 1.0,
    visited_fraction_shadow: float | None = None,
    bounce_iters: float | None = None,
) -> OpsBreakdown:
    """Executed VPU ops for ONE progressive frame of the regen/persist
    megakernel. ``clusters`` is the ``plan_clusters`` result (or None for
    the dense loop); ``visited_fraction`` scales clustered member loops
    (1.0 = every cluster visited every bounce = dense upper bound).
    ``visited_fraction_shadow`` scales the NEE occlusion member loops
    separately (the shadow walk's segment culling + blocked-latch dropout
    visit far fewer clusters than the nearest-hit walk — measured by
    tools/visit_replay.py); defaults to ``visited_fraction``.

    ``bounce_iters`` overrides the per-frame executed iteration count:
    the monolithic kernel executes exactly ``max_bounces`` iterations per
    frame, but the regeneration/persist kernels skip iterations once a
    tile's lanes are all done — their executed count per frame lies in
    [sum of per-bounce live fractions, max_bounces] (straggler lanes keep
    whole tiles running). Pass the occupancy sum for the zero-straggler
    lower bound."""
    s = config.n_samples
    if visited_fraction_shadow is None:
        visited_fraction_shadow = visited_fraction
    n_lights = max(config.n_lights, 1)
    n_lanes = config.width * config.height
    bounces = config.max_bounces if bounce_iters is None else bounce_iters

    counts = {k: 0 for k in _TYPE_NAME.values()}
    for t in obj_types:
        counts[_TYPE_NAME[int(t)]] += 1

    # --- nearest trace per lane-bounce
    trace = 0.0
    if clusters is not None:
        _sigma, runs = clusters
        typed = [_TYPE_NAME[int(tag)] for tag, _s, _e, _c in runs]
        for (tag, start, stop, is_cl), tname in zip(runs, typed):
            members = (stop - start) * NEAREST_MEMBER_OPS[tname]
            if is_cl:
                trace += CLUSTER_PRETEST_OPS + members * visited_fraction
            else:
                trace += members
    else:
        for tname, c in counts.items():
            trace += c * NEAREST_MEMBER_OPS[tname]
    # post-loop winner resolution: sphere-normal derivation + material
    # scalar selects over the material table
    trace += 20 + 6 * n_materials

    # --- NEE shadow loop per lane-bounce (all lights share one loop)
    shadow = 0.0
    if clusters is not None:
        _sigma, runs = clusters
        for (tag, start, stop, is_cl) in runs:
            tname = _TYPE_NAME[int(tag)]
            members = (
                (stop - start) * SHADOW_MEMBER_OPS[tname] * n_lights
            )
            if is_cl:
                shadow += (
                    SHADOW_CLUSTER_PRETEST_OPS * n_lights
                    + members * visited_fraction_shadow
                )
            else:
                shadow += members
    else:
        for tname, c in counts.items():
            shadow += c * SHADOW_MEMBER_OPS[tname] * n_lights
    # per-light setup (direction/dist/normalize) + scale (renorm/cosines)
    shadow += n_lights * (18 + 19) + 7

    # --- per-wavelength shading: direct fold, albedo select, throughput
    per_s = 2 * n_lights + 2 * n_materials + 5
    if has_sky:
        per_s += 3
    if has_emission:
        per_s += 3 + 2 * n_materials
    if has_transmission:
        per_s += 4  # hero-collapse pick
    shading = per_s * s + n_materials  # + mat-mask precompute per bounce

    # --- continuation rays: specular cone + diffuse hemisphere ( +
    # dielectric branch), direction/origin selects, final normalize
    continuation = 95 + 75 + 20
    if has_transmission:
        continuation += 60  # Snell/Fresnel/TIR + extra selects
    if has_texture:
        continuation += 14  # checker factor (floors + parity)

    # --- fixed per lane-bounce: PCG3D, gate/alive/cont logic, hit point,
    # offsets, cos_out, regen restart raygen (Hammersley bits + basis FMAs)
    fixed = 45 + 15 + 6 + 6 + 7 + 70

    per_lane_bounce = trace + shadow + shading + continuation + fixed
    # frame-fixed: per-s RGB fold + progressive blend
    per_frame = n_lanes * (bounces * per_lane_bounce + 6 * s + 10)
    return OpsBreakdown(
        trace=trace,
        shadow=shadow,
        shading=shading,
        continuation=continuation,
        fixed=fixed,
        per_lane_bounce=per_lane_bounce,
        per_frame=per_frame,
    )


def roofline(ops_per_frame: float, seconds_per_frame: float) -> dict:
    """ops/s and fraction of the (FMA-fused) v5e VPU peak."""
    ops_per_s = ops_per_frame / seconds_per_frame
    return {
        "vpu_ops_per_s": ops_per_s,
        "pct_vpu_peak": 100.0 * ops_per_s / V5E_VPU_PEAK_OPS,
    }
