"""Wavefront spectral path integrator.

This is the TPU-native replacement for the reference's *recursive*
closest-hit shading (``hit_shader`` -> ``submit_ray`` recursion, reference
``src/shader.rs:360-495``). The recursion is linear — one continuation ray
per bounce plus side shadow rays — so it flattens exactly into an
iterative loop over batched ray state:

    L(pixel) = sum_d  T_d * albedo_d * direct_d
    T_0 = 1,  T_{d+1} = T_d * albedo_d * g_{d+1}

where ``direct_d`` is the next-event-estimation sum over lights at bounce
``d`` (diffuse lanes only; the reference's metallic branch has no direct
lighting — its own TODO, ``src/shader.rs:412-413``), and ``g`` is the
specular child-distance gate (children shorter than 1e-4 are discarded,
``src/shader.rs:407``). Ray death (miss / gate / budget) is masked lane
retirement instead of early return.

Preserved reference quirks (SURVEY.md §2):

* RNG seed ``pcg3d(px, py, frame_id + bounces_left)`` with a *count-down*
  bounce budget (``src/shader.rs:389-391``);
* shadow/specular origins offset by ``normal * 1e-5`` but the diffuse
  continuation starts at the **un-offset** hit point
  (``src/shader.rs:382, 403, 424, 444``);
* the nonstandard outgoing-cosine factor on direct light
  (``src/shader.rs:435``);
* stochastic specular/diffuse branch on ``rz < metallicness``, cone
  perturbation only when roughness >= 0.001 (``src/shader.rs:393-401``).

Divergence (documented): the reference clamps each diffuse child's
*subtree total* with ``max0`` (``src/shader.rs:448``). With non-negative
spectra (every reachable scene; reflective albedos are additionally
min1'd) that clamp is a no-op, and the flattened sum cannot express it;
scenes with negative custom spectra may differ.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectral_tpu.ops.geometry import surface_normal, trace, trace_shadow


def checker_factor(ipx, ipy, ipz, scale, low):
    """World-space checker albedo factor (schema.Checker): cells of side
    ``scale`` alternate 1.0 / ``low`` by xyz floor-parity; ``scale == 0``
    means untextured (factor 1). Op order mirrored by the megakernel and
    the oracle so all backends agree bitwise."""
    inv = 1.0 / scale  # scale==0 -> inf; masked by the outer where
    p = jnp.floor(ipx * inv) + jnp.floor(ipy * inv) + jnp.floor(ipz * inv)
    odd = (p - 2.0 * jnp.floor(p * 0.5)) != 0.0
    return jnp.where(scale > 0.0, jnp.where(odd, low, 1.0), 1.0)
from spectral_tpu.ops.rng import random_pcg3d
from spectral_tpu.ops.sampling import (
    cosine_hemisphere_bounce,
    reflect_vec,
    refract_or_reflect,
    sample_in_cone,
)
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.render.camera import generate_primary_rays, scene_dof
from spectral_tpu.render.color import spectra_to_rgb
from spectral_tpu.scene.flatten import RenderConfig, SceneArrays

# reference src/shader.rs:8 and :14
NEW_RAY_POSITION_OFFSET_DISTANCE = jnp.float32(1e-5)
SPECULAR_MIN_RAY_DISTANCE = jnp.float32(1e-4)


class _BounceState(NamedTuple):
    origin: Vec3  # [N]
    direction: Vec3  # [N]
    throughput: jax.Array  # [N, S]
    radiance: jax.Array  # [N, S]
    alive: jax.Array  # [N] bool
    pending_gate: jax.Array  # [N] bool — parent was specular
    ray_count: jax.Array  # [] f32 — reference-equivalent rays submitted
    hero_idx: jax.Array  # [N] i32 — hero wavelength bin after a dispersive
    # refraction event (-1 before; beyond-reference, SURVEY.md §2.12)


def make_tracers(scene: SceneArrays, grid=None, grid_static=None):
    """Bind the intersection backend: brute force (reference semantics) or
    the uniform-grid DDA for many-object scenes."""
    if grid is None:
        return (
            lambda o, d: trace(o, d, scene),
            lambda o, d, maxd: trace_shadow(o, d, maxd, scene),
        )
    from spectral_tpu.ops.grid_trace import trace_grid

    def tr(o, d):
        return trace_grid(o, d, scene, grid, grid_static)

    def sh(o, d, maxd):
        r = tr(o, d)
        return r.hit & (r.t <= maxd)

    return tr, sh


def _direct_lighting(
    offset_pos: Vec3,
    normal: Vec3,
    incoming: Vec3,
    scene: SceneArrays,
    config: RenderConfig,
    shadow_tracer,
) -> jax.Array:
    """Next-event estimation over all lights (reference
    ``src/shader.rs:420-439``): per light, an occlusion ray from the
    offset hit point; unoccluded lights contribute
    ``spectrum / dist^2 * cos_in * cos_out``."""
    n = offset_pos.x.shape[0]
    direct = jnp.zeros((n, config.n_samples), dtype=jnp.float32)
    cos_out = jnp.maximum((-incoming).dot(normal), 0.0)

    for li in range(config.n_lights):
        lpos = Vec3(
            scene.light_pos[li, 0], scene.light_pos[li, 1], scene.light_pos[li, 2]
        )
        ldir = Vec3(
            lpos.x - offset_pos.x, lpos.y - offset_pos.y, lpos.z - offset_pos.z
        )
        dist2 = ldir.magnitude_squared()
        dist = ldir.magnitude()
        ldn = ldir.normalize()
        blocked = shadow_tracer(offset_pos, ldn, dist)
        # reference re-normalizes the already-normalized direction
        cos_in = jnp.maximum(ldn.normalize().dot(normal), 0.0)
        scale = (cos_in * cos_out) / dist2
        contrib = scene.light_spec[li][None, :] * scale[:, None]
        direct = direct + jnp.where(blocked[:, None], 0.0, contrib)
    return direct


def _bounce(
    state: _BounceState,
    bounces_left: jax.Array,  # uint32 scalar, the reference's ray.max_bounces
    frame_id: jax.Array,  # uint32 scalar
    px: jax.Array,
    py: jax.Array,
    scene: SceneArrays,
    config: RenderConfig,
    tracers=None,
    return_shadow_info: bool = False,
) -> _BounceState:
    o, d, throughput, radiance, alive, pending_gate, ray_count, hero_idx = state
    tracer, shadow_tracer = tracers or make_tracers(scene)

    # reference-equivalent ray accounting: one submit_ray per live lane
    # (the wavefront traces retired lanes too, but only live ones count)
    ray_count = ray_count + jnp.sum(alive.astype(jnp.float32))

    res = tracer(o, d)
    # specular child-distance gate from the parent bounce
    gate_ok = (~pending_gate) | (res.t > SPECULAR_MIN_RAY_DISTANCE)
    if scene.sky is not None:
        # beyond-reference: environment emission — a traced ray that
        # escapes the scene collects ``throughput * sky`` (the reference's
        # miss shader returns zero, src/shader.rs:460-463). Gated by the
        # pytree structure itself: sky-less scenes compile none of this.
        # (res.t is +inf on miss, so gate_ok is always true there; the
        # conjunction documents that gated-out short HITS get no sky.)
        sky_mask = alive & gate_ok & ~res.hit
        radiance = radiance + jnp.where(
            sky_mask[:, None], throughput * scene.sky[None, :], 0.0
        )
    alive = alive & res.hit & gate_ok

    t_safe = jnp.where(alive, res.t, 0.0)
    ip = o + d * t_safe
    normal = surface_normal(ip, res.obj_idx, scene, origin=o, direction=d)

    m_metal = scene.metallicness[res.obj_idx]
    m_rough = scene.roughness[res.obj_idx]
    m_albedo = scene.albedo[res.obj_idx]  # [N, S]
    m_trans = scene.transmission[res.obj_idx]
    m_ior = scene.ior[res.obj_idx]
    m_cauchy = scene.cauchy_b[res.obj_idx]
    if scene.textured_static:
        # beyond-reference: procedural checker modulating the albedo's
        # magnitude by hit position (scalar — the spectral shape is
        # untouched). Static gate: untextured scenes compile none of it.
        texf = checker_factor(
            ip.x, ip.y, ip.z,
            scene.tex_scale[res.obj_idx], scene.tex_low[res.obj_idx],
        )
        m_albedo = m_albedo * texf[:, None]

    rx, ry, rz = random_pcg3d(px, py, frame_id + bounces_left)
    spec = rz < m_metal
    # beyond-reference: refraction branch (zero-probability in reference
    # scenes, so their stochastic streams are untouched)
    trans = (~spec) & (rz < m_metal + m_trans)

    # beyond-reference: emissive surfaces (area lights) contribute when hit
    radiance = radiance + jnp.where(
        alive[:, None], throughput * scene.emission[res.obj_idx], 0.0
    )

    offset_pos = ip + normal * NEW_RAY_POSITION_OFFSET_DISTANCE

    direct = _direct_lighting(offset_pos, normal, d, scene, config, shadow_tracer)
    # one shadow ray per light per live diffuse lane (src/shader.rs:420-439)
    ray_count = ray_count + jnp.float32(config.n_lights) * jnp.sum(
        (alive & ~spec & ~trans).astype(jnp.float32)
    )
    contributes = (alive & ~spec & ~trans)[:, None]
    radiance = radiance + jnp.where(
        contributes, throughput * m_albedo * direct, 0.0
    )

    # --- hero-wavelength collapse at the first dispersive refraction:
    # a single ray cannot carry per-wavelength directions, so the path
    # commits to one uniformly-chosen bin with an S-fold weight (unbiased)
    s_count = throughput.shape[1]
    dispersive = m_cauchy > 0.0
    needs_hero = alive & trans & dispersive & (hero_idx < 0)
    h_new = jnp.minimum((ry * s_count).astype(jnp.int32), s_count - 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, s_count), 1)
    onehot = (bins == h_new[:, None]).astype(jnp.float32)
    throughput = jnp.where(
        needs_hero[:, None], throughput * onehot * jnp.float32(s_count), throughput
    )
    hero_idx = jnp.where(needs_hero, h_new, hero_idx)

    # wavelength-dependent IOR (Cauchy); non-dispersive lanes use the base
    lam_nm = jnp.where(
        hero_idx >= 0,
        scene.lambda_grid[jnp.maximum(hero_idx, 0)],
        jnp.float32(587.6),  # d-line; irrelevant when cauchy_b == 0
    )
    lam_um2 = (lam_nm * 1e-3) ** 2
    n_lam = m_ior + m_cauchy / lam_um2

    # continuation rays
    refl = reflect_vec(d, normal)
    cone = sample_in_cone(refl, m_rough, rx, ry)
    spec_dir = cone.where(m_rough >= 0.001, refl)
    diff_dir = cosine_hemisphere_bounce(rx, ry, normal)

    # refraction (Snell + Schlick-Fresnel + total internal reflection)
    trans_dir, reflects, n_or = refract_or_reflect(d, normal, n_lam, rx)
    trans_origin_out = ip + n_or * NEW_RAY_POSITION_OFFSET_DISTANCE
    trans_origin_in = ip - n_or * NEW_RAY_POSITION_OFFSET_DISTANCE
    trans_origin = trans_origin_out.where(reflects, trans_origin_in)

    new_dir = spec_dir.where(spec, trans_dir.where(trans, diff_dir))
    new_dir = new_dir.normalize()  # Ray::new normalizes
    # diffuse continuation starts at the UN-offset hit point (quirk §2.5).
    # Sky scenes (beyond-reference) offset it like every other child ray:
    # with environment emission a child that self-hits at t ~ 1e-7 vs one
    # that escapes differ by throughput*sky, so the un-offset origin's
    # float32 ULP coin-flip would render as ~60x salt-and-pepper noise and
    # make the jnp / Pallas / oracle backends disagree per pixel. The
    # static `scene.sky is not None` gate keeps sky-less scenes bit-equal
    # to the reference quirk. (Documented parity deviation: sky only.)
    diff_origin = offset_pos if scene.sky is not None else ip
    new_origin = offset_pos.where(spec, trans_origin.where(trans, diff_origin))

    can_bounce = bounces_left > jnp.uint32(1)
    cont = alive & can_bounce
    o = new_origin.where(cont, o)
    d = new_dir.where(cont, d)
    throughput = jnp.where(cont[:, None], throughput * m_albedo, throughput)
    pending_gate = jnp.where(cont, spec, pending_gate)

    new_state = _BounceState(
        o, d, throughput, radiance, cont, pending_gate, ray_count, hero_idx
    )
    if return_shadow_info:
        # the megakernel's NEE shadow rays: origin = the offset hit point,
        # relevance = live diffuse lanes (megakernel.py `relevant=` at its
        # shadow_blocked_fori_multi call). Consumed by the cluster-visit
        # replay (tools/visit_replay.py) — diagnostics only.
        return new_state, (
            offset_pos.x, offset_pos.y, offset_pos.z, contributes[:, 0]
        )
    return new_state


def integrate_frame(
    scene: SceneArrays,
    config: RenderConfig,
    frame_id: jax.Array,
    return_stats: bool = False,
    grid=None,
    grid_static=None,
    return_occupancy: bool = False,
    return_bounce_rays: bool = False,
):
    """Trace one progressive frame; returns linear RGB ``[H, W, 3]``
    (plus the reference-equivalent submitted-ray count if requested).
    Passing a ``UniformGrid`` switches intersection to DDA traversal.
    ``return_occupancy`` additionally returns the per-bounce live-lane
    counts ``[max_bounces]`` (lanes entering each bounce) — the wavefront
    occupancy diagnostic the Pallas megakernel's economics depend on.
    ``return_bounce_rays`` additionally returns the per-bounce ray record
    consumed by the cluster-visit replay (tools/visit_replay.py): a dict
    of ``[max_bounces, N]`` arrays — trace rays (``ox..dz``, ``alive`` at
    bounce entry) and NEE shadow-ray origins + diffuse relevance masks
    (``sx/sy/sz``, ``smask``)."""
    frame_id = jnp.asarray(frame_id, dtype=jnp.uint32)
    tracers = make_tracers(scene, grid, grid_static)
    origin, direction, px, py = generate_primary_rays(
        scene.cam_pos,
        scene.cam_dir,
        scene.cam_up,
        scene.fov_y_deg,
        config.width,
        config.height,
        frame_id,
        config.intended_frames,
        dof=scene_dof(scene, config),
    )
    n = config.width * config.height
    s = config.n_samples
    state = _BounceState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, s), dtype=jnp.float32),
        radiance=jnp.zeros((n, s), dtype=jnp.float32),
        alive=jnp.ones((n,), dtype=bool),
        pending_gate=jnp.zeros((n,), dtype=bool),
        ray_count=jnp.float32(0.0),
        hero_idx=jnp.full((n,), -1, dtype=jnp.int32),
    )

    if config.n_objects == 0:
        if scene.sky is not None:
            # every primary ray escapes: the whole frame is the sky color
            rad = jnp.broadcast_to(scene.sky[None, :], (n, s))
            rgb = spectra_to_rgb(rad, scene.xyz_weights, scene.xyz_to_rgb)
            rgb = rgb.reshape(config.height, config.width, 3)
        else:
            rgb = jnp.zeros((config.height, config.width, 3), dtype=jnp.float32)
        out = (rgb,)
        if return_stats:
            out += (jnp.float32(0.0),)
        if return_occupancy:
            out += (jnp.zeros((config.max_bounces,), jnp.float32),)
        return out if len(out) > 1 else rgb

    if return_bounce_rays:
        b = config.max_bounces
        rays_rec = {
            k: jnp.zeros((b, n), jnp.float32)
            for k in ("ox", "oy", "oz", "dx", "dy", "dz", "sx", "sy", "sz")
        }
        rays_rec["alive"] = jnp.zeros((b, n), bool)
        rays_rec["smask"] = jnp.zeros((b, n), bool)

        def body_rec(i, carry):
            st, hist, rec = carry
            hist = hist.at[i].set(jnp.sum(st.alive.astype(jnp.float32)))
            for k, v in (
                ("ox", st.origin.x), ("oy", st.origin.y), ("oz", st.origin.z),
                ("dx", st.direction.x), ("dy", st.direction.y),
                ("dz", st.direction.z), ("alive", st.alive),
            ):
                rec[k] = rec[k].at[i].set(v)
            bounces_left = (
                jnp.uint32(config.max_bounces) - i.astype(jnp.uint32)
            )
            st, (sx, sy, sz, smask) = _bounce(
                st, bounces_left, frame_id, px, py, scene, config, tracers,
                return_shadow_info=True,
            )
            for k, v in (("sx", sx), ("sy", sy), ("sz", sz), ("smask", smask)):
                rec[k] = rec[k].at[i].set(v)
            return st, hist, rec

        state, alive_hist, rays_rec = jax.lax.fori_loop(
            0, config.max_bounces, body_rec,
            (state, jnp.zeros((config.max_bounces,), jnp.float32), rays_rec),
        )
        rgb = spectra_to_rgb(
            state.radiance, scene.xyz_weights, scene.xyz_to_rgb
        ).reshape(config.height, config.width, 3)
        out = (rgb,)
        if return_stats:
            out += (state.ray_count,)
        if return_occupancy:
            out += (alive_hist,)
        return out + (rays_rec,)

    def body(i, carry):
        st, hist = carry
        hist = hist.at[i].set(jnp.sum(st.alive.astype(jnp.float32)))
        bounces_left = jnp.uint32(config.max_bounces) - i.astype(jnp.uint32)
        st = _bounce(
            st, bounces_left, frame_id, px, py, scene, config, tracers
        )
        return st, hist

    state, alive_hist = jax.lax.fori_loop(
        0, config.max_bounces, body,
        (state, jnp.zeros((config.max_bounces,), jnp.float32)),
    )

    rgb = spectra_to_rgb(state.radiance, scene.xyz_weights, scene.xyz_to_rgb)
    rgb = rgb.reshape(config.height, config.width, 3)
    out = (rgb,)
    if return_stats:
        out += (state.ray_count,)
    if return_occupancy:
        out += (alive_hist,)
    return out if len(out) > 1 else rgb


def accumulate_frame(
    accum: jax.Array, rgb: jax.Array, frame_id: jax.Array
) -> jax.Array:
    """Progressive running-average blend into the ``[H, W, 4]`` buffer with
    weight ``1 / (frame_id + 1)`` (reference ``src/main.rs:1316-1317``,
    ``src/custom_image.rs:59-79``)."""
    frame_id = jnp.asarray(frame_id, dtype=jnp.uint32)
    ratio = 1.0 / (frame_id + jnp.uint32(1)).astype(jnp.float32)
    old_factor = 1.0 - ratio
    new_rgb = accum[..., :3] * old_factor + rgb * ratio
    new_a = accum[..., 3] * old_factor + ratio  # alpha blends toward 1.0
    return jnp.concatenate([new_rgb, new_a[..., None]], axis=-1)


def accumulate_frames(
    accum: jax.Array, rgb_sum: jax.Array, first_frame_id, k: int
) -> jax.Array:
    """Blend the SUM of k consecutive frames' RGB into the running
    average in one step: equals (in exact arithmetic) k sequential
    ``accumulate_frame`` calls, since the running 1/(frame+1) blend is
    just the arithmetic mean. Consumes the path-regeneration kernel's
    summed output (``integrate_frames_pallas_regen``)."""
    first_frame_id = jnp.asarray(first_frame_id, dtype=jnp.uint32)
    inv = 1.0 / (first_frame_id + jnp.uint32(k)).astype(jnp.float32)
    old_factor = first_frame_id.astype(jnp.float32) * inv
    new_rgb = accum[..., :3] * old_factor + rgb_sum * inv
    new_a = accum[..., 3] * old_factor + jnp.float32(k) * inv
    return jnp.concatenate([new_rgb, new_a[..., None]], axis=-1)


def render_frame_step(
    scene: SceneArrays,
    config: RenderConfig,
    accum: jax.Array,
    frame_id: jax.Array,
    grid=None,
    grid_static=None,
) -> jax.Array:
    """One full progressive iteration: trace + blend. The unit the
    reference calls ``apply_shader2`` (``src/main.rs:1280-1322``)."""
    rgb = integrate_frame(scene, config, frame_id, grid=grid, grid_static=grid_static)
    return accumulate_frame(accum, rgb, frame_id)
