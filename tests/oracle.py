"""Scalar reference oracle.

An independent, deliberately-slow float32 numpy implementation of the
reference renderer's *recursive* per-pixel algorithm (reference
``src/shader.rs``), used to validate that the vectorized wavefront
integrator flattens the recursion correctly. Structure mirrors the Rust:
``submit_ray`` -> ``intersection_shader`` / ``hit_shader`` /
``miss_shader`` with per-call PCG3D randomness.

Scalar f32 discipline: every literal is wrapped, every vector is a
float32 ndarray, so results track the reference's arithmetic closely
(exact for integer/RNG paths; to rounding for transcendental ones).
"""

from __future__ import annotations

import numpy as np

F = np.float32
U32 = 0xFFFFFFFF

OFFSET = F(1e-5)
SPEC_MIN = F(1e-4)
F32_DELTA = F(1e-5)


# ----------------------------------------------------------------- RNG

def _wrap(x):
    return x & U32


def radical_inverse(bits: int) -> np.float32:
    bits = _wrap(bits)
    bits = _wrap((bits >> 16) | (bits << 16))
    bits = _wrap(((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1))
    bits = _wrap(((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2))
    bits = _wrap(((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4))
    bits = _wrap(((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8))
    return F(F(bits) * F(2.3283064365386963e-10))


def hammersley(n: int, capital_n: int):
    return (
        F(F(F(n) + F(0.5)) / F(capital_n)),
        radical_inverse(n + 1),
    )


def random_pcg3d(x: int, y: int, z: int):
    x, y, z = _wrap(x), _wrap(y), _wrap(z)
    x = _wrap(x * 1664525 + 1013904223)
    y = _wrap(y * 1664525 + 1013904223)
    z = _wrap(z * 1664525 + 1013904223)
    x = _wrap(y * z + x)
    y = _wrap(z * x + y)
    z = _wrap(x * y + z)
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    x = _wrap(y * z + x)
    y = _wrap(z * x + y)
    z = _wrap(x * y + z)
    inv = F(2.3283064365386963e-10)
    return F(F(x) * inv), F(F(y) * inv), F(F(z) * inv)


# ---------------------------------------------------------- vector math

def v3(x, y, z):
    return np.array([x, y, z], dtype=F)


def norm(v):
    return v / F(np.sqrt(v.dot(v)))


def reflect_vec(incident, normal):
    return (incident - F(2.0) * normal.dot(incident) * normal).astype(F)


def face_towards(direction, up):
    z = norm(direction)
    x = norm(np.cross(up, z).astype(F))
    y = norm(np.cross(z, x).astype(F))
    return np.stack([x, y, z], axis=1)  # columns


def global_space_random_bounce_direction(rx, ry, normal):
    theta = F(np.arcsin(F(np.sqrt(rx))))
    phi = F(F(2.0) * F(np.pi) * ry)
    local = v3(
        F(np.sin(theta)) * F(np.cos(phi)),
        F(np.sin(theta)) * F(np.sin(phi)),
        F(np.cos(theta)),
    )
    up = v3(0.0, 1.0, 0.0)
    if abs(normal.dot(up)) > F(0.9999):
        up = v3(1.0, 0.0, 0.0)
    m = face_towards(normal, up)
    return (m @ local).astype(F)


def sample_in_cone(original_direction, roughness, rx, ry):
    theta_max = F(roughness * roughness * F(np.pi / 2.0))
    cos_theta = F(F(F(1.0) - rx) + F(rx * F(np.cos(theta_max))))
    sin_theta = F(np.sqrt(F(F(1.0) - cos_theta * cos_theta)))
    phi = F(F(2.0) * F(np.pi) * ry)
    local = v3(
        sin_theta * F(np.cos(phi)), sin_theta * F(np.sin(phi)), cos_theta
    )
    w = norm(original_direction)
    a = v3(0.0, 0.0, 1.0) if abs(w[2]) < F(0.999) else v3(1.0, 0.0, 0.0)
    v = norm(np.cross(w, a).astype(F))
    u = np.cross(v, w).astype(F)
    return norm((u * local[0] + v * local[1] + w * local[2]).astype(F))


# --------------------------------------------------------- intersection

def ray_aabb_intersection(o, d, pmin, pmax):
    """Reference src/shader.rs:531-556. Returns (t_min, t_max) or None."""
    t_min = F(-np.inf)
    t_max = F(np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(3):
            inv = F(F(1.0) / d[i])
            t1 = F((pmin[i] - o[i]) * inv)
            t2 = F((pmax[i] - o[i]) * inv)
            t_near, t_far = (t2, t1) if inv < 0.0 else (t1, t2)
            # Rust f32::max/min ignore NaN
            if not np.isnan(t_near):
                t_min = max(t_min, t_near)
            if not np.isnan(t_far):
                t_max = min(t_max, t_far)
            if t_max <= t_min:
                return None
    if t_max < 0.0:
        return None
    return t_min, t_max


def ray_sphere_intersection(o, d, sphere_pos, radius):
    oc = (o - sphere_pos).astype(F)
    a = F(d.dot(d))
    b = F(F(2.0) * oc.dot(d))
    c = F(oc.dot(oc) - radius * radius)
    disc = F(b * b - F(4.0) * a * c)
    if disc < 0.0:
        return None
    sq = F(np.sqrt(disc))
    t1 = F((-b - sq) / (F(2.0) * a))
    t2 = F((-b + sq) / (F(2.0) * a))
    if disc == 0.0:
        return (t1,) if t1 >= 0.0 else None
    lo, hi = min(t1, t2), max(t1, t2)
    if lo >= 0.0:
        return (lo,)
    if hi >= 0.0:
        return (hi,)
    return None


def ray_triangle_intersection(o, d, v0, e1, e2):
    """Moller-Trumbore, two-sided, component math in the exact op order
    of ``ops.geometry.triangle_t`` (Vec3 cross/dot component order, f32
    throughout). Beyond-reference geometry. Returns t or None."""
    def cross(ax, ay, az, bx, by, bz):
        return (
            F(ay * bz - az * by),
            F(az * bx - ax * bz),
            F(ax * by - ay * bx),
        )

    def dot3(ax, ay, az, bx, by, bz):
        return F(F(F(ax * bx) + F(ay * by)) + F(az * bz))

    with np.errstate(divide="ignore", invalid="ignore"):
        px, py, pz = cross(d[0], d[1], d[2], e2[0], e2[1], e2[2])
        det = dot3(e1[0], e1[1], e1[2], px, py, pz)
        inv_det = F(F(1.0) / det)
        sx, sy, sz = F(o[0] - v0[0]), F(o[1] - v0[1]), F(o[2] - v0[2])
        u = F(dot3(sx, sy, sz, px, py, pz) * inv_det)
        qx, qy, qz = cross(sx, sy, sz, e1[0], e1[1], e1[2])
        v = F(dot3(d[0], d[1], d[2], qx, qy, qz) * inv_det)
        t = F(dot3(e2[0], e2[1], e2[2], qx, qy, qz) * inv_det)
    if u >= 0.0 and v >= 0.0 and F(u + v) <= 1.0 and t >= 0.0:
        return t, u, v
    return None


class OracleRenderer:
    """Drives the recursion over numpy copies of the flattened scene."""

    def __init__(self, scene_arrays, config):
        g = lambda a: np.asarray(a)
        self.obj_type = g(scene_arrays.obj_type)
        self.slab_min = g(scene_arrays.slab_min)
        self.slab_max = g(scene_arrays.slab_max)
        self.shift = g(scene_arrays.shift)
        self.inv_rot = g(scene_arrays.inv_rot)
        self.rot = g(scene_arrays.rot)
        self.aabb_min = g(scene_arrays.aabb_min)
        self.aabb_max = g(scene_arrays.aabb_max)
        self.center = g(scene_arrays.center)
        self.half_dim = g(scene_arrays.half_dim)
        self.sphere_pos = g(scene_arrays.sphere_pos)
        self.radius = g(scene_arrays.radius)
        self.metallicness = g(scene_arrays.metallicness)
        self.roughness = g(scene_arrays.roughness)
        self.albedo = g(scene_arrays.albedo)
        self.tex_scale = g(scene_arrays.tex_scale)
        self.tex_low = g(scene_arrays.tex_low)
        self.transmission = g(scene_arrays.transmission)
        self.ior = g(scene_arrays.ior)
        self.cauchy_b = g(scene_arrays.cauchy_b)
        self.emission = g(scene_arrays.emission)
        self.lambda_grid = g(scene_arrays.lambda_grid)
        self.light_pos = g(scene_arrays.light_pos)
        self.light_spec = g(scene_arrays.light_spec)
        self.cam_pos = g(scene_arrays.cam_pos)
        self.cam_dir = g(scene_arrays.cam_dir)
        self.cam_up = g(scene_arrays.cam_up)
        self.fov_y_deg = F(scene_arrays.fov_y_deg)
        self.xyz_weights = g(scene_arrays.xyz_weights)
        self.xyz_to_rgb = g(scene_arrays.xyz_to_rgb)
        sky = getattr(scene_arrays, "sky", None)
        self.sky = g(sky) if sky is not None else None
        self.config = config
        self.smooth_tri = bool(getattr(scene_arrays, "smooth_tri_static", False))
        self.n_obj = len(self.obj_type)
        self.n_samples = self.albedo.shape[1] if self.n_obj else config.n_samples

    # ------------------------------------------------------ intersection

    def intersection_shader(self, o, d, i):
        """Per-type exact test (reference src/shader.rs:302-357)."""
        ot = self.obj_type[i]
        if ot == 3:  # triangle (mesh face; v0/e1/e2 reuse shift/slab cols)
            res = ray_triangle_intersection(
                o, d, self.shift[i], self.slab_min[i], self.slab_max[i]
            )
            return None if res is None else res[0]
        if ot == 1:  # sphere
            res = ray_sphere_intersection(o, d, self.sphere_pos[i], self.radius[i])
            return None if res is None else res[0]
        if ot == 0:  # plain box
            res = ray_aabb_intersection(o, d, self.aabb_min[i], self.aabb_max[i])
            if res is None:
                return None  # cull would have rejected too
            t1, t2 = res
            lo = min(t1, t2)
            return lo if lo >= 0.0 else max(t1, t2)
        # rotated box: inverse-rotate, slab in local space
        inv = self.inv_rot[i]
        lo_o = (inv @ (o - self.shift[i])).astype(F)
        lo_d = (inv @ d).astype(F)
        res = ray_aabb_intersection(lo_o, lo_d, self.slab_min[i], self.slab_max[i])
        if res is None:
            return None
        t1, t2 = res
        mn, mx = min(t1, t2), max(t1, t2)
        if mn >= 0.0:
            return mn
        if mx >= 0.0:
            return mx
        return None

    def submit_ray(self, o, d, max_bounces, px, py, frame_id,
                   skip_hit=False, max_hit_distance=F(np.inf), hero=-1):
        """Reference submit_ray (src/shader.rs:468-495). Returns
        (spectrum, hit, hit_distance). ``hero`` carries the path's hero
        wavelength bin through the recursion (beyond-reference physics)."""
        hits = []
        for i in range(self.n_obj):
            # outer world-AABB cull (reference src/shader.rs:472)
            if ray_aabb_intersection(o, d, self.aabb_min[i], self.aabb_max[i]) is None:
                continue
            t = self.intersection_shader(o, d, i)
            if t is not None and t > 0.0:
                hits.append((i, t))
        hits.sort(key=lambda p: p[1])

        zero = np.zeros(self.n_samples, dtype=F)
        # beyond-reference sky: environment emission replaces the zero
        # miss shader for TRACED rays (never for shadow occlusion queries)
        missed = self.sky if (self.sky is not None and not skip_hit) else zero
        if hits:
            i, t = hits[0]
            if t <= max_hit_distance:
                if skip_hit:
                    return zero, True, F(0.0)
                return self.hit_shader(
                    o, d, i, t, max_bounces, px, py, frame_id, hero
                )
            return missed, False, F(0.0)
        return missed, False, F(0.0)

    # ------------------------------------------------------------ normals

    def _normal(self, i, ip, o=None, d=None):
        ot = self.obj_type[i]
        if ot == 3:  # triangle: normalize(n0 + u*dn1 + v*dn2) — Phong
            # interpolation via the hit's barycentrics. Scene-level
            # smooth gate mirrors the jnp path's smooth_tri_static: all-
            # flat scenes return the stored winding normal bit-exactly.
            n0, dn1, dn2 = self.inv_rot[i].astype(F)
            if o is None or not self.smooth_tri:
                return n0
            res = ray_triangle_intersection(
                o, d, self.shift[i], self.slab_min[i], self.slab_max[i]
            )
            if res is None:  # grazing re-test miss: fall back flat
                return n0
            _t, u, v = res
            return norm((n0 + F(u) * dn1 + F(v) * dn2).astype(F))
        if ot == 0:
            amin, amax = self.aabb_min[i], self.aabb_max[i]
            comps = []
            for k in range(3):
                if abs(ip[k] - amin[k]) < F32_DELTA:
                    comps.append(F(-1.0))
                elif abs(ip[k] - amax[k]) < F32_DELTA:
                    comps.append(F(1.0))
                else:
                    comps.append(F(0.0))
            return norm(np.array(comps, dtype=F))
        if ot == 1:
            return norm((ip - self.sphere_pos[i]).astype(F))
        # rotated box (reference src/shader.rs:608-650)
        inv = self.inv_rot[i]
        local = (inv @ (ip - self.center[i])).astype(F)
        half = self.half_dim[i]
        dx = abs(half[0] - local[0]); dxn = abs(-half[0] - local[0])
        dy = abs(half[1] - local[1]); dyn = abs(-half[1] - local[1])
        dz = abs(half[2] - local[2]); dzn = abs(-half[2] - local[2])
        min_dist, n_local = dx, v3(1, 0, 0)
        if dxn < min_dist:
            min_dist, n_local = dxn, v3(-1, 0, 0)
        if dy < min_dist:
            min_dist, n_local = dy, v3(0, 1, 0)
        if dyn < min_dist:
            min_dist, n_local = dyn, v3(0, -1, 0)
        if dz < min_dist:
            min_dist, n_local = dz, v3(0, 0, 1)
        if dzn < min_dist:
            n_local = v3(0, 0, -1)
        return (self.rot[i] @ n_local).astype(F)

    # --------------------------------------------------------- hit shader

    def hit_shader(self, o, d, i, t, max_bounces, px, py, frame_id, hero=-1):
        ip = (o + d * t).astype(F)
        normal = self._normal(i, ip, o, d)
        new_pos = (ip + normal * OFFSET).astype(F)

        received = np.zeros(self.n_samples, dtype=F)
        rx, ry, rz = random_pcg3d(px, py, frame_id + max_bounces)

        if rz < self.metallicness[i]:
            if max_bounces > 1:
                refl = reflect_vec(d, normal)
                if self.roughness[i] < 0.001:
                    nd = refl
                else:
                    nd = sample_in_cone(refl, self.roughness[i], rx, ry)
                spec, _hit, hd = self.submit_ray(
                    new_pos, norm(nd), max_bounces - 1, px, py, frame_id,
                    hero=hero,
                )
                # the short-child gate only discards HITS closer than the
                # epsilon; a child that escaped to the sky contributes
                # (matches the wavefront's gate_ok, true at t == +inf)
                if hd > SPEC_MIN or not _hit:
                    received = (received + spec).astype(F)
        elif rz < self.metallicness[i] + self.transmission[i]:
            # beyond-reference dielectric branch (mirrors the wavefront
            # integrator: Snell + Schlick-Fresnel + TIR, hero-wavelength
            # collapse at the first dispersive event)
            s_count = self.n_samples
            collapse_here = self.cauchy_b[i] > 0.0 and hero < 0
            if collapse_here:
                hero = min(int(ry * s_count), s_count - 1)
            lam_nm = self.lambda_grid[hero] if hero >= 0 else F(587.6)
            lam_um2 = F((lam_nm * F(1e-3)) ** 2)
            n_lam = F(self.ior[i] + self.cauchy_b[i] / lam_um2)

            cosi_signed = F(-d.dot(normal))
            entering = cosi_signed > 0.0
            n_or = (normal if entering else -normal).astype(F)
            cosi = abs(cosi_signed)
            eta = F(1.0 / n_lam) if entering else n_lam
            k = F(1.0 - eta * eta * (1.0 - cosi * cosi))
            tir = k < 0.0
            cos_t = F(np.sqrt(max(k, 0.0)))
            r0 = F(((n_lam - 1.0) / (n_lam + 1.0)) ** 2)
            cos_x = cosi if entering else cos_t
            fresnel = F(r0 + (1.0 - r0) * (1.0 - cos_x) ** 5)
            reflects = bool(tir or (rx < fresnel))
            if reflects:
                nd = reflect_vec(d, n_or)
                origin = (ip + n_or * OFFSET).astype(F)
            else:
                nd = (d * eta + n_or * F(eta * cosi - cos_t)).astype(F)
                origin = (ip - n_or * OFFSET).astype(F)
            if max_bounces > 1:
                spec, _hit, _hd = self.submit_ray(
                    origin, norm(nd), max_bounces - 1, px, py, frame_id,
                    hero=hero,
                )
                if collapse_here:
                    picked = np.zeros(s_count, dtype=F)
                    picked[hero] = F(s_count)
                    spec = (spec * picked).astype(F)
                received = (received + spec).astype(F)
        else:
            for li in range(len(self.light_pos)):
                direction = (self.light_pos[li] - new_pos).astype(F)
                distance = F(np.sqrt(direction.dot(direction)))
                dn = norm(direction)
                _spec, blocked, _hd = self.submit_ray(
                    new_pos, dn, 2, px, py, frame_id,
                    skip_hit=True, max_hit_distance=distance,
                )
                if not blocked:
                    adjusted = (self.light_spec[li] / direction.dot(direction)).astype(F)
                    adjusted = (adjusted * max(norm(dn).dot(normal), F(0.0))).astype(F)
                    adjusted = (adjusted * max((-d).dot(normal), F(0.0))).astype(F)
                    received = (received + adjusted).astype(F)
            if max_bounces > 1:
                nd = global_space_random_bounce_direction(rx, ry, normal)
                # diffuse child at the UN-offset hit point (reference quirk
                # src/shader.rs:444) — except sky scenes, where the
                # self-hit coin-flip must be deterministic (same static
                # gate as integrator.py / megakernel.py)
                d_origin = new_pos if self.sky is not None else ip
                spec, _hit, _hd = self.submit_ray(
                    d_origin, norm(nd), max_bounces - 1, px, py, frame_id,
                    hero=hero,
                )
                received = (received + np.maximum(spec, F(0.0))).astype(F)

        # emission (beyond-reference area lights) rides above the albedo
        albedo = self.albedo[i]
        if self.tex_scale[i] > 0.0:
            # checker texture factor, op order of integrator.checker_factor
            inv = F(F(1.0) / self.tex_scale[i])
            pp = F(
                F(np.floor(F(ip[0] * inv)) + np.floor(F(ip[1] * inv)))
                + np.floor(F(ip[2] * inv))
            )
            odd = F(pp - F(2.0) * F(np.floor(F(pp * F(0.5))))) != 0.0
            factor = self.tex_low[i] if odd else F(1.0)
            albedo = (albedo * factor).astype(F)
        return (
            (self.emission[i] + albedo * received).astype(F),
            True,
            F(t),
        )

    # ----------------------------------------------------------- ray gen

    def ray_generation(self, px, py, frame_id):
        c = self.config
        w, h = F(c.width), F(c.height)
        aspect = F(w / h)
        fov_half_rad = F(F(self.fov_y_deg / F(2.0)) / F(180.0) * F(np.pi))
        focal = F(F(1.0) / F(np.tan(fov_half_rad)))
        ox, oy = hammersley(frame_id, c.intended_frames)
        y = F(-(F(F((F(py) + oy) / h) * F(2.0)) - F(1.0)))
        x = F(F(F(F((F(px) + ox) / w) * F(2.0)) - F(1.0)) * aspect)
        up = norm(self.cam_up)
        forward = norm(self.cam_dir)
        right = norm(np.cross(forward, up).astype(F))
        true_up = np.cross(right, forward).astype(F)
        d = (forward * focal - right * x + true_up * y).astype(F)
        d = norm(norm(d))
        spec, _hit, _hd = self.submit_ray(
            self.cam_pos.astype(F), d, self.config.max_bounces, px, py, frame_id
        )
        return self.get_rgb_early(spec)

    def get_rgb_early(self, spectrum):
        acc = np.zeros(3, dtype=F)
        for i in range(len(self.xyz_weights)):
            acc = (acc + self.xyz_weights[i] * spectrum[i]).astype(F)
        return (self.xyz_to_rgb @ acc).astype(F)

    def render_frame(self, frame_id):
        c = self.config
        img = np.zeros((c.height, c.width, 3), dtype=F)
        for py in range(c.height):
            for px in range(c.width):
                img[py, px] = self.ray_generation(px, py, frame_id)
        return img
