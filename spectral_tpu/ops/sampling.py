"""Direction sampling: mirror reflection, cosine-importance hemisphere
bounces and roughness cones.

Vectorized re-design of reference ``src/shader.rs:709-755``; the basis
constructions replicate nalgebra's ``Rotation3::face_towards`` column
convention so sampled directions match the reference's streams.
"""

from __future__ import annotations

import jax.numpy as jnp

from spectral_tpu.ops.vecmath import Vec3

PI = jnp.float32(jnp.pi)


def reflect_vec(incident: Vec3, normal: Vec3) -> Vec3:
    """Mirror reflection (reference ``src/shader.rs:709-711``); the
    incident points *toward* the surface."""
    return incident - normal * (2.0 * normal.dot(incident))


def cosine_hemisphere_bounce(random_x, random_y, normal: Vec3) -> Vec3:
    """Cosine-importance-sampled bounce about ``normal`` (reference
    ``global_space_random_bounce_direction``, ``src/shader.rs:717-729``).

    Local sample: ``theta = asin(sqrt(rx))``, ``phi = 2 pi ry`` in a
    +z hemisphere, rotated by ``face_towards(normal, up)`` where ``up`` is
    +y unless nearly parallel to the normal (then +x)."""
    theta = jnp.arcsin(jnp.sqrt(random_x))
    phi = 2.0 * PI * random_y
    sin_t = jnp.sin(theta)
    local = Vec3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta))

    shape = jnp.shape(random_x)
    near_y = jnp.abs(normal.y) > 0.9999
    up = Vec3(
        jnp.where(near_y, jnp.float32(1.0), jnp.float32(0.0)),
        jnp.where(near_y, jnp.float32(0.0), jnp.float32(1.0)),
        jnp.broadcast_to(jnp.float32(0.0), shape),
    )

    # nalgebra Rotation3::face_towards(dir, up):
    #   z = dir.normalize(); x = (up x z).normalize(); y = (z x x).normalize()
    z = normal.normalize()
    x = up.cross(z).normalize()
    y = z.cross(x).normalize()
    return x * local.x + y * local.y + z * local.z


def refract_or_reflect(
    d: Vec3, normal: Vec3, n_lambda, random_fresnel
) -> tuple[Vec3, "object", "object"]:
    """Dielectric interaction (beyond-reference; SURVEY.md §2.12).

    Snell refraction with Schlick-Fresnel reflectance and total internal
    reflection. ``d`` is the (normalized) incident direction, ``normal``
    the outward surface normal, ``n_lambda`` the per-lane refractive
    index, ``random_fresnel`` a uniform [0,1] draw choosing between the
    reflected and refracted branch (probability = reflectance, so no
    weight is needed).

    Returns ``(direction, reflected_mask, oriented_normal)`` where
    ``oriented_normal`` faces against the incident ray (for origin
    offsetting: reflected rays leave on the incident side, refracted rays
    on the far side).
    """
    cosi_signed = -d.dot(normal)
    entering = cosi_signed > 0.0
    sgn = jnp.where(entering, 1.0, -1.0)
    n_or = normal * sgn
    cosi = jnp.abs(cosi_signed)
    eta = jnp.where(entering, 1.0 / n_lambda, n_lambda)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    cos_t = jnp.sqrt(jnp.maximum(k, 0.0))
    r0 = ((n_lambda - 1.0) / (n_lambda + 1.0)) ** 2
    cos_x = jnp.where(entering, cosi, cos_t)
    fresnel = r0 + (1.0 - r0) * (1.0 - cos_x) ** 5
    reflected = tir | (random_fresnel < fresnel)
    refr = d * eta + n_or * (eta * cosi - cos_t)
    refl = reflect_vec(d, n_or)
    return refl.where(reflected, refr), reflected, n_or


def sample_in_cone(
    original_direction: Vec3, roughness, random_x, random_y
) -> Vec3:
    """Perturb a direction within a roughness-controlled cone (reference
    ``sample_in_cone``, ``src/shader.rs:736-755``): half-angle
    ``roughness^2 * pi/2``, uniform-in-cos-theta."""
    theta_max = roughness * roughness * (PI / 2.0)
    cos_theta = (1.0 - random_x) + random_x * jnp.cos(theta_max)
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * PI * random_y
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)

    w = original_direction.normalize()
    shape = jnp.shape(w.x)
    near_z = jnp.abs(w.z) < 0.999
    a = Vec3(
        jnp.where(near_z, jnp.float32(0.0), jnp.float32(1.0)),
        jnp.broadcast_to(jnp.float32(0.0), shape),
        jnp.where(near_z, jnp.float32(1.0), jnp.float32(0.0)),
    )
    v = w.cross(a).normalize()
    u = v.cross(w)
    return (u * local.x + v * local.y + w * local.z).normalize()
