"""Structure-of-arrays 3-vector math.

On TPU a trailing dimension of 3 wastes 125/128 vector lanes, so ray and
geometry state is kept as three separate arrays (``Vec3`` of ``[n]``
components), giving the VPU fully-packed ``(8, 128)`` tiles. This replaces
the reference's ``nalgebra::Vector3`` scalar math (used throughout
reference ``src/shader.rs``) with batched elementwise ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Vec3(NamedTuple):
    """Three same-shaped arrays; broadcasts like jnp."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @staticmethod
    def from_array(a, axis: int = -1) -> "Vec3":
        """Split an ``[..., 3]`` array into components."""
        parts = jnp.split(jnp.asarray(a), 3, axis=axis)
        return Vec3(*(p.squeeze(axis) for p in parts))

    def to_array(self, axis: int = -1) -> jax.Array:
        return jnp.stack([self.x, self.y, self.z], axis=axis)

    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s) -> "Vec3":
        """Scalar (or broadcastable array) scaling."""
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def dot(self, o: "Vec3") -> jax.Array:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def magnitude_squared(self) -> jax.Array:
        return self.dot(self)

    def magnitude(self) -> jax.Array:
        return jnp.sqrt(self.dot(self))

    def normalize(self) -> "Vec3":
        """nalgebra-style normalize: divide by the norm (0-vectors yield
        NaN, matching the reference's behavior)."""
        return self * (1.0 / self.magnitude())

    def where(self, mask, other: "Vec3") -> "Vec3":
        """Per-lane select: ``mask ? self : other``."""
        return Vec3(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
        )

    def broadcast_to(self, shape) -> "Vec3":
        return Vec3(
            jnp.broadcast_to(self.x, shape),
            jnp.broadcast_to(self.y, shape),
            jnp.broadcast_to(self.z, shape),
        )

    def take(self, idx) -> "Vec3":
        """Gather along the leading axis."""
        return Vec3(self.x[idx], self.y[idx], self.z[idx])

    def reshape(self, shape) -> "Vec3":
        return Vec3(
            self.x.reshape(shape), self.y.reshape(shape), self.z.reshape(shape)
        )

    @staticmethod
    def full(shape, vals, dtype=jnp.float32) -> "Vec3":
        vx, vy, vz = vals
        return Vec3(
            jnp.full(shape, vx, dtype),
            jnp.full(shape, vy, dtype),
            jnp.full(shape, vz, dtype),
        )


def rotate(m_rows: tuple[Vec3, Vec3, Vec3], v: Vec3) -> Vec3:
    """Apply a 3x3 matrix given as three row-``Vec3``s: ``out_i = row_i . v``."""
    r0, r1, r2 = m_rows
    return Vec3(r0.dot(v), r1.dot(v), r2.dot(v))


def matrix_rows(m) -> tuple[Vec3, Vec3, Vec3]:
    """``[..., 3, 3]`` array -> three row Vec3s (each component ``[...]``)."""
    m = jnp.asarray(m)
    return (
        Vec3(m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]),
        Vec3(m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]),
        Vec3(m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]),
    )
