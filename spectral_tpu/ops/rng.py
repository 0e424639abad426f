"""Deterministic quasi-random number generation, bit-exact with the
reference (reference ``src/shader.rs:652-705``).

All three generators are pure uint32 bit manipulation, which XLA executes
with wrapping semantics on TPU — so the random streams (and therefore the
stochastic material branches and bounce directions) match the reference
exactly, a prerequisite for pixel-comparable renders.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# 1 / 2^32, the float32 nearest to the reference's literals
# (`1.0 / 0xffffffff as f32` rounds to 2^-32; `2.328_306_4e-10` also
# rounds to 2^-32 -- both reference literals are exactly this value).
# np (not jnp) scalar: a literal, not a traced constant — radical_inverse
# must stay usable inside pallas kernels (captured jnp constants are
# rejected by pallas_call); f32 result is preserved by weak typing
_INV_2_32 = np.float32(2.3283064365386963e-10)


def radical_inverse(bits):
    """Van der Corput radical inverse via bit reversal
    (reference ``src/shader.rs:655-662``; Hacker's Delight bit-reversal).

    Args:
        bits: uint32 array (or scalar).
    Returns:
        float32 in [0, 1).
    """
    u = jnp.uint32
    bits = jnp.asarray(bits, dtype=u)
    # rotate_right(16) == full 16-bit halves swap
    bits = (bits >> 16) | (bits << 16)
    bits = ((bits & u(0x55555555)) << 1) | ((bits & u(0xAAAAAAAA)) >> 1)
    bits = ((bits & u(0x33333333)) << 2) | ((bits & u(0xCCCCCCCC)) >> 2)
    bits = ((bits & u(0x0F0F0F0F)) << 4) | ((bits & u(0xF0F0F0F0)) >> 4)
    bits = ((bits & u(0x00FF00FF)) << 8) | ((bits & u(0xFF00FF00)) >> 8)
    return bits.astype(jnp.float32) * _INV_2_32


def hammersley(n, capital_n):
    """2D Hammersley point ``((n + 0.5) / N, radical_inverse(n + 1))``
    (reference ``src/shader.rs:670-675``). Used for the per-frame
    screen-wide sub-pixel jitter — one offset per frame for every pixel,
    NOT per-pixel anti-aliasing (compat quirk, SURVEY.md §2.2)."""
    n = jnp.asarray(n, dtype=jnp.uint32)
    capital_n = jnp.asarray(capital_n, dtype=jnp.uint32)
    x = (n.astype(jnp.float32) + jnp.float32(0.5)) / capital_n.astype(jnp.float32)
    y = radical_inverse(n + jnp.uint32(1))
    return x, y


def random_pcg3d(x, y, z):
    """Jarzynski PCG3D hash (reference ``src/shader.rs:685-705``,
    "Hash Functions for GPU Rendering", Jarzynski et al., JCGT 2020).

    Args:
        x, y, z: uint32 arrays (pixel x, pixel y, seed).
    Returns:
        three float32 arrays in [0, 1].
    """
    x = jnp.asarray(x, dtype=jnp.uint32)
    y = jnp.asarray(y, dtype=jnp.uint32)
    z = jnp.asarray(z, dtype=jnp.uint32)
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    x = y * z + x
    y = z * x + y
    z = x * y + z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = y * z + x
    y = z * x + y
    z = x * y + z
    return (
        x.astype(jnp.float32) * _INV_2_32,
        y.astype(jnp.float32) * _INV_2_32,
        z.astype(jnp.float32) * _INV_2_32,
    )
