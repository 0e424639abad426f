"""Pixel->lane layout permutations for the wavefront kernels.

The megakernel's cluster culling is TILE-uniform: a 4096-lane tile visits
a cluster's member loop if ANY of its live rays can hit the cluster's
AABB. With the default row-major pixel order a tile is ~4 full scanlines
— rays fanning across the whole image width — so almost every cluster is
relevant to almost every tile. Morton (Z-curve) order makes every aligned
4096-lane tile a compact 64x64 pixel block (and every aligned 1024-lane
sub-group a 32x32 block): primary rays per tile form a tight cone, the
front-to-back cluster order tightens ``t_best`` quickly, and far clusters
get culled for the whole tile.

The permutation rides the existing ``lane_perm``/``lane_inv`` contract of
``integrate_frames_pallas_regen`` / ``render_persistent``: per-pixel
results are bit-identical to the unpermuted launch (tile membership does
not enter any lane's arithmetic — the reference-parity contract), only
wall-clock changes. This is the TPU substitute for a GPU tracer's
ray-sorting stage: a STATIC, zero-cost relabeling instead of a dynamic
sort, exploiting that primary coherence is known at layout time.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["morton_layout"]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of each uint32."""
    v = v.astype(np.uint32) & np.uint32(0xFFFF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


@functools.lru_cache(maxsize=8)
def _morton_order_np(width: int, height: int) -> np.ndarray:
    xs = _spread_bits(np.arange(width, dtype=np.uint32))
    ys = _spread_bits(np.arange(height, dtype=np.uint32))
    key = (ys[:, None].astype(np.uint64) << np.uint64(1)) | xs[None, :]
    # stable sort of the flattened keys: out-of-square pixels (W != H or
    # non-power-of-two) keep Z-curve order of the enclosing square grid
    return np.argsort(key.reshape(-1), kind="stable").astype(np.int32)


def morton_layout(width: int, height: int):
    """``(lane_perm, lane_inv)`` int32 device arrays assigning pixels to
    wavefront lanes in Morton (Z-curve) order: ``lane_perm[slot]`` is the
    flat pixel index computed by lane ``slot``; ``lane_inv`` is its
    inverse. Pass both to ``integrate_frames_pallas_regen`` /
    ``render_persistent``."""
    import jax.numpy as jnp

    order = _morton_order_np(width, height)
    return jnp.asarray(order), jnp.asarray(np.argsort(order).astype(np.int32))
