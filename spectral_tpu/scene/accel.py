"""Uniform-grid acceleration structure.

The reference traces by brute force — every ray tests every object
(reference ``src/shader.rs:471``). Brute force is genuinely TPU-friendly
(dense, branchless) up to moderate object counts, but the 1000-object
stress config (BASELINE.json #4) asks for an acceleration structure. A
BVH's divergent stack walk maps poorly onto the VPU; a **uniform grid
with 3D-DDA traversal** is the TPU-shaped choice: fixed-size state per
lane, a bounded masked loop, and per-cell object lists visited in index
order (preserving the reference's lowest-index tie rule).

The grid is built on the host at flatten time (object-AABB / cell overlap
into CSR lists) and shipped as three device tables; traversal lives in
``spectral_tpu.ops.grid_trace``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.scene.flatten import SceneArrays

F32 = np.float32


@dataclasses.dataclass(frozen=True)
class GridStatic:
    """Static traversal parameters (hashable, jit-static)."""

    res: tuple[int, int, int]
    max_items_per_cell: int
    n_items: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UniformGrid:
    origin: jax.Array  # [3] grid minimum corner
    cell_size: jax.Array  # [3]
    inv_cell: jax.Array  # [3]
    cell_start: jax.Array  # [n_cells + 1] i32, CSR offsets (x-major)
    items: jax.Array  # [n_items] i32 object indices, ascending per cell


def build_grid(
    scene: SceneArrays, res: tuple[int, int, int] | None = None
) -> tuple[UniformGrid, GridStatic]:
    """Host-side build: bin every object's world AABB into overlapped cells.

    ``res`` defaults to a cube-root heuristic (~4 objects per occupied
    cell for uniformly spread scenes).
    """
    aabb_min = np.asarray(scene.aabb_min, dtype=F32)
    aabb_max = np.asarray(scene.aabb_max, dtype=F32)
    n_obj = len(aabb_min)
    if n_obj == 0:
        raise ValueError("cannot build a grid for an empty scene")

    lo = aabb_min.min(axis=0)
    hi = aabb_max.max(axis=0)
    extent = np.maximum(hi - lo, F32(1e-4))
    # pad so boundary geometry is strictly inside
    lo = (lo - extent * F32(1e-3)).astype(F32)
    hi = (hi + extent * F32(1e-3)).astype(F32)
    extent = (hi - lo).astype(F32)

    if res is None:
        r = max(2, min(64, int(round(float(n_obj) ** (1 / 3) * 2))))
        res = (r, r, r)
    rx, ry, rz = res
    cell = (extent / np.array(res, dtype=F32)).astype(F32)

    cells: list[list[int]] = [[] for _ in range(rx * ry * rz)]
    for o in range(n_obj):
        c0 = np.clip(((aabb_min[o] - lo) / cell).astype(np.int64), 0, np.array(res) - 1)
        c1 = np.clip(((aabb_max[o] - lo) / cell).astype(np.int64), 0, np.array(res) - 1)
        for ix in range(c0[0], c1[0] + 1):
            for iy in range(c0[1], c1[1] + 1):
                for iz in range(c0[2], c1[2] + 1):
                    cells[(ix * ry + iy) * rz + iz].append(o)

    counts = np.array([len(c) for c in cells], dtype=np.int32)
    cell_start = np.zeros(len(cells) + 1, dtype=np.int32)
    np.cumsum(counts, out=cell_start[1:])
    items = np.fromiter(
        (o for c in cells for o in c), dtype=np.int32, count=int(counts.sum())
    )

    grid = UniformGrid(
        origin=jnp.asarray(lo),
        cell_size=jnp.asarray(cell),
        inv_cell=jnp.asarray((F32(1.0) / cell).astype(F32)),
        cell_start=jnp.asarray(cell_start),
        items=jnp.asarray(items),
    )
    static = GridStatic(
        res=(int(rx), int(ry), int(rz)),
        max_items_per_cell=int(counts.max()) if len(counts) else 0,
        n_items=int(counts.sum()),
    )
    return grid, static
