"""Measure block-tiled pixel->lane assignment WITH cluster culling (v5e).

Regen tiles are row-major: a 4096-lane tile is a ~4-row x full-width
sliver of the image, whose primary-ray frustum is a wide wedge that
crosses many object clusters. Assigning each tile a SQUARE image block
(64x64 pixels = 4096 lanes) instead gives a compact pyramidal frustum,
so the per-cluster AABB relevance test should skip far more clusters.
Block assignment is a pure pixel->lane permutation (the same bit-exact
machinery as the cost-sorted assignment, permuting raygen's COORDINATE
inputs): per-pixel results are identical, only tile membership changes.

A pre-clustering measurement of block perms was noise-level (~3%) —
block tiling only pays off through the cluster culling it enables, so it
must be measured WITH clusters.

    python tools/block_tile_bench.py [spheres] [--k 100] [--tile 4096]
        [--blocks 64x64,32x128]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def block_perm(width: int, height: int, bw: int, bh: int):
    """pixel->lane permutation placing each bh x bw image block in one
    contiguous lane run (block-major, row-major within the block).
    Returns (perm, inv) with perm[lane] = pixel index."""
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    key = (
        (ys // bh) * ((width + bw - 1) // bw) + (xs // bw)
    ) * (bw * bh) + (ys % bh) * bw + (xs % bw)
    perm = np.argsort(key.reshape(-1), kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return perm, inv


def bench(name: str, k: int, tile: int, blocks, camera: bool,
          unrolls=(), csize: int = 32) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _ = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    clusters = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=csize,
        camera_pos=np.asarray(
            [arrays.cam_pos[0], arrays.cam_pos[1], arrays.cam_pos[2]]
        ) if camera else None,
    )

    @partial(jax.jit, static_argnums=(1, 3, 4, 5, 6, 7, 8, 9))
    def launch(scn, cfg, fid, kk, ots, t, e, tl, cl, unroll, perm, inv):
        return integrate_frames_pallas_regen(
            scn, cfg, fid, ots, kk, tile=tl,
            has_transmission=t, has_emission=e, clusters=cl,
            lane_perm=perm, lane_inv=inv, member_unroll=unroll,
        )

    def run(perm, inv, label, unroll=1):
        out = launch(
            arrays, config, jnp.uint32(0), k, obj_types, ht, he, tile,
            clusters, unroll, perm, inv,
        )
        jax.block_until_ready(out)
        ref = np.asarray(out)
        t0 = time.perf_counter()
        n_launches = 2
        for i in range(n_launches):
            out = launch(
                arrays, config, jnp.uint32((i + 1) * k), k, obj_types, ht,
                he, tile, clusters, unroll, perm, inv,
            )
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (n_launches * k) * 1e3
        print(f"{name}: {label}: {ms:.2f} ms/frame", flush=True)
        return ref, ms

    ref, base_ms = run(None, None, f"row-major   regen(K={k}, tile {tile})")
    for u in unrolls:
        got, ms = run(
            None, None,
            f"unroll {u}    regen(K={k}, tile {tile})", unroll=u,
        )
        print(
            f"{name}:   -> {base_ms / ms:.2f}x, exact={np.array_equal(ref, got)}",
            flush=True,
        )
    for bw, bh in blocks:
        perm, inv = block_perm(config.width, config.height, bw, bh)
        for u in [1] + list(unrolls):
            got, ms = run(
                jnp.asarray(perm), jnp.asarray(inv),
                f"block {bw:3d}x{bh:<3d} u={u} regen(K={k}, tile {tile})",
                unroll=u,
            )
            print(
                f"{name}:   -> {base_ms / ms:.2f}x, "
                f"exact={np.array_equal(ref, got)}",
                flush=True,
            )


def main(argv=None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    k, tile, camera, csize = 100, 4096, False, 32
    blocks = [(64, 64)]
    unrolls = []
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--k":
            k = int(args[i + 1]); i += 2
        elif args[i] == "--tile":
            tile = int(args[i + 1]); i += 2
        elif args[i] == "--camera":
            camera = True; i += 1
        elif args[i] == "--unrolls":
            unrolls = [int(v) for v in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--size":
            csize = int(args[i + 1]); i += 2
        elif args[i] == "--blocks":
            blocks = [
                tuple(int(v) for v in b.split("x"))
                for b in args[i + 1].split(",")
            ]
            i += 2
        else:
            names.append(args[i]); i += 1
    names = names or ["spheres"]

    import jax

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for n in names:
        bench(n, k, tile, blocks, camera, unrolls, csize)
    return 0


if __name__ == "__main__":
    sys.exit(main())
