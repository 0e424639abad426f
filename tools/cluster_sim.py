#!/usr/bin/env python
"""Host-side exact simulation of the clustered trace loop's culling at
bounce 0 (primary rays), for layout/cluster-plan experiments without TPU
recompiles.

Replicates trace_tile_fori's relevance walk exactly for sphere scenes:
clusters visited in plan order, a cluster is entered when ANY lane of the
tile satisfies ``slab_hit & (t_entry <= t_best)``, and entering a cluster
tightens every lane's t_best with its members' exact intersection t.
Reports visited-cluster fraction and executed member-test fraction per
layout, plus the per-lane useful-test fraction (tests on objects that a
perfect per-lane oracle would also run).

Usage: python tools/cluster_sim.py [n_spheres] [cluster_size]
"""

from __future__ import annotations

import sys

import numpy as np


def slab_t(o, d, bmin, bmax):
    """Vectorized slab test: o,d [N,3]; bmin/bmax [3] -> (t_min, hit)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        t1 = (bmin[None, :] - o) * inv
        t2 = (bmax[None, :] - o) * inv
    lo = np.minimum(t1, t2).max(axis=1)
    hi = np.maximum(t1, t2).min(axis=1)
    hit = hi >= np.maximum(lo, 0.0)
    return lo, hit


def sphere_t(o, d, c, r):
    """o,d [N,3]; c [3], r scalar -> t (inf on miss)."""
    oc = o - c[None, :]
    a = (d * d).sum(1)
    b = 2.0 * (oc * d).sum(1)
    cc = (oc * oc).sum(1) - r * r
    disc = b * b - 4.0 * a * cc
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    t = np.where(t1 >= 0, t1, t2)
    t = np.where(ok & (t > 0), t, np.inf)
    return t


def main(n_spheres=1000, cluster_size=64):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")
    from spectral_tpu.ops.pallas.megakernel import plan_clusters
    from spectral_tpu.render.camera import generate_primary_rays
    from spectral_tpu.render.layout import morton_layout
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    scene = presets.sphere_field(n_spheres=n_spheres)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    sigma, runs = plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max), obj_types,
        cluster_size=cluster_size, camera_pos=np.asarray(arrays.cam_pos)[:3],
    )
    spos = np.asarray(arrays.sphere_pos)[list(sigma)]
    srad = np.asarray(arrays.radius)[list(sigma)]
    amin = np.asarray(arrays.aabb_min)[list(sigma)]
    amax = np.asarray(arrays.aabb_max)[list(sigma)]

    o, d, _px, _py = generate_primary_rays(
        arrays.cam_pos, arrays.cam_dir, arrays.cam_up, arrays.fov_y_deg,
        config.width, config.height, np.uint32(0), config.intended_frames,
    )
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    n = o.shape[0]
    tile = 4096

    # per-lane per-cluster entry t + hit (layout-independent)
    n_cl = len(runs)
    ct_min = np.empty((n_cl, n), np.float32)
    c_hit = np.empty((n_cl, n), bool)
    member_t = {}
    for ci, (_tag, s0, s1, _cl) in enumerate(runs):
        bmin = amin[s0:s1].min(0)
        bmax = amax[s0:s1].max(0)
        lo, hit = slab_t(o, d, bmin, bmax)
        ct_min[ci] = lo
        c_hit[ci] = hit
        ts = np.stack(
            [sphere_t(o, d, spos[i], srad[i]) for i in range(s0, s1)]
        )
        member_t[ci] = ts  # [members, N]

    # perfect per-lane oracle: tests only on clusters the lane itself needs
    # (walk clusters in order with the lane's own t_best)
    lane_tbest = np.full(n, np.inf, np.float32)
    lane_tests = np.zeros(n, np.float64)
    for ci, (_tag, s0, s1, _cl) in enumerate(runs):
        rel = c_hit[ci] & (ct_min[ci] <= lane_tbest)
        lane_tests += rel * (s1 - s0)
        tmin = member_t[ci].min(0)
        lane_tbest = np.where(rel, np.minimum(lane_tbest, tmin), lane_tbest)

    results = {}
    perms = {
        "rowmajor": np.arange(n),
        "morton": np.asarray(morton_layout(config.width, config.height)[0]),
    }
    for name, perm in perms.items():
        ct = ct_min[:, perm]
        ch = c_hit[:, perm]
        n_pad = -(-n // tile) * tile
        visits = 0
        tests = 0
        total_possible = 0
        tbest = np.full(n_pad, np.inf, np.float32)
        for ci, (_tag, s0, s1, _cl) in enumerate(runs):
            ctp = np.full(n_pad, np.inf, np.float32)
            ctp[:n] = ct[ci]
            chp = np.zeros(n_pad, bool)
            chp[:n] = ch[ci]
            rel = (chp & (ctp <= tbest)).reshape(-1, tile)
            tile_rel = rel.any(1)  # tile-uniform visit decision
            visits += int(tile_rel.sum())
            tests += int(tile_rel.sum()) * (s1 - s0) * tile
            total_possible += (n_pad // tile) * (s1 - s0) * tile
            # entered tiles tighten t_best with exact member t
            tmin = np.full(n_pad, np.inf, np.float32)
            tmin[:n] = member_t[ci].min(0)
            enter = np.repeat(tile_rel, tile)
            tbest = np.where(enter, np.minimum(tbest, tmin), tbest)
        results[name] = {
            "visited_cluster_frac": visits / (n_cl * (n_pad // tile)),
            "executed_member_test_frac": tests / total_possible,
        }
        print(
            f"{name}: visited clusters {results[name]['visited_cluster_frac']:.3f}, "
            f"member tests {results[name]['executed_member_test_frac']:.3f} of dense",
            flush=True,
        )
    print(
        f"per-lane oracle: member tests {lane_tests.mean() / len(sigma):.3f}"
        f" of dense (lower bound for sub-tile culling)"
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 1000, int(a[1]) if len(a) > 1 else 64)
