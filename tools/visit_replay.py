#!/usr/bin/env python
"""Measured cluster-visit fractions for the clustered megakernel loops.

The roofline accounting (utils/flops.py) counts clustered member loops
DENSE — every cluster visited by every tile every bounce — which is an
upper bound only. This tool measures the actual visit decisions the
kernel takes, by exact replay:

1. the jnp integrator records every bounce's trace rays (origin,
   direction, alive mask) and NEE shadow-ray origins + relevance masks
   (``integrate_frame(..., return_bounce_rays=True)``);
2. the cluster walk is replayed with the kernel's own arithmetic in
   numpy float32 (same ``plan_clusters`` order, same slab test, same
   nearest-t member tightening, same shadow blocked-latch semantics —
   mirrors ``megakernel.trace_tile_fori`` / ``shadow_blocked_fori_multi``)
   and the tile-uniform ``any(rel)`` visit decision is evaluated at
   several granularities: the production 4096-lane tile, hypothetical
   1024-/128-lane sub-tiles, and the per-lane oracle (the floor ANY
   sub-tile scheme could reach).

Caveat: the replay models the per-frame (monolithic) walk. The
regeneration kernel mixes lanes at different path depths in one tile, so
its realized visit fractions lie between this measurement and dense; the
bench reports the bracket. Tiles are walked independently, so
``tile_stride`` subsamples tiles (every k-th production tile) without
changing any sampled tile's decisions.

Usage: python tools/visit_replay.py [config] [--frames 2] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OBJ_PLAIN_BOX, OBJ_SPHERE, OBJ_ROTATED_BOX, OBJ_TRIANGLE = 0, 1, 2, 3
F32 = np.float32
_INF = F32(np.inf)


def _member_tables(arrays, sigma):
    """Per-object geometry in plan (visit) order, numpy float32."""
    idx = np.asarray(sigma, np.int64)
    is_sphere = (np.asarray(arrays.obj_type) == OBJ_SPHERE)[:, None]
    center = np.where(
        is_sphere, np.asarray(arrays.sphere_pos, F32),
        np.asarray(arrays.shift, F32),
    )
    return {
        "type": np.asarray(arrays.obj_type)[idx],
        "center": center[idx],  # sphere center / triangle v0 / rotbox shift
        "radius": np.asarray(arrays.radius, F32)[idx],
        "slab_min": np.asarray(arrays.slab_min, F32)[idx],  # tri: e1
        "slab_max": np.asarray(arrays.slab_max, F32)[idx],  # tri: e2
        "aabb_min": np.asarray(arrays.aabb_min, F32)[idx],
        "aabb_max": np.asarray(arrays.aabb_max, F32)[idx],
    }


def _slab(o, d, bmin, bmax):
    """Kernel ``_slab_t`` on [N,3] rays vs one box -> (t_min, hit)."""
    t_min = np.full(o.shape[0], -_INF, F32)
    t_max = np.full(o.shape[0], _INF, F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        for ax in range(3):
            inv = F32(1.0) / d[:, ax]
            t1 = (bmin[ax] - o[:, ax]) * inv
            t2 = (bmax[ax] - o[:, ax]) * inv
            swap = inv < 0.0
            t_near = np.where(swap, t2, t1)
            t_far = np.where(swap, t1, t2)
            t_min = np.fmax(t_min, t_near)
            t_max = np.fmin(t_max, t_far)
    hit = (t_max > t_min) & (t_max >= 0.0)
    return t_min, hit


def _member_min_t(o, d, tab, start, stop):
    """Kernel nearest-t over members [start, stop): min over valid member
    t (t = t1 if t1 >= 0 else t2; valid = disc >= 0 and t > 0 — the
    ``_sphere_t`` / ``_plain_box_t`` / ``_tri_t`` semantics). [N] f32."""
    ty = int(tab["type"][start])
    with np.errstate(divide="ignore", invalid="ignore"):
        if ty == OBJ_SPHERE:
            c = tab["center"][start:stop]  # [m, 3]
            r = tab["radius"][start:stop]
            oc = o[:, None, :] - c[None, :, :]  # [N, m, 3]
            a = (d * d).sum(-1)[:, None]
            b = F32(2.0) * (oc * d[:, None, :]).sum(-1)
            cc = (oc * oc).sum(-1) - (r * r)[None, :]
            disc = b * b - F32(4.0) * a * cc
            sq = np.sqrt(np.maximum(disc, F32(0.0)))
            inv2a = F32(1.0) / (F32(2.0) * a)
            t1 = (-b - sq) * inv2a
            t2 = (-b + sq) * inv2a
            t = np.where(t1 >= 0.0, t1, t2)
            valid = (disc >= 0.0) & (t > 0.0)
            return np.where(valid, t, _INF).min(axis=1)
        if ty == OBJ_PLAIN_BOX:
            t_out = np.full(o.shape[0], _INF, F32)
            for m in range(start, stop):
                t_min, hit = _slab(
                    o, d, tab["slab_min"][m], tab["slab_max"][m]
                )
                # _plain_box_t: t = t_min if t_min >= 0 else t_max; the
                # t_max (inside-the-box) branch tightens strictly less, so
                # taking only t_min >= 0 is exact for outside rays — every
                # replayed ray origin lies outside scene boxes
                t = np.where(t_min >= 0.0, t_min, _INF)
                t_out = np.fmin(t_out, np.where(hit & (t > 0.0), t, _INF))
            return t_out
        if ty == OBJ_TRIANGLE:
            v0 = tab["center"][start:stop]
            e1 = tab["slab_min"][start:stop]
            e2 = tab["slab_max"][start:stop]
            p = np.cross(d[:, None, :], e2[None, :, :])
            det = (e1[None, :, :] * p).sum(-1)
            inv_det = F32(1.0) / det
            s = o[:, None, :] - v0[None, :, :]
            u = (s * p).sum(-1) * inv_det
            q = np.cross(s, np.broadcast_to(e1[None, :, :], s.shape))
            v = (d[:, None, :] * q).sum(-1) * inv_det
            t = (e2[None, :, :] * q).sum(-1) * inv_det
            valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
            return np.where(valid, t, _INF).min(axis=1)
    raise NotImplementedError(f"replay: object type {ty}")


def replay_frame(arrays, clusters, rec, granularities, n_lights,
                 tile=4096, tile_stride=1):
    """Replay the trace + shadow cluster walks for one recorded frame.

    Lanes are grouped into production tiles of ``tile``; ``tile_stride``
    keeps every k-th tile (each tile's walk is independent of the
    others', so subsampling is exact for the sampled tiles). Returns
    ({granularity: executed member tests}, dense totals) where shadow
    tests count per light (the fused loop's per-light work, matching
    utils/flops.py)."""
    sigma, runs = clusters
    tab = _member_tables(arrays, sigma)
    lpos = np.asarray(arrays.light_pos, F32)
    bounces = rec["ox"].shape[0]
    n = rec["ox"].shape[1]

    # production tile subsample: lane index set
    n_tiles = -(-n // tile)
    keep_tiles = np.arange(0, n_tiles, tile_stride)
    lane_idx = (
        keep_tiles[:, None] * tile + np.arange(tile)[None, :]
    ).ravel()
    lane_idx = lane_idx[lane_idx < n]
    ns = len(lane_idx)

    out = {g: {"trace_exec": 0.0, "shadow_exec": 0.0} for g in granularities}
    dense_trace = dense_shadow = 0.0

    cb = [
        (tab["aabb_min"][s0:s1].min(0), tab["aabb_max"][s0:s1].max(0))
        for _tag, s0, s1, _cl in runs
    ]

    def tile_any(rel, g):
        if g == 1:
            return rel
        pad = (-len(rel)) % g
        r = np.pad(rel, (0, pad)).reshape(-1, g)
        return np.repeat(r.any(axis=1), g)[: len(rel)]

    for b in range(bounces):
        o = np.stack(
            [rec["ox"][b], rec["oy"][b], rec["oz"][b]], axis=1
        ).astype(F32)[lane_idx]
        d = np.stack(
            [rec["dx"][b], rec["dy"][b], rec["dz"][b]], axis=1
        ).astype(F32)[lane_idx]
        alive = np.asarray(rec["alive"][b])[lane_idx]
        so = np.stack(
            [rec["sx"][b], rec["sy"][b], rec["sz"][b]], axis=1
        ).astype(F32)[lane_idx]
        smask = np.asarray(rec["smask"][b])[lane_idx]

        # geometry once per cluster (granularity only changes the any()
        # reduction, not the slab/member math)
        slabs, mints = [], []
        for ci, (_tag, s0, s1, is_cl) in enumerate(runs):
            slabs.append(_slab(o, d, cb[ci][0], cb[ci][1]))
            mints.append(_member_min_t(o, d, tab, s0, s1))
            if is_cl:
                dense_trace += float(ns) * (s1 - s0)

        for g in granularities:
            t_best = np.full((ns,), _INF, F32)
            for ci, (_tag, s0, s1, is_cl) in enumerate(runs):
                if not is_cl:
                    t_best = np.fmin(t_best, mints[ci])
                    continue
                t_min, hit = slabs[ci]
                rel = hit & (t_min <= t_best) & alive
                enter = tile_any(rel, g)
                out[g]["trace_exec"] += float(enter.sum()) * (s1 - s0)
                t_best = np.where(enter, np.fmin(t_best, mints[ci]), t_best)

        # --- shadow walk: per light blocked-latch; ONE fused loop means
        # one visit decision across lights
        l_dir, l_maxd, l_mint, slabs_s = [], [], {}, []
        with np.errstate(divide="ignore", invalid="ignore"):
            for li in range(n_lights):
                ld = lpos[li, :3][None, :] - so
                dist = np.sqrt((ld * ld).sum(-1)).astype(F32)
                l_dir.append((ld / dist[:, None]).astype(F32))
                l_maxd.append(dist)
        for ci, (_tag, s0, s1, is_cl) in enumerate(runs):
            per_light = []
            for li in range(n_lights):
                per_light.append(_slab(so, l_dir[li], cb[ci][0], cb[ci][1]))
                l_mint[(ci, li)] = _member_min_t(
                    so, l_dir[li], tab, s0, s1
                )
            slabs_s.append(per_light)
            if is_cl:
                dense_shadow += float(ns) * (s1 - s0) * n_lights

        for g in granularities:
            t_bests = [np.full((ns,), _INF, F32) for _ in range(n_lights)]
            for ci, (_tag, s0, s1, is_cl) in enumerate(runs):
                if not is_cl:
                    for li in range(n_lights):
                        t_bests[li] = np.fmin(t_bests[li], l_mint[(ci, li)])
                    continue
                rel = None
                for li in range(n_lights):
                    t_min, hit = slabs_s[ci][li]
                    unblocked = ~(t_bests[li] <= l_maxd[li])
                    r = hit & (t_min <= l_maxd[li]) & unblocked
                    rel = r if rel is None else (rel | r)
                rel = rel & smask
                enter = tile_any(rel, g)
                out[g]["shadow_exec"] += (
                    float(enter.sum()) * (s1 - s0) * n_lights
                )
                for li in range(n_lights):
                    t_bests[li] = np.where(
                        enter, np.fmin(t_bests[li], l_mint[(ci, li)]),
                        t_bests[li],
                    )

    return out, dense_trace, dense_shadow


def measure(config_name: str = "spheres", n_frames: int = 2,
            granularities=(4096, 1024, 128, 1), cluster_size: int = 64,
            tile_stride: int = 1):
    import jax
    import jax.numpy as jnp

    from bench import _make_scene
    from spectral_tpu.ops.pallas.megakernel import plan_clusters
    from spectral_tpu.render.integrator import integrate_frame
    from spectral_tpu.scene.flatten import flatten_scene

    from spectral_tpu.scene.flatten import host_meta

    scene, _desc = _make_scene(config_name)
    arrays, config = flatten_scene(scene)
    host = host_meta(arrays)
    obj_types = tuple(host.obj_type.tolist())
    clusters = plan_clusters(
        host.aabb_min, host.aabb_max,
        obj_types, cluster_size=cluster_size,
        camera_pos=host.cam_pos[:3],
    )

    # slice to the kept production tiles ON DEVICE: the full bounce-ray
    # record is ~350 MB at 512^2 x 30 bounces and the tunneled D2H is the
    # slowest link; tiles are independent so the subsample is exact
    n = config.width * config.height
    n_tiles = -(-n // 4096)
    keep = np.arange(0, n_tiles, tile_stride)
    lane_idx = jnp.asarray(
        (keep[:, None] * 4096 + np.arange(4096)[None, :])
        .ravel().clip(max=n - 1).astype(np.int32)
    )

    @partial(jax.jit, static_argnums=(1,))
    def record(scn, cfg, fid):
        _rgb, rec = integrate_frame(scn, cfg, fid, return_bounce_rays=True)
        return jax.tree.map(lambda a: a[:, lane_idx], rec)

    totals = {g: {"trace_exec": 0.0, "shadow_exec": 0.0}
              for g in granularities}
    dense_t = dense_s = 0.0
    for fid in range(n_frames):
        rec = jax.device_get(record(arrays, config, jnp.uint32(fid)))
        outf, dt, ds = replay_frame(
            arrays, clusters, rec, granularities, config.n_lights,
            tile_stride=1,
        )
        for g in granularities:
            totals[g]["trace_exec"] += outf[g]["trace_exec"]
            totals[g]["shadow_exec"] += outf[g]["shadow_exec"]
        dense_t += dt
        dense_s += ds

    return {
        "config": config_name,
        "frames": n_frames,
        "cluster_size": cluster_size,
        "tile_stride": tile_stride,
        "granularities": {
            str(g): {
                "trace_frac": totals[g]["trace_exec"] / max(dense_t, 1.0),
                "shadow_frac": totals[g]["shadow_exec"] / max(dense_s, 1.0),
            }
            for g in granularities
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="spheres")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--cluster", type=int, default=64)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    r = measure(args.config, args.frames, cluster_size=args.cluster,
                tile_stride=args.stride)
    if args.json:
        print(json.dumps(r))
        return
    print(f"config={r['config']} frames={r['frames']} "
          f"stride={r['tile_stride']}")
    for g, dd in r["granularities"].items():
        print(
            f"  granularity {g:>5}: trace {dd['trace_frac']:.3f}, "
            f"shadow {dd['shadow_frac']:.3f} of dense member tests"
        )


if __name__ == "__main__":
    main()
