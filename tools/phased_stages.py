"""Isolate the phased path's extraction overhead: time k1 alone, then
k1+extraction (no phase-2 kernel), then the full phased step. Run on TPU."""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    c = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(c, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.camera import generate_primary_rays
    from spectral_tpu.render.pallas_integrator import _kernel_seg
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    _cache()
    scene = presets.sphere_field(n_spheres=1000)
    scene.nbr_of_ray_bounces = 8
    arrays, config = flatten_scene(scene)
    ots = tuple(np.asarray(arrays.obj_type).tolist())
    split = 3
    tile = 8192
    n = config.width * config.height
    n_pad = -(-n // tile) * tile
    s_dim = config.n_samples
    rows = n_pad // mk.LANE
    cap = n_pad // 8
    crows = cap // mk.LANE

    # compact layout: same statics as the _kernel_seg calls below
    # (has_transmission=False, has_texture defaults False)
    geom = mk.pack_geometry(
        arrays, layout=mk.geom_layout(ots, False, False)
    )
    lpos = jnp.pad(arrays.light_pos, ((0, 0), (0, 1)))
    tables = (
        geom, jnp.zeros((8, 1), jnp.float32),  # dummy cluster bounds
        arrays.albedo[:1], arrays.emission[:1], arrays.mat_albedo,
        arrays.mat_emission, arrays.mat_scalars, lpos, arrays.light_spec,
    )
    k1 = _kernel_seg(ots, config, tile, False, False, False, 0, split)
    k2 = _kernel_seg(ots, config, tile, False, False, False, split, None)

    def primaries(fid):
        origin, direction, px, py = generate_primary_rays(
            arrays.cam_pos, arrays.cam_dir, arrays.cam_up, arrays.fov_y_deg,
            config.width, config.height, fid, config.intended_frames,
        )

        def lanes(a, dtype=jnp.float32):
            a = jnp.asarray(a, dtype)
            return jnp.pad(a, (0, n_pad - n)).reshape(rows, mk.LANE)

        return (
            lanes(origin.x), lanes(origin.y), lanes(origin.z),
            lanes(direction.x), lanes(direction.y), lanes(direction.z),
            lanes(px, jnp.uint32), lanes(py, jnp.uint32),
        )

    gidx = jnp.arange(n_pad, dtype=jnp.int32).reshape(rows, mk.LANE)
    alive0 = (gidx < n).astype(jnp.float32)

    def run_k1(fid):
        args = primaries(fid)
        return k1(
            *args, fid, *tables,
            jnp.ones((s_dim, rows, mk.LANE), jnp.float32),
            jnp.zeros((s_dim, rows, mk.LANE), jnp.float32),
            alive0, jnp.zeros((rows, mk.LANE), jnp.float32),
            jnp.full((rows, mk.LANE), -1.0, jnp.float32),
        ), args

    @jax.jit
    def stage_k1(fid):
        out, _ = run_k1(fid)
        return out[0].sum()

    @jax.jit
    def stage_nonzero(fid):
        out, _ = run_k1(fid)
        alive1 = out[8]
        flat = alive1.reshape(n_pad) > 0.0
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
        return idx.sum()

    @jax.jit
    def stage_gathers(fid):
        out, args = run_k1(fid)
        (rad1, thr1, ox1, oy1, oz1, dx1, dy1, dz1, alive1, gate1, hero1) = out
        flat = alive1.reshape(n_pad) > 0.0
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)

        def G(a):
            return a.reshape(n_pad)[idx].reshape(crows, mk.LANE)

        thr_c = thr1.reshape(s_dim, n_pad).T[idx].T
        lanes8 = sum(
            G(a).sum() for a in (ox1, oy1, oz1, dx1, dy1, dz1, gate1, hero1)
        )
        return thr_c.sum() + lanes8

    @jax.jit
    def stage_full(fid):
        out, args = run_k1(fid)
        (rad1, thr1, ox1, oy1, oz1, dx1, dy1, dz1, alive1, gate1, hero1) = out
        flat = alive1.reshape(n_pad) > 0.0
        count = jnp.sum(flat.astype(jnp.int32))
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
        alive_c = (jnp.arange(cap) < count).astype(jnp.float32)

        def G(a):
            return a.reshape(n_pad)[idx].reshape(crows, mk.LANE)

        thr_c = thr1.reshape(s_dim, n_pad).T[idx].T.reshape(
            s_dim, crows, mk.LANE
        )
        out2 = k2(
            G(ox1), G(oy1), G(oz1), G(dx1), G(dy1), G(dz1),
            G(args[6]), G(args[7]), fid, *tables,
            thr_c, jnp.zeros((s_dim, crows, mk.LANE), jnp.float32),
            alive_c.reshape(crows, mk.LANE), G(gate1), G(hero1),
        )
        rad2_t = out2[0].reshape(s_dim, cap).T
        rad_t = rad1.reshape(s_dim, n_pad).T.at[idx].add(rad2_t)
        return rad_t.sum()

    from spectral_tpu.render.color import spectra_to_rgb
    from spectral_tpu.render.integrator import accumulate_frame

    @partial(jax.jit, donate_argnums=(1,))
    def stage_tail(fid, accum):
        out, args = run_k1(fid)
        (rad1, thr1, ox1, oy1, oz1, dx1, dy1, dz1, alive1, gate1, hero1) = out
        flat = alive1.reshape(n_pad) > 0.0
        count = jnp.sum(flat.astype(jnp.int32))
        (idx,) = jnp.nonzero(flat, size=cap, fill_value=0)
        alive_c = (jnp.arange(cap) < count).astype(jnp.float32)

        def G(a):
            return a.reshape(n_pad)[idx].reshape(crows, mk.LANE)

        thr_c = thr1.reshape(s_dim, n_pad).T[idx].T.reshape(
            s_dim, crows, mk.LANE
        )
        out2 = k2(
            G(ox1), G(oy1), G(oz1), G(dx1), G(dy1), G(dz1),
            G(args[6]), G(args[7]), fid, *tables,
            thr_c, jnp.zeros((s_dim, crows, mk.LANE), jnp.float32),
            alive_c.reshape(crows, mk.LANE), G(gate1), G(hero1),
        )
        rad2_t = out2[0].reshape(s_dim, cap).T
        rad_t = rad1.reshape(s_dim, n_pad).T.at[idx].add(rad2_t)
        rgb = spectra_to_rgb(rad_t[:n], arrays.xyz_weights, arrays.xyz_to_rgb)
        rgb = rgb.reshape(config.height, config.width, 3)
        return accumulate_frame(accum, rgb, fid), count > cap

    for name, fn in (
        ("k1_only", stage_k1),
        ("k1+nonzero", stage_nonzero),
        ("k1+nonzero+gathers", stage_gathers),
        ("full_phased", stage_full),
    ):
        jax.block_until_ready(fn(jnp.uint32(0)))
        t0 = time.perf_counter()
        for f in range(1, 21):
            r = fn(jnp.uint32(f))
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 20
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)

    for sync in (False, True):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum, ovf = stage_tail(jnp.uint32(0), accum)
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for f in range(1, 21):
            accum, ovf = stage_tail(jnp.uint32(f), accum)
            if sync:
                int(ovf)
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / 20
        print(
            json.dumps(
                {"stage": f"tail_sync={sync}", "ms": round(dt * 1e3, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
