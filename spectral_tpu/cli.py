"""Headless command-line driver.

The framework's app shell (the role of the reference's eframe GUI,
reference ``src/main.rs:40-71``, re-designed headless): render presets or
JSON scenes progressively with live progress, periodic previews,
checkpoint/resume, and optional multi-device meshes.

    python -m spectral_tpu render --preset cornell --out cornell.png
    python -m spectral_tpu render --scene my.json --mesh 4 --iterations 500
    python -m spectral_tpu scene dump --preset default --out scene.json
    python -m spectral_tpu describe --scene my.json
"""

from __future__ import annotations

import argparse
import sys
import time

from spectral_tpu.scene.presets import PRESETS
from spectral_tpu.utils.text_resources import HELP


def _add_render_overrides(p: argparse.ArgumentParser) -> None:
    p.add_argument("--width", type=int, help=HELP["width"])
    p.add_argument("--height", type=int, help=HELP["height"])
    p.add_argument("--iterations", type=int, help=HELP["iterations"])
    p.add_argument("--bounces", type=int, help=HELP["max_bounces"])
    p.add_argument("--samples", type=int, help=HELP["spectrum_samples"])
    p.add_argument("--aperture", type=float,
                   help="thin-lens aperture radius (world units); 0 = "
                        "pinhole (depth of field, beyond the reference)")
    p.add_argument("--focus-distance", type=float,
                   help="focus-plane distance along the view axis "
                        "(with --aperture > 0)")


def _load_scene(args):
    from spectral_tpu.scene import presets
    from spectral_tpu.utils import sceneio

    if args.scene:
        scene = sceneio.load_scene(args.scene)
    else:
        scene = presets.PRESETS[args.preset]()
    # "is not None", not truthiness: an explicit 0 must reach
    # Scene.validate() and be rejected loudly, not silently ignored.
    if args.width is not None:
        scene.width = args.width
    if args.height is not None:
        scene.height = args.height
    if args.iterations is not None:
        scene.nbr_of_iterations = args.iterations
    if args.bounces is not None:
        scene.nbr_of_ray_bounces = args.bounces
    if getattr(args, "samples", None) is not None:
        scene.spectrum_number_of_samples = args.samples
        scene.update_all_spectrum_sample_sizes()
    if getattr(args, "aperture", None) is not None:
        scene.camera.aperture_radius = args.aperture
    if getattr(args, "focus_distance", None) is not None:
        scene.camera.focus_distance = args.focus_distance
    return scene


def _parse_phase(value, allow_auto: bool = True):
    """--phase-split / --phase-capacity: int, comma list of ints, or
    'auto' (split only), passed through to Renderer."""
    if value is None:
        return value
    if value == "auto":
        if not allow_auto:
            raise SystemExit(
                "--phase-capacity does not accept 'auto'; use "
                "--phase-split auto to tune splits AND capacities together"
            )
        return value
    parts = [int(p) for p in str(value).split(",") if p != ""]
    return parts[0] if len(parts) == 1 else tuple(parts)


def cmd_render(args) -> int:
    import signal

    from spectral_tpu.parallel import distributed

    # multi-host: join the process group before any device use
    if args.coordinator or args.num_processes or distributed.env_configured():
        import jax

        distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}",
            file=sys.stderr,
        )

    from spectral_tpu.render.renderer import Renderer

    scene = _load_scene(args)

    sharding = None
    if args.mesh:
        from spectral_tpu.parallel.mesh import make_mesh, row_sharding

        sharding = row_sharding(make_mesh(args.mesh))

    regen = (
        args.regen_frames
        if args.regen_frames == "auto"
        else int(args.regen_frames)
    )
    if regen == "auto" and (args.serve is not None or args.preview_every):
        # progress/preview/abort all operate at chunk granularity; a live
        # view behind a 100-frame chunk would update once per seconds.
        # 16-frame chunks keep most of the regeneration win (measured
        # K=10 already captures ~60% of the K=100 gain) at ~10x the
        # update cadence. Explicit --regen-frames overrides this.
        regen = ("auto", 16)

    if args.persist and args.mesh and (args.resume or args.checkpoint):
        print("--persist checkpoints are single-chip: drop --mesh or "
              "--resume/--checkpoint", file=sys.stderr)
        return 2
    adaptive = None
    if args.adaptive is not None:
        if not args.persist:
            print("--adaptive requires --persist (it runs on the "
                  "free-running persist kernel)", file=sys.stderr)
            return 2
        try:
            mn, rt, at = args.adaptive.split(",")
            adaptive = (int(mn), float(rt), float(at))
        except ValueError:
            print(f"--adaptive expects MIN,RTOL,ATOL (got "
                  f"{args.adaptive!r})", file=sys.stderr)
            return 2

    def build_renderer(sc):
        return Renderer(
            sc, sharding=sharding,
            phase_split=_parse_phase(args.phase_split),
            phase_capacity=_parse_phase(args.phase_capacity, allow_auto=False),
            frames_per_dispatch=args.frames_per_dispatch,
            regen_frames=1 if args.persist else regen,
            regen_sort={"auto": "auto", "on": True, "off": False}[
                args.regen_sort
            ],
            persist=args.persist,
            persist_budget=args.persist_budget,
            adaptive=adaptive,
            _interpret=args.interpret,
        )

    renderer = build_renderer(scene)
    if args.resume:
        renderer.load_checkpoint(args.resume)
        print(f"resumed at frame {renderer.next_frame}", file=sys.stderr)

    # Graceful abort (the reference's Abort button, src/main.rs:1238-1247,
    # text_resources.rs:112-113): first Ctrl-C finishes the current frame,
    # saves the image plus a resumable checkpoint, and exits cleanly; a
    # second Ctrl-C falls through to the normal KeyboardInterrupt.
    stop = {"requested": False}

    def _on_sigint(_sig, _frm):
        if stop["requested"]:
            raise KeyboardInterrupt
        stop["requested"] = True
        print(
            "\nabort requested — finishing the current frame "
            "(Ctrl-C again to force quit)",
            file=sys.stderr,
        )

    prev_handler = signal.signal(signal.SIGINT, _on_sigint)

    last_preview = [time.monotonic()]
    primary = distributed.is_primary()  # only process 0 logs/saves

    viewer = None
    if args.serve is not None:
        if args.coordinator or args.num_processes:
            raise SystemExit(
                "--serve is single-process only (the live framebuffer "
                "fetch cannot be time-gated deterministically across "
                "processes); use --preview-every instead"
            )
        from spectral_tpu.utils.viewer import LiveViewer

        viewer = LiveViewer(port=args.serve)
        viewer.publish_scene(scene)
        print(f"live view at {viewer.url}", file=sys.stderr)
    last_view = [0.0]

    def progress(p):
        if viewer is not None and time.monotonic() - last_view[0] > 1.0:
            viewer.update(
                renderer.framebuffer(), p.frame_id + 1, p.total_frames,
                p.elapsed_s,
            )
            last_view[0] = time.monotonic()
        if not args.quiet and primary:
            print(
                f"\rframe {p.frame_id + 1}/{p.total_frames} "
                f"({p.fraction:5.1%})  elapsed {p.elapsed_s:6.1f}s  "
                f"eta {p.eta_s:6.1f}s  {p.mpaths_per_s:7.1f} Mpaths/s",
                end="",
                file=sys.stderr,
                flush=True,
            )
        # save_image is multi-process safe (collective gather, primary
        # writes) — every process must reach it
        if args.preview_every and time.monotonic() - last_preview[0] > args.preview_every:
            renderer.save_image(args.out, exposure=args.exposure,
                                gamma=args.gamma)
            last_preview[0] = time.monotonic()

    t0 = time.monotonic()

    def abort():  # polled once per frame
        return stop["requested"] or (
            viewer is not None
            and (viewer.abort_requested() or viewer.scene_edit_pending())
        )

    def run_render():
        # a render "session": re-entered when the live viewer submits a
        # scene edit — the reference's edit-then-Start cycle (edits apply
        # between renders; progressive accumulation restarts)
        nonlocal renderer, scene
        while True:
            renderer.render(
                progress=progress, abort=abort, check_finite=args.check_finite
            )
            if viewer is None or stop["requested"] or viewer.abort_requested():
                return
            edited = viewer.take_scene_edit()
            if edited is None:
                return
            scene = edited
            renderer = build_renderer(scene)
            viewer.publish_scene(scene)
            print("\nscene edited via live view — restarting render",
                  file=sys.stderr)

    try:
        if args.profile:
            import jax

            with jax.profiler.trace(args.profile):
                run_render()
        else:
            run_render()
    finally:
        signal.signal(signal.SIGINT, prev_handler)
    if not args.quiet and primary:
        print(file=sys.stderr)
    aborted = abort()  # Ctrl-C or the live view's Abort button
    if viewer is not None:
        viewer.close()
    checkpoint = args.checkpoint
    if checkpoint is None and aborted:
        if args.persist and args.mesh:
            # sharded persist carries no host-side resume state (the
            # carried lanes are mesh-layout-dependent) — skip the
            # auto-checkpoint instead of crashing after the abort
            if primary:
                print("sharded persist aborts are not resumable; "
                      "partial image saved", file=sys.stderr)
        else:
            checkpoint = f"{args.out}.ckpt.npz"  # auto-save: resumable abort
    renderer.save_image(args.out, exposure=args.exposure,
                        gamma=args.gamma)  # collective; primary writes
    if checkpoint:
        renderer.save_checkpoint(checkpoint)
        if primary:
            print(f"checkpoint -> {checkpoint}", file=sys.stderr)
    if primary:
        verb = "aborted after" if aborted else "rendered"
        print(
            f"{verb} {renderer.next_frame} iterations in "
            f"{time.monotonic() - t0:.1f}s -> {args.out}",
            file=sys.stderr,
        )
        info = renderer.persist_info
        if info is not None and "mean_counts" in info:
            cap = renderer.config.intended_frames
            print(
                f"adaptive: {info['mean_counts']:.1f} frames/pixel mean "
                f"(min {info['min_counts']}, max {info['max_counts']}, "
                f"cap {cap}, compactions {info['compactions']}) — "
                f"{100.0 * (1.0 - info['mean_counts'] / cap):.0f}% of "
                f"frame work saved vs the fixed-count render",
                file=sys.stderr,
            )
        if aborted and checkpoint:
            print(f"resume with --resume {checkpoint}", file=sys.stderr)
    if args.aovs:
        aov_exr = str(args.aovs).endswith(".exr")
        if aov_exr:
            fb_aov = renderer.framebuffer()  # collective: all procs join
        if primary:
            from spectral_tpu.render.aov import (
                compute_aovs, save_aovs, save_aovs_exr,
            )

            if aov_exr:
                # one multi-layer EXR: beauty (linear f32) + AOV layers
                import numpy as np

                save_aovs_exr(
                    compute_aovs(scene), args.aovs,
                    beauty=np.asarray(fb_aov, np.float32),
                )
                print(
                    "multi-layer EXR (beauty+depth/normal/albedo/obj_id) "
                    f"-> {args.aovs}", file=sys.stderr,
                )
            else:
                save_aovs(compute_aovs(scene), args.aovs)
                print(f"AOVs (depth/normal/albedo/obj_id) -> {args.aovs}",
                      file=sys.stderr)
    if args.denoise is not None:
        fb = renderer.framebuffer()  # collective: all processes join
        if primary:
            from pathlib import Path

            from spectral_tpu.render import image as image_mod
            from spectral_tpu.render.denoise import denoise_render

            out = Path(args.out)
            dn_path = out.with_name(out.stem + ".denoised" + out.suffix)
            denoised = denoise_render(scene, fb, iterations=args.denoise)
            image_mod.save_image(denoised, dn_path, exposure=args.exposure,
                                 gamma=args.gamma)
            print(f"denoised ({args.denoise} a-trous levels) -> {dn_path}",
                  file=sys.stderr)
    return 0


def cmd_animate(args) -> int:
    """Render a keyframe animation (frames dealt across local devices)."""
    import dataclasses as dc
    import json as json_mod

    from spectral_tpu.render import animation as anim_mod

    if not (args.out_dir or args.gif or args.dump_anim):
        print("animate: no output requested — pass --out-dir and/or --gif",
              file=sys.stderr)
        return 2

    # --scene/--preset override an embedded base scene; with neither
    # given, an --anim file's embedded scene is used as-is (the preset
    # default only applies when there is nothing embedded to use)
    explicit_scene = args.scene is not None or args.preset is not None
    if args.preset is None:
        args.preset = "default"
    scene = _load_scene(args)

    if args.anim:
        anim = anim_mod.load_animation(
            args.anim, scene=scene if explicit_scene else None
        )
        if not explicit_scene:
            # size/quality overrides still apply to the embedded scene
            for attr, val in (
                ("width", args.width), ("height", args.height),
                ("nbr_of_iterations", args.iterations),
                ("nbr_of_ray_bounces", args.bounces),
            ):
                if val is not None:
                    setattr(anim.scene, attr, val)
            if getattr(args, "samples", None) is not None:
                anim.scene.spectrum_number_of_samples = args.samples
                anim.scene.update_all_spectrum_sample_sizes()
        # dataclasses.replace re-runs __post_init__ validation on the
        # overridden frame count / playback rate
        anim = dc.replace(
            anim,
            n_frames=args.frames if args.frames is not None else anim.n_frames,
            fps=args.fps if args.fps is not None else anim.fps,
        )
    elif args.orbit is not None:
        n = args.frames if args.frames is not None else 48
        center = (
            tuple(float(c) for c in args.orbit_center.split(","))
            if args.orbit_center
            else (0.0, 0.0, 0.0)
        )
        anim = anim_mod.Animation(
            scene,
            n_frames=n,
            tracks=anim_mod.orbit_tracks(
                scene, degrees=args.orbit, n_frames=n, center=center
            ),
            fps=args.fps if args.fps is not None else 12.0,
        )
    else:
        print("animate: pass --anim tracks.json or --orbit DEGREES",
              file=sys.stderr)
        return 2

    t0 = time.monotonic()

    def progress(done, total):
        dt = time.monotonic() - t0
        eta = dt / done * (total - done) if done else 0.0
        print(
            f"\rframe {done}/{total}  {dt:6.1f}s elapsed  eta {eta:6.1f}s",
            end="", file=sys.stderr, flush=True,
        )

    kwargs = {}
    if args.interpret:
        kwargs["_interpret"] = True
    frames = anim_mod.render_animation(
        anim,
        iterations=args.iterations,
        out_dir=args.out_dir,
        progress=progress,
        shutter=args.shutter,
        **kwargs,
    )
    print(file=sys.stderr)
    if args.gif:
        anim_mod.save_gif(frames, args.gif, fps=anim.fps)
        print(f"wrote {args.gif}", file=sys.stderr)
    if args.dump_anim:
        from pathlib import Path as _P

        _P(args.dump_anim).write_text(
            json_mod.dumps(anim_mod.animation_to_dict(anim), indent=2)
        )
        print(f"wrote {args.dump_anim}", file=sys.stderr)
    return 0


def cmd_scene_dump(args) -> int:
    from spectral_tpu.scene import presets
    from spectral_tpu.utils import sceneio

    scene = presets.PRESETS[args.preset]()
    sceneio.save_scene(scene, args.out)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_describe(args) -> int:
    if getattr(args, "help_for", None) is not None:
        key = args.help_for
        if key == "list":
            for k in sorted(HELP):
                print(k)
            return 0
        if key not in HELP:
            near = ", ".join(k for k in sorted(HELP) if key in k) or "none"
            print(f"no help entry {key!r} (close: {near})", file=sys.stderr)
            return 2
        print(HELP[key])
        return 0
    scene = _load_scene(args)
    scene.validate()
    print(f"{scene.width}x{scene.height}, {scene.nbr_of_iterations} iterations, "
          f"{scene.nbr_of_ray_bounces} bounces, "
          f"{scene.spectrum_number_of_samples} wavelength samples "
          f"({scene.spectrum_lower_bound:.0f}-{scene.spectrum_upper_bound:.0f} nm)")
    print(f"camera: pos {scene.camera.position} dir {scene.camera.direction} "
          f"fov {scene.camera.fov_y_deg} deg")
    print(f"{len(scene.lights)} lights:")
    for l in scene.lights:
        tag = " [hidden]" if l.hidden else ""
        print(f"  {l.name}: at {l.position}, spectrum {l.spectrum.name!r}{tag}")
    print(f"{len(scene.objects)} objects:")
    for o in scene.objects:
        tag = " [hidden]" if o.hidden else ""
        kind = type(o.object_type).__name__
        if hasattr(o.object_type, "n_triangles"):
            kind += f" ({o.object_type.n_triangles} triangles)"
        print(f"  {o.name}: {kind} at {o.position}, "
              f"material {o.material.name!r}{tag}")
    print(f"{len(scene.materials)} materials:")
    for m in scene.materials:
        extra = ""
        if m.transmission:
            extra += (f", transmission {m.transmission} (ior {m.ior}"
                      f"{', cauchy ' + str(m.cauchy_b_um2) if m.cauchy_b_um2 else ''})")
        if m.emission is not None:
            extra += f", emission {m.emission.name!r}"
        if m.texture is not None:
            extra += (f", checker texture (scale {m.texture.scale}, "
                      f"low {m.texture.low})")
        print(f"  {m.name}: metallicness {m.metallicness}, "
              f"roughness {m.roughness}{extra}")
    print(f"{len(scene.spectra)} spectra")
    return 0


def cmd_compare(args) -> int:
    """Pixel RMSE between two images (the BASELINE accuracy metric)."""
    import numpy as np
    from PIL import Image

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) / 255.0

    a, b = load(args.a), load(args.b)
    if a.shape != b.shape:
        print(f"size mismatch: {a.shape} vs {b.shape}", file=sys.stderr)
        return 1
    diff = a - b
    rmse = float(np.sqrt(np.mean(diff**2)))
    mae = float(np.abs(diff).mean())
    p99 = float(np.quantile(np.abs(diff).max(axis=-1), 0.99))
    print(f"rmse {rmse:.5f}  mae {mae:.5f}  p99|diff| {p99:.5f}  "
          f"(units: [0,1] pixel intensity)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="spectral_tpu",
        description="TPU-native spectral path tracer",
    )
    parser.add_argument(
        "--platform",
        choices=("cpu", "tpu", "axon"),
        help="force the JAX platform (this host's env-var override is "
        "ignored by the pinned TPU plugin; this flag claims the platform "
        "programmatically before backend init)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    pr = sub.add_parser("render", help="render a scene progressively")
    src = pr.add_mutually_exclusive_group()
    src.add_argument("--preset", choices=sorted(PRESETS), default="default")
    src.add_argument("--scene", help="path to a scene JSON file")
    _add_render_overrides(pr)
    pr.add_argument("--out", default="render.png",
                    help="output image by extension: png/jpg/bmp/tiff "
                         "(8-bit, the reference's formats) or exr "
                         "(linear HDR float, beyond the reference)")
    pr.add_argument("--mesh", type=int, default=0,
                    help="shard over the first N devices (0 = single device)")
    pr.add_argument("--coordinator",
                    help="multi-host: coordinator address HOST:PORT for "
                    "jax.distributed (or set JAX_COORDINATOR_ADDRESS)")
    pr.add_argument("--num-processes", type=int,
                    help="multi-host: total process count")
    pr.add_argument("--process-id", type=int,
                    help="multi-host: this process's index")
    pr.add_argument("--checkpoint", help=HELP["checkpoint"])
    pr.add_argument("--resume", help="resume from a checkpoint file")
    pr.add_argument("--preview-every", type=float, default=0.0,
                    help="write the output image every N seconds while rendering")
    pr.add_argument("--serve", type=int, nargs="?", const=0, default=None,
                    metavar="PORT",
                    help="serve a live progressive view over HTTP (frame, "
                    "progress, abort button); PORT 0 or omitted picks a "
                    "free port")
    pr.add_argument("--quiet", action="store_true")
    pr.add_argument("--check-finite", action="store_true",
                    help="validate the accumulator each frame; abort on NaN/Inf")
    pr.add_argument("--phase-split",
                    help="occupancy-compacted rendering (TPU, many-object "
                    "scenes): bounces [0,N) on the full wavefront, "
                    "surviving lanes compacted for the tail bounces; a "
                    "comma list (e.g. 1,3) cascades through successively "
                    "smaller wavefronts; 'auto' probes the scene's "
                    "occupancy and tunes splits+capacities itself; "
                    "overflow frames fall back to the monolithic kernel")
    pr.add_argument("--phase-capacity",
                    help="compacted-wavefront lane capacity (default: 1/16 "
                    "of the padded wavefront); comma list, one per split")
    pr.add_argument("--frames-per-dispatch", type=int, default=1,
                    metavar="K",
                    help="fuse K progressive frames into one device "
                    "dispatch (lax.scan) — same estimator, fewer host "
                    "round-trips (~7%% on short frames); progress/abort "
                    "granularity coarsens to K frames")
    pr.add_argument("--regen-frames", default="auto", metavar="K",
                    help="(TPU) K progressive frames per megakernel launch "
                    "via in-kernel path regeneration: a terminated path "
                    "immediately starts the pixel's next frame, harvesting "
                    "the bounce loop's dead-lane tail (same estimator up "
                    "to f32 summation order; measured 1.5-1.75x). Default "
                    "'auto'; progress/abort granularity coarsens to K "
                    "frames — pass 1 for strict per-frame stepping")
    pr.add_argument("--regen-sort", choices=("auto", "on", "off"),
                    default="auto",
                    help="cost-sorted pixel->lane assignment for the "
                    "regeneration kernel: probe per-pixel path length once "
                    "and pack expensive pixels into the same tiles so "
                    "cheap tiles retire early (bit-exact per pixel). "
                    "Measured 0.93-0.98x on the BASELINE configs — path "
                    "cost is dominated by per-frame noise there — so "
                    "'auto' leaves it off; 'on' opts in for scenes with "
                    "systematic per-pixel cost structure")
    pr.add_argument("--persist", action="store_true",
                    help="(TPU) free-running lane-asynchronous batch "
                    "render: every lane advances through its own frame "
                    "stream with state carried between launches, so no "
                    "tile waits for its slowest lane each K-frame window. "
                    "Whole-render batch mode; abort at launch (~64-frame) "
                    "granularity returns the per-pixel average of "
                    "completed frames. --checkpoint/--resume save/restore "
                    "the full carried lane state (pass --persist when "
                    "resuming a persist checkpoint)")
    pr.add_argument("--persist-budget", type=int, default=None,
                    metavar="B",
                    help="bounce iterations per persist launch (default: "
                    "~64 frames' worth from a one-frame cost probe)")
    pr.add_argument("--adaptive", default=None, metavar="MIN,RTOL,ATOL",
                    help="(with --persist) per-pixel variance-adaptive "
                    "stopping: each pixel renders until the standard "
                    "error of its per-frame luminance mean is under "
                    "RTOL*|mean|+ATOL (at least MIN frames; iterations "
                    "becomes the cap; convergence is tested at launch "
                    "boundaries, ~--persist-budget bounce iterations "
                    "apart). E.g. --adaptive 16,0.02,1e-4")
    pr.add_argument("--interpret", action="store_true",
                    help="debug: run Pallas kernels in interpret mode "
                    "(slow; lets --persist/--adaptive run on CPU hosts)")
    pr.add_argument("--profile",
                    help="capture a jax.profiler trace of the render into DIR")
    pr.add_argument("--exposure", type=float, default=None,
                    help="opt-in display transform: scale linear RGB by "
                    "this factor before u8 conversion (default: the "
                    "reference's straight linear output)")
    pr.add_argument("--gamma", type=float, default=None,
                    help="opt-in display transform: encode with 1/gamma "
                    "(e.g. 2.2) before u8 conversion (default: the "
                    "reference's no-gamma output, a documented quirk)")
    pr.add_argument("--aovs", metavar="DIR|FILE.exr",
                    help="also write first-hit feature buffers (depth, "
                    "shading normal, albedo, object id) as .npy + .png "
                    "previews into DIR, or — when the argument ends in "
                    ".exr — as ONE multi-layer ZIP-compressed EXR with "
                    "the beauty pass (denoiser/compositing inputs the "
                    "reference cannot produce)")
    pr.add_argument("--denoise", nargs="?", const=5, default=None,
                    type=int, metavar="LEVELS",
                    help="also write an AOV-guided a-trous denoised copy "
                    "of the render next to --out (<stem>.denoised<ext>); "
                    "LEVELS a-trous passes (default 5). Post-process "
                    "only: the beauty image and checkpoints are "
                    "untouched")
    pr.set_defaults(func=cmd_render)

    pa = sub.add_parser(
        "animate",
        help="render a keyframe animation (a capability the reference "
             "lacks); frames are dealt across all local devices",
    )
    srca = pa.add_mutually_exclusive_group()
    srca.add_argument("--preset", choices=sorted(PRESETS), default=None,
                      help="base scene preset; with --anim and neither "
                      "--preset nor --scene, the animation file's "
                      "embedded scene is used")
    srca.add_argument("--scene", help="path to a scene JSON file")
    _add_render_overrides(pa)
    pa.add_argument("--anim", help="animation JSON: {n_frames, fps, tracks:"
                    " [{path, keys: [[t, value], ...]}]}; an embedded "
                    "scene is overridden by --scene/--preset")
    pa.add_argument("--orbit", type=float, metavar="DEGREES",
                    help="turntable: orbit the camera by DEGREES around "
                    "--orbit-center, always looking at it")
    pa.add_argument("--orbit-center", metavar="X,Y,Z",
                    help="orbit center (default 0,0,0)")
    pa.add_argument("--frames", type=int, help="number of animation frames")
    pa.add_argument("--fps", type=float, help="GIF playback rate")
    pa.add_argument("--out-dir", help="write frame_NNNN.png files here")
    pa.add_argument("--gif", help="write an animated GIF here")
    pa.add_argument("--dump-anim", help="write the resolved animation "
                    "(including the generated orbit tracks) as JSON")
    pa.add_argument("--shutter", type=float, default=0.0,
                    help="motion blur: shutter width in frame-intervals "
                    "(0.5 = 180-degree shutter; 0 = off). Each "
                    "progressive iteration samples the tracks at one "
                    "deterministic time in a centered window, so the "
                    "accumulated frame integrates the shutter")
    pa.add_argument("--interpret", action="store_true",
                    help="debug: run Pallas kernels in interpret mode")
    pa.set_defaults(func=cmd_animate)

    ps = sub.add_parser("scene", help="scene file utilities")
    pssub = ps.add_subparsers(dest="scene_command", required=True)
    pd = pssub.add_parser("dump", help="write a preset as an editable JSON scene")
    pd.add_argument("--preset", choices=sorted(PRESETS), default="default")
    pd.add_argument("--out", required=True)
    pd.set_defaults(func=cmd_scene_dump)

    pc = sub.add_parser("compare", help="pixel RMSE between two images")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.set_defaults(func=cmd_compare)

    pdesc = sub.add_parser("describe", help="validate and summarize a scene")
    srcd = pdesc.add_mutually_exclusive_group()
    srcd.add_argument("--preset", choices=sorted(PRESETS), default="default")
    srcd.add_argument("--scene", help="path to a scene JSON file")
    _add_render_overrides(pdesc)
    pdesc.add_argument(
        "--help-for", metavar="KEY", dest="help_for",
        help="print the help entry for a scene/spectrum knob "
             "('list' shows all keys); the reference's tooltip catalog "
             "(text_resources.rs) surfaced headlessly",
    )
    pdesc.set_defaults(func=cmd_describe)

    return parser


def _enable_compile_cache() -> None:
    """Persist XLA compilations across CLI invocations (TPU compiles are
    expensive; the render program is identical run to run).

    ``SPECTRAL_TPU_NO_COMPILE_CACHE=1`` disables it. The test suite sets
    this (tests/conftest.py): CLI tests run ``main()`` in-process, which
    would otherwise enable the SHARED on-disk cache for the rest of the
    pytest process — and a cache entry truncated by a killed writer
    segfaults jax's cache read in whatever unrelated test next compiles
    the same program (observed: a ``timeout``-killed suite corrupted an
    entry and every later full-suite run crashed in test_persist)."""
    import os

    if os.environ.get("SPECTRAL_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block rendering
        pass


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    _enable_compile_cache()
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
