"""Turntable animation: orbit the camera around the Cornell box and
write an animated GIF — a capability the reference (one still per
session) never had. Animation frames are dealt across all local devices
and rendered concurrently (zero collectives: frame-level data
parallelism, each device running the standard single-scene path).

    python examples/animation_turntable.py

Equivalent CLI:

    python -m spectral_tpu animate --preset cornell --width 256 --height 256 \
        --iterations 32 --orbit 360 --frames 24 --gif cornell_orbit.gif
"""

import spectral_tpu as st
from spectral_tpu.render.animation import (
    Animation,
    orbit_tracks,
    render_animation,
    save_gif,
)

scene = st.presets.cornell_box()
scene.width = scene.height = 256
scene.nbr_of_iterations = 32  # animation frames want speed over polish

N_FRAMES = 24
anim = Animation(
    scene,
    n_frames=N_FRAMES,
    tracks=orbit_tracks(scene, degrees=360.0, n_frames=N_FRAMES),
    fps=12.0,
)

frames = render_animation(
    anim,
    out_dir="turntable_frames",
    progress=lambda done, total: print(f"frame {done}/{total}"),
)
save_gif(frames, "cornell_orbit.gif", fps=anim.fps)
print("wrote cornell_orbit.gif and turntable_frames/")
