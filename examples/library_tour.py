"""Library tour: build a scene in Python, render progressively, export.

Run on any backend (CPU works; TPU auto-selects the Pallas megakernel):

    python examples/library_tour.py
"""

import spectral_tpu as st
from spectral_tpu.scene.schema import (
    Camera, Light, Material, PlainBox, PlainReflective, Scene, SceneObject,
    SceneSpectrum, Sphere, SpectrumEffectType, Temperature,
)

# spectra: a warm tungsten-like emitter and two reflectances
lamp = SceneSpectrum.new(
    "tungsten", Temperature(3200.0, 0.002), SpectrumEffectType.EMISSIVE
)
warm_grey = SceneSpectrum.new(
    "warm grey", PlainReflective(0.6), SpectrumEffectType.REFLECTIVE
)
bright = SceneSpectrum.new(
    "bright", PlainReflective(0.95), SpectrumEffectType.REFLECTIVE
)

matte = Material(0.0, 0.0, warm_grey, "matte")
mirror = Material(1.0, 0.05, bright, "brushed mirror")

scene = Scene(
    width=320,
    height=240,
    nbr_of_iterations=16,
    nbr_of_ray_bounces=6,
    camera=Camera(position=(0.0, 0.5, -4.0)),
    lights=[Light((2.0, 3.0, -2.0), lamp, "key light")],
    objects=[
        SceneObject((-0.8, 0.0, 0.5), Sphere(0.8), matte, "matte ball"),
        SceneObject((0.9, 0.0, 1.0), Sphere(0.8), mirror, "mirror ball"),
        SceneObject((0.0, -1.0, 0.0), PlainBox(20.0, 0.2, 20.0), matte, "floor"),
    ],
    spectra=[lamp, warm_grey, bright],
    materials=[matte, mirror],
)

# regen_frames="auto" retires many progressive frames per TPU kernel
# launch (in-kernel path regeneration, ~1.5-1.75x); resolves to 1 on CPU
renderer = st.Renderer(scene, regen_frames="auto")
renderer.render(
    progress=lambda p: print(
        f"frame {p.frame_id + 1}/{p.total_frames}  {p.mpaths_per_s:.1f} Mpaths/s"
    )
)
renderer.save_image("tour.png")
print("wrote tour.png")
