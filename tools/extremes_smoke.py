"""TPU smoke test at the reference UI's parameter maxima.

The CPU test suite fuzzes the kernel in interpret mode at small shapes;
this drives the REAL Mosaic kernel at the extreme corners of the
reference's parameter space (``src/main.rs:31-34``, ``src/spectrum.rs:8``:
128 spectrum samples, 100 bounces) plus a multi-light scene, and checks
the output is finite and lit.

    python tools/extremes_smoke.py
"""

import copy

import numpy as np

from spectral_tpu.render.renderer import Renderer
from spectral_tpu.scene import presets
from spectral_tpu.scene.schema import Light


def run(name, scene, **kw):
    r = Renderer(scene, **kw)
    img = r.render(check_finite=True)
    lit = float(img[..., :3].max())
    assert np.isfinite(img).all(), f"{name}: non-finite output"
    assert lit > 0.01, f"{name}: black output"
    print(f"{name}: OK  max={lit:.3f}  backend={r.backend}")


def main():
    # 128 lambda bins (the UI maximum) through the megakernel
    s = presets.cornell_box(n_samples=128)
    s.width, s.height, s.nbr_of_iterations = 96, 64, 3
    run("cornell 128-lambda", s)

    # 100 bounces (the UI maximum)
    s = presets.cornell_box()
    s.width, s.height, s.nbr_of_iterations = 96, 64, 3
    s.nbr_of_ray_bounces = 100
    run("cornell 100-bounce", s)

    # several point lights sharing one shadow loop
    s = presets.cornell_box()
    s.width, s.height, s.nbr_of_iterations = 96, 64, 3
    solar = s.lights[0].spectrum
    s.lights = [
        Light((0.0, 0.9, 0.0), solar, "top"),
        Light((-0.8, 0.5, -0.5), solar, "left"),
        Light((0.8, 0.5, -0.5), solar, "right"),
        Light((0.0, -0.5, -0.8), solar, "low"),
    ]
    run("cornell 4-light", s)

    # dispersion + 128 bins together
    s = presets.prism(n_samples=128)
    s.width, s.height, s.nbr_of_iterations = 96, 64, 3
    run("prism 128-lambda dispersion", s)

    # many-object cluster path at 100 bounces
    s = presets.thousand_spheres() if hasattr(presets, "thousand_spheres") \
        else presets.PRESETS["spheres"]()
    s.width, s.height, s.nbr_of_iterations = 96, 64, 2
    s.nbr_of_ray_bounces = 100
    run("1000-sphere 100-bounce", s)

    print("all extremes passed")


if __name__ == "__main__":
    main()
