"""Denoiser demo: a deliberately-noisy low-iteration Cornell render next
to its AOV-guided denoised version (README artifact).

Run from the repo root: python tools/denoise_demo.py [iterations]
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main(iterations=12):
    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.denoise import denoise_render
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets

    scene = presets.cornell_box()
    scene.width = scene.height = 384
    scene.nbr_of_iterations = iterations
    r = Renderer(scene)
    t0 = time.monotonic()
    fb = np.asarray(r.render())
    t1 = time.monotonic()
    dn = denoise_render(scene, fb)
    t2 = time.monotonic()
    print(f"render {t1 - t0:.1f}s, denoise {t2 - t1:.2f}s "
          f"({iterations} iterations, 384^2)")
    side = np.concatenate([fb, dn], axis=1)  # raw | denoised
    out = pathlib.Path(__file__).resolve().parent.parent / "images"
    image_mod.save_image(side, out / "denoise_compare.png")
    print("saved images/denoise_compare.png (left: raw, right: denoised)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
