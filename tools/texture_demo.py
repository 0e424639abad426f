"""Checker-texture demo on TPU (README artifact): the Cornell box with a
checkered floor and back wall.

Run from the repo root: python tools/texture_demo.py
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.schema import Checker

    sc = presets.cornell_box()
    sc.width = sc.height = 384
    sc.nbr_of_iterations = 400
    floor_grey = sc.objects[2].material  # grey plastic shared by walls
    floor_grey.texture = Checker(scale=0.5, low=0.25)
    img = np.asarray(Renderer(sc).render())
    out = pathlib.Path(__file__).resolve().parent.parent / "images"
    image_mod.save_image(img, out / "checker_cornell.png")
    print("saved images/checker_cornell.png, max", float(img.max()))


if __name__ == "__main__":
    main()
