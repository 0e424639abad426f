"""Flat vs smooth mesh shading demo (README artifact): the same
80-triangle icosphere with winding normals (left) and Phong-interpolated
vertex normals (right).

Run from the repo root: python tools/smooth_demo.py
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def render(smooth: bool) -> np.ndarray:
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.mesh import icosphere
    from spectral_tpu.scene.schema import SceneObject

    sc = presets.default_scene()
    sc.width, sc.height = 384, 384
    sc.nbr_of_iterations = 400
    sc.nbr_of_ray_bounces = 6
    # isolate: one diffuse ball over the default floor, lights kept
    floor = next(o for o in sc.objects if o.name == "Floor")
    ball = SceneObject((0.0, 0.2, 1.4), icosphere(0.9, 1, smooth=smooth),
                       sc.objects[1].material, name="ball")
    sc.objects = [floor, ball]
    r = Renderer(sc)
    return np.asarray(r.render())


def main():
    from spectral_tpu.render import image as image_mod

    flat = render(False)
    smooth = render(True)
    side = np.concatenate([flat, smooth], axis=1)
    out = pathlib.Path(__file__).resolve().parent.parent / "images"
    image_mod.save_image(side, out / "smooth_shading.png")
    print("saved images/smooth_shading.png (left: flat, right: smooth)")


if __name__ == "__main__":
    main()
