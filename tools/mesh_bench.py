"""Mesh scene on the real TPU: correctness + perf of the megakernel.

Run from the repo root: python tools/mesh_bench.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax

def main():
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.mesh import icosphere
    from spectral_tpu.scene.schema import SceneObject
    from spectral_tpu.render.renderer import Renderer

    print("devices:", jax.devices())
    sc = presets.default_scene()
    sc.width, sc.height = 512, 384
    sc.nbr_of_iterations = 60
    sc.nbr_of_ray_bounces = 8
    # 1280-triangle mirror-ish icosphere floating over the default scene
    sc.objects.append(SceneObject((0.9, 0.6, 1.8), icosphere(0.7, 3),
                      sc.objects[0].material, name="icosphere"))
    t0 = time.monotonic()
    r = Renderer(sc)  # backend auto -> pallas megakernel, clustered
    img = np.asarray(r.render())
    dt = time.monotonic() - t0
    print("render+compile", round(dt, 1), "s; max", float(img.max()),
          "finite", bool(np.isfinite(img).all()))
    # timed steady-state: another 60 frames
    r2 = Renderer(sc)
    r2.render()  # warm (cached compile)
    t0 = time.monotonic()
    r2.reset(); out = r2.render()
    jax.block_until_ready(out)
    dt2 = time.monotonic() - t0
    print("steady:", round(dt2 / sc.nbr_of_iterations * 1000, 2), "ms/frame",
          "(1304 rows, 8 bounces, 512x384, 32 lambda)")
    from spectral_tpu.render import image as image_mod
    image_mod.save_image(img, "/root/repo/images/mesh_icosphere.png")
    print("saved images/mesh_icosphere.png")

main()
