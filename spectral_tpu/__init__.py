"""spectral_tpu — a TPU-native spectral path-tracing framework.

A ground-up re-design of the capabilities of happy737/spectral-raytracer
(a CPU-threaded recursive Rust path tracer) as a JAX/XLA/Pallas wavefront
path tracer:

* the per-pixel recursive shader pipeline (reference ``src/shader.rs``)
  becomes a batched ``[n_rays]`` / ``[n_rays, n_lambda]`` SoA wavefront with
  an iterative bounce loop,
* the ``Spectrum`` value type (reference ``src/spectrum.rs``) becomes the
  minor axis of device arrays, with CIE color matching and XYZ->sRGB
  conversion running on device,
* the row-level thread pool (reference ``src/main.rs:1280``) becomes data
  parallelism over pixel rows across a ``jax.sharding.Mesh``,
* the progressive accumulation buffer (reference ``src/custom_image.rs``)
  lives in HBM and is updated in-jit with donated buffers.

Public surface:
    spectral_tpu.Spectrum            -- host-side spectrum value type
    spectral_tpu.scene               -- scene schema + presets
    spectral_tpu.render.Renderer     -- progressive renderer
    spectral_tpu.parallel            -- mesh / sharding helpers
"""

from spectral_tpu.spectral.spectrum import (
    Spectrum,
    VISIBLE_LIGHT_WAVELENGTH_LOWER_BOUND,
    VISIBLE_LIGHT_WAVELENGTH_UPPER_BOUND,
    NBR_OF_SAMPLES_MAX,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import)
    if name == "Renderer":
        from spectral_tpu.render.renderer import Renderer

        return Renderer
    if name == "presets":
        from spectral_tpu.scene import presets

        return presets
    if name == "load_scene":
        from spectral_tpu.utils.sceneio import load_scene

        return load_scene
    if name == "save_scene":
        from spectral_tpu.utils.sceneio import save_scene

        return save_scene
    if name == "animation":
        from spectral_tpu.render import animation

        return animation
    if name == "mesh":
        from spectral_tpu.scene import mesh

        return mesh
    raise AttributeError(f"module 'spectral_tpu' has no attribute {name!r}")


__all__ = [
    "Spectrum",
    "Renderer",
    "presets",
    "load_scene",
    "save_scene",
    "animation",
    "mesh",
    "VISIBLE_LIGHT_WAVELENGTH_LOWER_BOUND",
    "VISIBLE_LIGHT_WAVELENGTH_UPPER_BOUND",
    "NBR_OF_SAMPLES_MAX",
    "__version__",
]
