"""Device-side spectrum -> linear RGB conversion.

The reference converts each pixel's spectrum via a per-sample CIE XYZ walk
and an XYZ->RGB matrix on the CPU (``get_rgb_early``, reference
``src/spectrum.rs:238-261``). Here the walk's weights are precomputed on
the host (``spectral_tpu.spectral.cie.xyz_integration_weights``, including
the f32 sample-drop quirk) and baked into an ``[n_samples, 3]`` matrix, so
the conversion becomes two small matmuls over the wavefront — MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spectra_to_rgb(
    spectra: jax.Array, xyz_weights: jax.Array, xyz_to_rgb: jax.Array
) -> jax.Array:
    """``[..., S]`` spectra -> ``[..., 3]`` linear RGB (no gamma, like the
    reference)."""
    xyz = jnp.matmul(
        spectra, xyz_weights, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.matmul(
        xyz, xyz_to_rgb.T, precision=jax.lax.Precision.HIGHEST
    )
