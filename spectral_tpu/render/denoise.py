"""AOV-guided edge-avoiding A-Trous wavelet denoiser.

A beyond-reference capability (the reference ships raw Monte-Carlo
output and relies on iteration count alone for noise — its guidance is
"decent > 100, good > 1000" iterations, reference
``src/text_resources.rs:8-11``): a feature-guided spatial filter in the
family of Dammertz et al. 2010 ("Edge-Avoiding A-Trous Wavelet Transform
for fast Global Illumination Filtering") that removes residual
Monte-Carlo noise from a progressive render using the first-hit
G-buffers (``spectral_tpu.render.aov``) as edge stops.

Design (TPU-first): the filter is one jitted XLA program over the whole
``[H, W]`` image — each a-trous level is a statically-unrolled 5x5 tap
stencil at stride ``2^level``, expressed as shifted static slices of an
edge-padded array, so XLA fuses each level into a single elementwise
pass (no gather, no dynamic shapes). Albedo is demodulated before
filtering and re-modulated after, so texture/material detail never
blurs; normals, depth and albedo gate the kernel weights so geometric
edges survive.

The filter runs on the *linear* accumulated radiance (before any
display transform) and is strictly post-process: the beauty render and
its checkpoints are untouched, so denoising never perturbs the
reference-parity render path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["atrous_denoise", "denoise_rgb", "denoise_render"]

# B3-spline coefficients of the a-trous wavelet kernel (outer product
# gives the 5x5 stencil); the center weight (3/8)^2 keeps the total tap
# weight strictly positive even when every edge-stop rejects.
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)

_MISS_DEPTH = 1.0e8  # finite sentinel for no-hit pixels (depth aov is +inf)


# Rec.709 luminance weights for the variance-guided color stop
_LUM = (0.2126, 0.7152, 0.0722)


def _luminance(rgb):
    return (
        _LUM[0] * rgb[..., 0] + _LUM[1] * rgb[..., 1] + _LUM[2] * rgb[..., 2]
    )


def _taps(a, stride, h, w):
    """The 25 shifted views of ``a`` for a 5x5 stencil at ``stride``
    (edge-padded static slices — XLA-fusable, no gathers)."""
    pad = 2 * stride
    widths = ((pad, pad), (pad, pad)) + ((0, 0),) * (a.ndim - 2)
    ap = jnp.pad(a, widths, mode="edge")
    out = []
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            oy, ox = pad + dy * stride, pad + dx * stride
            start = (oy, ox) + (0,) * (a.ndim - 2)
            limit = (oy + h, ox + w) + a.shape[2:]
            out.append(
                (
                    _B3[dy + 2] * _B3[dx + 2],
                    jax.lax.slice(ap, start, limit),
                )
            )
    return out


@partial(jax.jit, static_argnums=(3,))
def _atrous_filter(illum, normal, depth, iterations, sigmas):
    """Variance-guided a-trous cascade over ``illum`` ``[H, W, 3]``
    (the SVGF weight formulation, Schied et al. 2017, without the
    temporal stage — progressive accumulation already plays that role).

    ``normal`` ``[H, W, 3]`` must be unit-length everywhere (miss pixels
    substituted before the call), ``depth`` ``[H, W]`` finite.
    ``sigmas`` is a length-3 f32 array (color, normal-power, depth).

    The color stop normalizes the luminance difference by a *local noise
    estimate* (a per-pixel variance plane, spatially bootstrapped and
    then propagated through each level with squared weights), so the
    filter adapts to the actual noise magnitude — crucial because albedo
    demodulation rescales noise per channel.
    """
    h, w = illum.shape[0], illum.shape[1]
    sigma_c, sigma_n, sigma_d = sigmas[0], sigmas[1], sigmas[2]

    # bootstrap the noise estimate: 3x3 spatial luminance variance
    lum0 = _luminance(illum)
    m1 = jnp.zeros((h, w), illum.dtype)
    m2 = jnp.zeros((h, w), illum.dtype)
    all_taps = _taps(lum0, 1, h, w)
    inner3x3 = all_taps[6:9] + all_taps[11:14] + all_taps[16:19]
    for _k, lq in inner3x3:
        m1 = m1 + lq
        m2 = m2 + lq * lq
    m1, m2 = m1 / 9.0, m2 / 9.0
    var = jnp.maximum(m2 - m1 * m1, 0.0)

    for level in range(iterations):
        stride = 1 << level

        # 3x3 blur of the variance plane stabilizes the noise estimate
        gvar = jnp.zeros_like(var)
        gw = 0.0
        for kk, vq in _taps(var, 1, h, w):
            gvar = gvar + kk * vq
            gw = gw + kk
        gvar = gvar / gw
        lum_p = _luminance(illum)
        inv_cdenom = 1.0 / (sigma_c * jnp.sqrt(gvar) + 1e-4)

        num = jnp.zeros_like(illum)
        num_v = jnp.zeros((h, w), illum.dtype)
        den = jnp.zeros((h, w), illum.dtype)
        tap_i = _taps(illum, stride, h, w)
        tap_n = _taps(normal, stride, h, w)
        tap_d = _taps(depth, stride, h, w)
        tap_v = _taps(var, stride, h, w)
        for (k, iq), (_, nq), (_, dq), (_, vq) in zip(
            tap_i, tap_n, tap_d, tap_v
        ):
            w_color = jnp.exp(
                -jnp.abs(lum_p - _luminance(iq)) * inv_cdenom
            )
            ndot = jnp.maximum(jnp.sum(normal * nq, axis=-1), 0.0)
            w_normal = jnp.power(ndot, sigma_n)
            # relative depth stop, stride-scaled so coarse levels
            # tolerate the larger depth span they legitimately cover
            w_depth = jnp.exp(
                -jnp.abs(depth - dq)
                / (sigma_d * stride * (jnp.abs(depth) + 1.0) + 1e-6)
            )
            wt = k * w_color * w_normal * w_depth
            num = num + wt[..., None] * iq
            num_v = num_v + wt * wt * vq
            den = den + wt
        illum = num / den[..., None]
        var = num_v / (den * den)
    return illum


def atrous_denoise(
    rgb,
    depth,
    normal,
    albedo,
    *,
    iterations: int = 5,
    sigma_color: float = 4.0,
    sigma_normal: float = 128.0,
    sigma_depth: float = 0.05,
    demodulate: bool = True,
):
    """Denoise a linear-RGB image guided by first-hit feature buffers.

    Args:
      rgb: ``[H, W, 3]`` linear radiance (the accumulated framebuffer).
      depth: ``[H, W]`` first-hit ray distance, ``+inf`` on miss
        (``compute_aovs()['depth']``).
      normal: ``[H, W, 3]`` unit shading normal, zeros on miss.
      albedo: ``[H, W, 3]`` linear first-hit reflectance, zeros on miss.
      iterations: a-trous levels; level ``i`` filters at stride ``2^i``,
        so 5 levels cover a ~64-pixel footprint.
      sigma_color: luminance edge-stop in units of the local noise
        standard deviation (variance-guided, SVGF-style) — lower keeps
        more lighting detail, higher filters harder.
      sigma_normal: exponent on ``max(0, n_p . n_q)`` — higher keeps
        creases sharper.
      sigma_depth: relative depth edge-stop per unit stride.
      demodulate: divide out albedo before filtering (and re-multiply
        after) so material texture is preserved exactly.

    Returns an ``[H, W, 3]`` float32 numpy array.
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    if rgb.ndim != 3 or rgb.shape[-1] != 3:
        raise ValueError(f"rgb must be [H, W, 3], got {rgb.shape}")
    if depth.shape != rgb.shape[:2]:
        raise ValueError(
            f"depth shape {depth.shape} != image {rgb.shape[:2]}"
        )

    hit = jnp.isfinite(depth)
    # miss pixels share a constant plane (sentinel depth + a fixed unit
    # normal) so sky averages with sky and never with geometry — the
    # depth stop separates the two populations
    depth_eff = jnp.where(hit, depth, _MISS_DEPTH)
    miss_n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    normal_eff = jnp.where(hit[..., None], normal, miss_n)

    if demodulate:
        # per-channel: only channels with meaningful reflectance are
        # divided (out-of-gamut negative albedo and miss pixels pass
        # through), and the same `safe` array re-modulates — an exact
        # inverse wherever demodulation was skipped
        safe = jnp.where(albedo > 1e-3, albedo, 1.0)
    else:
        safe = jnp.ones_like(rgb)
    illum = rgb / safe

    sig = jnp.asarray(
        [sigma_color, sigma_normal, sigma_depth], jnp.float32
    )
    out = _atrous_filter(illum, normal_eff, depth_eff, int(iterations), sig)
    return np.asarray(jax.device_get(out * safe), np.float32)


def denoise_rgb(scene, rgb, **kwargs):
    """Denoise ``rgb`` using AOVs computed from ``scene`` (a schema
    ``Scene``). Convenience wrapper over :func:`atrous_denoise`."""
    from spectral_tpu.render.aov import compute_aovs

    aovs = compute_aovs(scene)
    return atrous_denoise(
        rgb, aovs["depth"], aovs["normal"], aovs["albedo"], **kwargs
    )


def denoise_render(scene, rgba, **kwargs):
    """Denoise a rendered ``[H, W, 4]`` RGBA framebuffer; alpha passes
    through untouched. Returns float32 RGBA."""
    rgba = np.asarray(rgba, np.float32)
    out = denoise_rgb(scene, rgba[..., :3], **kwargs)
    return np.concatenate([out, rgba[..., 3:4]], axis=-1)
