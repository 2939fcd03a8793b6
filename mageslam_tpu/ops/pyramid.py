"""Image pyramid + Gaussian smoothing, fully batched XLA ops.

Equivalent of the reference's pyramid build inside the modified-OpenCV ORB
path (Image/OpenCVModified.cpp:820-860) and the Gaussian blur the descriptor
sampling depends on (FeatureExtractorSettings.GaussianKernelSize,
MageSettings.h:156).  The golden path runs a 1-level pyramid at 320x180
(console.cpp:229), so multi-level support is a parity feature; levels are
computed eagerly as a python list of arrays (static shapes per level).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def gaussian_kernel1d(ksize: int, sigma: float | None = None) -> jnp.ndarray:
    if sigma is None or sigma <= 0:
        # OpenCV's default sigma for getGaussianKernel
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("ksize",))
def gaussian_blur(img: jnp.ndarray, ksize: int = 7,
                  sigma: float | None = None) -> jnp.ndarray:
    """Separable Gaussian blur on (H, W) float32 with reflect padding."""
    if ksize <= 1:
        return img
    k = gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, ksize, 1), (1, 1), "VALID")[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k.reshape(1, 1, 1, ksize), (1, 1), "VALID")[0, 0]
    return x


def level_shape(h: int, w: int, level: int, scale_factor: float):
    s = scale_factor ** level
    return max(8, int(round(h / s))), max(8, int(round(w / s)))


def resize_level(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(img, (h, w), method="linear")


def build_pyramid(img: jnp.ndarray, num_levels: int,
                  scale_factor: float) -> list[jnp.ndarray]:
    """Returns [level0, level1, ...]; level0 is the input image."""
    h, w = img.shape
    out = [img]
    for lvl in range(1, num_levels):
        lh, lw = level_shape(h, w, lvl, scale_factor)
        out.append(resize_level(img, lh, lw))
    return out


def to_gray_f32(img) -> jnp.ndarray:
    """uint8 (H,W) or (H,W,3) -> float32 grayscale in [0,255]."""
    x = jnp.asarray(img)
    if x.ndim == 3:
        x = (0.299 * x[..., 2].astype(jnp.float32)
             + 0.587 * x[..., 1].astype(jnp.float32)
             + 0.114 * x[..., 0].astype(jnp.float32))
    return x.astype(jnp.float32)
