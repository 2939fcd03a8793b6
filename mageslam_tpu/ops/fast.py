"""FAST-9/16 corner detection as whole-image batched ops.

TPU-native replacement for the reference's templated scalar FAST
(Image/OpenCVModified.cpp:1225 FAST_t<16>, dispatched at :1517-1529): instead
of per-pixel byte loops with a lookup-table arc test, the detector evaluates
the full image at once — 16 shifted-image comparisons, a windowed circular
arc reduction, and a vectorized corner score — which XLA fuses into a handful
of VPU passes.  Non-max suppression is a 3x3 max-pool comparison, and the
per-cell feature gridding (reference keepBestKeyPoints,
Image/OpenCVModified.cpp:575-616) becomes a top-k over grid cells in
ops/select.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dx, dy), the standard FAST-16 ring, starting
# at 12 o'clock going clockwise.
CIRCLE_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC_LENGTH = 9  # FAST-9: contiguous arc of >= 9


def _shifted(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Image shifted so result[y, x] = img[y + dy, x + dx] (zero-pad edges)."""
    pad = 3
    p = jnp.pad(img, pad)
    h, w = img.shape
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))


@functools.partial(jax.jit, static_argnames=())
def fast_score_map(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """Corner response map (H, W) float32; 0 where not a FAST-9/16 corner.

    Score is the OpenCV-style margin: the largest t' such that the pixel is
    still a corner, computed as max over the 16 length-9 arcs of
    (min over arc of the signed exceedance), for bright and dark arcs.
    """
    img = img.astype(jnp.float32)
    t = jnp.asarray(threshold, jnp.float32)
    circle = jnp.stack([_shifted(img, dx, dy) for dx, dy in CIRCLE_OFFSETS])
    # (16, H, W) signed differences
    d_bright = circle - img[None] - t   # > 0 where circle pixel is brighter
    d_dark = img[None] - circle - t     # > 0 where circle pixel is darker

    def arc_score(d):
        # windowed min over every contiguous arc of length 9 (circular)
        dd = jnp.concatenate([d, d[:ARC_LENGTH - 1]], axis=0)  # (24, H, W)
        # min over window [k, k+9) for k in 0..15
        wins = jnp.stack([
            jnp.min(jax.lax.dynamic_slice_in_dim(dd, k, ARC_LENGTH, axis=0),
                    axis=0)
            for k in range(16)
        ])  # (16, H, W)
        return jnp.max(wins, axis=0)  # best arc margin

    score = jnp.maximum(arc_score(d_bright), arc_score(d_dark))
    score = jnp.maximum(score, 0.0)
    # kill the border (circle reads zero-padding there)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep scores that are the max of their 3x3 neighborhood.  Ties are
    KEPT (score >= max includes the center), so equal-score plateaus keep
    every plateau pixel — same semantics as fast_pallas._nms3x3."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
        [(1, 1), (1, 1)])
    return jnp.where((score >= m) & (score > 0), score, 0.0)


def detect(img: jnp.ndarray, threshold) -> jnp.ndarray:
    """score map with NMS applied."""
    return nms3x3(fast_score_map(img, threshold))
