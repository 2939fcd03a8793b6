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


_CDX = jnp.asarray([dx for dx, dy in CIRCLE_OFFSETS], jnp.int32)
_CDY = jnp.asarray([dy for dx, dy in CIRCLE_OFFSETS], jnp.int32)


@jax.jit
def score_patches_at(img: jnp.ndarray, uv: jnp.ndarray,
                     threshold) -> jnp.ndarray:
    """(K, 3, 3) RAW FAST score neighborhoods at integer keypoints.

    Gather-based recompute for subpixel refinement: the NMS'd map zeroes
    a maximum's neighbors, so the full-map detect output cannot feed a
    parabola fit, and re-deriving just K*9 scores (K*9*17 gathers) is far
    cheaper than keeping a second full-resolution raw map live (and works
    identically after the fused Pallas detect, which never materializes
    the raw map)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    t = jnp.asarray(threshold, jnp.float32)
    x0 = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 4, w - 5)
    y0 = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 4, h - 5)
    offs = jnp.arange(-1, 2, dtype=jnp.int32)
    ys = y0[:, None, None] + offs[None, :, None]          # (K, 3, 1)
    xs = x0[:, None, None] + offs[None, None, :]          # (K, 1, 3)
    ys = jnp.broadcast_to(ys, ys.shape[:1] + (3, 3))
    xs = jnp.broadcast_to(xs, xs.shape[:1] + (3, 3))
    centers = img[ys, xs]                                  # (K, 3, 3)
    cy = ys[..., None] + _CDY                              # (K, 3, 3, 16)
    cx = xs[..., None] + _CDX
    circ = img[jnp.clip(cy, 0, h - 1), jnp.clip(cx, 0, w - 1)]
    d_bright = circ - centers[..., None] - t
    d_dark = centers[..., None] - circ - t

    def arc_score(d):
        dd = jnp.concatenate([d, d[..., :ARC_LENGTH - 1]], axis=-1)
        wins = jnp.stack([
            jnp.min(jax.lax.dynamic_slice_in_dim(dd, k, ARC_LENGTH,
                                                 axis=-1), axis=-1)
            for k in range(16)
        ], -1)
        return jnp.max(wins, -1)

    sc = jnp.maximum(arc_score(d_bright), arc_score(d_dark))
    return jnp.maximum(sc, 0.0)


@jax.jit
def subpixel_offsets(patches: jnp.ndarray) -> jnp.ndarray:
    """(K, 2) parabola-vertex offsets in [-0.5, 0.5] from (K, 3, 3) raw
    score neighborhoods.  Separable 1-D quadratic fit per axis; offset is
    zero where the center is not a proper maximum (non-negative
    curvature) so flat/edge responses never shift a keypoint."""
    s0 = patches[:, 1, 1]
    sxm, sxp = patches[:, 1, 0], patches[:, 1, 2]
    sym, syp = patches[:, 0, 1], patches[:, 2, 1]
    denx = sxm + sxp - 2.0 * s0
    deny = sym + syp - 2.0 * s0
    ox = jnp.where(denx < -1e-6, (sxm - sxp) / (2.0 * denx), 0.0)
    oy = jnp.where(deny < -1e-6, (sym - syp) / (2.0 * deny), 0.0)
    return jnp.stack([jnp.clip(ox, -0.5, 0.5),
                      jnp.clip(oy, -0.5, 0.5)], -1)
