"""Oriented BRIEF descriptors, batched over keypoints.

TPU-native replacement for the reference's rotated-BRIEF computation
(Image/OpenCVModified.cpp:399 ICAngles, :466-530 descriptor sampling;
descriptor container Image/ORBDescriptor.h:12-47 — 32 bytes per feature).

Design differences from the reference (deliberate, TPU-first):
  - The sampling pattern is a deterministic generated BRIEF pattern (fixed
    seed, points in a radius-13 disc) rather than OpenCV's hand-tuned
    bit_pattern_31 table.  Descriptors only need *internal* consistency —
    the engine matches its own descriptors and trains its BoW vocabulary
    online from them (reference BoW/OnlineBow trains from live frames too),
    so no cross-compatibility with OpenCV descriptors is required.
  - Descriptors are packed (N, 8) uint32 words so Hamming distance is
    XOR + lax.population_count — the SIMD popcount path the reference
    hand-codes in NEON (Tracking/FeatureMatcher.cpp:453+) comes for free.
  - All keypoints are processed as one batched gather: patches are
    dynamic-sliced per keypoint under vmap, orientation is an intensity-
    centroid reduction, and the 256 pair comparisons are a tensor compare.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15                 # 31x31 patch (FeatureExtractorSettings.PatchSize)
PATCH = 2 * PATCH_RADIUS + 1
PATTERN_RADIUS = 13               # pattern disc; rotation keeps it inside 15
NUM_PAIRS = 256
DESC_WORDS = 8                    # 256 bits = 8 x uint32 = 32 bytes


def _make_pattern(seed: int = 20240612) -> np.ndarray:
    """(NUM_PAIRS, 4) int32 [x1 y1 x2 y2], Gaussian pairs in a r=13 disc."""
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < NUM_PAIRS * 2:
        cand = rng.normal(0.0, PATTERN_RADIUS / 2.0, size=(NUM_PAIRS, 2))
        cand = np.round(cand).astype(np.int32)
        ok = (cand[:, 0] ** 2 + cand[:, 1] ** 2) <= PATTERN_RADIUS ** 2
        pts.extend(cand[ok].tolist())
    pts = np.asarray(pts[:NUM_PAIRS * 2], dtype=np.int32)
    return np.concatenate([pts[:NUM_PAIRS], pts[NUM_PAIRS:]], axis=1)


BRIEF_PATTERN = jnp.asarray(_make_pattern())  # (256, 4)

# circular mask weights for the intensity centroid (u_max per row, like
# OpenCV's ICAngles circular patch)
def _disc_mask(radius: int) -> np.ndarray:
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


DISC = jnp.asarray(_disc_mask(PATCH_RADIUS))           # (31, 31)
_XGRID = jnp.asarray(np.mgrid[-PATCH_RADIUS:PATCH_RADIUS + 1,
                              -PATCH_RADIUS:PATCH_RADIUS + 1][1]
                     .astype(np.float32))
_YGRID = jnp.asarray(np.mgrid[-PATCH_RADIUS:PATCH_RADIUS + 1,
                              -PATCH_RADIUS:PATCH_RADIUS + 1][0]
                     .astype(np.float32))


def _extract_patches(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """(K, 31, 31) patches centered on integer keypoint coords (zero pad)."""
    pad = PATCH_RADIUS + 1
    p = jnp.pad(img, pad)

    def one(xy):
        x = xy[0].astype(jnp.int32) + pad - PATCH_RADIUS
        y = xy[1].astype(jnp.int32) + pad - PATCH_RADIUS
        return jax.lax.dynamic_slice(p, (y, x), (PATCH, PATCH))

    return jax.vmap(one)(uv)


def _extract_patches_bilinear(img: jnp.ndarray,
                              uv: jnp.ndarray) -> jnp.ndarray:
    """(K, 31, 31) patches BILINEARLY resampled at fractional keypoint
    centers (r5 subpixel frontend): slice a (32, 32) integer patch at
    floor(uv), then blend its four 31x31 corner views by the fractional
    part — the descriptor sampling grid follows the refined corner
    position instead of snapping to the pixel grid, which measurably
    cuts cross-frame BRIEF bit flips.  Bit-exact with _extract_patches
    when the fraction is zero."""
    pad = PATCH_RADIUS + 2
    p = jnp.pad(img, pad)
    base = jnp.floor(uv)
    frac = uv - base

    def one(b, f):
        x = b[0].astype(jnp.int32) + pad - PATCH_RADIUS
        y = b[1].astype(jnp.int32) + pad - PATCH_RADIUS
        q = jax.lax.dynamic_slice(p, (y, x), (PATCH + 1, PATCH + 1))
        fx, fy = f[0], f[1]
        return (q[:-1, :-1] * (1 - fy) * (1 - fx)
                + q[:-1, 1:] * (1 - fy) * fx
                + q[1:, :-1] * fy * (1 - fx)
                + q[1:, 1:] * fy * fx)

    return jax.vmap(one)(base, frac)


def patch_orientations(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles (K,) from (K, 31, 31) patches (reference
    ICAngles, OpenCVModified.cpp:399): per-patch disc-weighted moment
    reductions — two tiny matvecs per keypoint, no image-sized convs."""
    flat = patches.reshape(patches.shape[0], PATCH * PATCH)
    wx = (DISC * _XGRID).reshape(PATCH * PATCH)
    wy = (DISC * _YGRID).reshape(PATCH * PATCH)
    m10 = flat @ wx
    m01 = flat @ wy
    return jnp.arctan2(m01, m10)


@jax.jit
def compute_orientations(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles (K,) in radians at keypoints uv.

    Equivalent to a whole-image moment conv sampled at uv, but computed
    from per-keypoint patches: at a few hundred keypoints the patch gather
    (K*31*31 elements) is ~1000x less work than convolving a 31x31 kernel
    over the full image (which XLA:TPU executes off-MXU for single-channel
    inputs — measured 24 ms vs <1 ms for the patch path on v5e).
    """
    return patch_orientations(_extract_patches(img, uv))


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 256) bool -> (..., 8) uint32."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (DESC_WORDS, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


# constant one-hot sampling matrices for the UNROTATED pattern: column k of
# _W1/_W2 selects pattern point (x1,y1)/(x2,y2) of pair k from a flattened
# 31x31 patch.  Sampling becomes (K, 961) @ (961, 256) — MXU work instead
# of 2*K*256 gathers.
def _onehot_sampler(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    idx = (ys + PATCH_RADIUS) * PATCH + (xs + PATCH_RADIUS)
    w = np.zeros((PATCH * PATCH, NUM_PAIRS), np.float32)
    w[idx, np.arange(NUM_PAIRS)] = 1.0
    return w


_PAT_NP = np.asarray(_make_pattern())
_W1 = jnp.asarray(_onehot_sampler(_PAT_NP[:, 0], _PAT_NP[:, 1]))
_W2 = jnp.asarray(_onehot_sampler(_PAT_NP[:, 2], _PAT_NP[:, 3]))


def _descriptors_from_patches(patches: jnp.ndarray, angles: jnp.ndarray,
                              use_orientation: bool) -> jnp.ndarray:
    pat = BRIEF_PATTERN.astype(jnp.float32)     # (256, 4)
    if use_orientation:
        c = jnp.cos(angles)[:, None]
        s = jnp.sin(angles)[:, None]
        x1 = pat[None, :, 0] * c - pat[None, :, 1] * s
        y1 = pat[None, :, 0] * s + pat[None, :, 1] * c
        x2 = pat[None, :, 2] * c - pat[None, :, 3] * s
        y2 = pat[None, :, 2] * s + pat[None, :, 3] * c

        def sample(patch, xs, ys):
            xi = jnp.clip(jnp.round(xs).astype(jnp.int32) + PATCH_RADIUS,
                          0, PATCH - 1)
            yi = jnp.clip(jnp.round(ys).astype(jnp.int32) + PATCH_RADIUS,
                          0, PATCH - 1)
            return patch[yi, xi]

        i1 = jax.vmap(sample)(patches, x1, y1)  # (K, 256)
        i2 = jax.vmap(sample)(patches, x2, y2)
    else:
        # unrotated (golden-path default): constant-index sampling as a
        # one-hot matmul; HIGHEST precision keeps the i1<i2 comparison
        # bit-exact vs gathered values (bf16 passes could flip near-ties)
        flat = patches.reshape(patches.shape[0], PATCH * PATCH)
        i1 = jnp.dot(flat, _W1, precision=jax.lax.Precision.HIGHEST)
        i2 = jnp.dot(flat, _W2, precision=jax.lax.Precision.HIGHEST)
    return _pack_bits(i1 < i2)


@functools.partial(jax.jit, static_argnames=("use_orientation",))
def compute_descriptors(img_smooth: jnp.ndarray, uv: jnp.ndarray,
                        angles: jnp.ndarray,
                        use_orientation: bool = True) -> jnp.ndarray:
    """(K, 8) uint32 rotated-BRIEF descriptors.

    img_smooth should be Gaussian-blurred (reference blurs before
    descriptor sampling).  With use_orientation=False (the golden-path
    default, FeatureExtractorSettings.UseOrientation=false) the raw pattern
    is sampled unrotated — plain BRIEF.
    """
    patches = _extract_patches(img_smooth, uv)  # (K, 31, 31)
    return _descriptors_from_patches(patches, angles, use_orientation)


@functools.partial(jax.jit, static_argnames=("use_orientation",
                                             "bilinear"))
def orient_and_describe(img_smooth: jnp.ndarray, uv: jnp.ndarray,
                        use_orientation: bool = True,
                        bilinear: bool = False):
    """Fused orientation + descriptor from ONE patch extraction.

    Returns (angles (K,), desc (K, 8) uint32).  This is the frontend's hot
    path: patches are gathered once and reused for both the moment
    reduction and the BRIEF comparisons.  ``bilinear`` resamples patches
    at the (subpixel-refined) fractional centers (r5 frontend).
    """
    patches = (_extract_patches_bilinear(img_smooth, uv) if bilinear
               else _extract_patches(img_smooth, uv))
    angles = patch_orientations(patches)
    return angles, _descriptors_from_patches(patches, angles,
                                             use_orientation)
