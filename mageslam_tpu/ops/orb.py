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


@jax.jit
def compute_orientations(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles (K,) in radians (reference ICAngles,
    OpenCVModified.cpp:399).

    Computed as two whole-image moment convolutions (kernels DISC*x and
    DISC*y) followed by a per-keypoint gather — a conv maps onto the MXU and
    avoids per-keypoint patch gathers feeding reductions (which XLA:CPU
    fuses pathologically).
    """
    kx = (DISC * _XGRID).reshape(1, 1, PATCH, PATCH)
    ky = (DISC * _YGRID).reshape(1, 1, PATCH, PATCH)
    p = jnp.pad(img, PATCH_RADIUS)[None, None]
    m10 = jax.lax.conv_general_dilated(p, kx, (1, 1), "VALID")[0, 0]
    m01 = jax.lax.conv_general_dilated(p, ky, (1, 1), "VALID")[0, 0]
    xi = jnp.clip(uv[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
    yi = jnp.clip(uv[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 256) bool -> (..., 8) uint32."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (DESC_WORDS, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


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
    pat = BRIEF_PATTERN.astype(jnp.float32)     # (256, 4)
    if use_orientation:
        c = jnp.cos(angles)[:, None]
        s = jnp.sin(angles)[:, None]
        x1 = pat[None, :, 0] * c - pat[None, :, 1] * s
        y1 = pat[None, :, 0] * s + pat[None, :, 1] * c
        x2 = pat[None, :, 2] * c - pat[None, :, 3] * s
        y2 = pat[None, :, 2] * s + pat[None, :, 3] * c
    else:
        k = uv.shape[0]
        x1 = jnp.broadcast_to(pat[None, :, 0], (k, NUM_PAIRS))
        y1 = jnp.broadcast_to(pat[None, :, 1], (k, NUM_PAIRS))
        x2 = jnp.broadcast_to(pat[None, :, 2], (k, NUM_PAIRS))
        y2 = jnp.broadcast_to(pat[None, :, 3], (k, NUM_PAIRS))

    def sample(patch, xs, ys):
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32) + PATCH_RADIUS,
                      0, PATCH - 1)
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32) + PATCH_RADIUS,
                      0, PATCH - 1)
        return patch[yi, xi]

    i1 = jax.vmap(sample)(patches, x1, y1)  # (K, 256)
    i2 = jax.vmap(sample)(patches, x2, y2)
    return _pack_bits(i1 < i2)
