"""Fused FAST-9/16 corner score + 3x3 NMS as one Pallas TPU kernel.

The jnp formulation (ops/fast.py) expresses the detector as ~300
whole-image VPU passes (16 shifted compares, windowed circular-arc mins,
NMS compares); XLA fuses much of it but still stages multi-megabyte
(16, H, W) intermediates through HBM.  At 320x180 the entire working set
fits in VMEM with room to spare, so this kernel computes score + NMS in a
single pallas_call with every intermediate on-chip: one HBM read of the
padded image, one HBM write of the suppressed score map.

Sliding-window circular-arc minima use a doubling (sparse-table) scheme:
min over the 9-length arc starting at k = min(m4[k], m4[(k+4)%16],
d[(k+8)%16]) where m4 = two levels of pairwise mins — log-steps instead
of 9 linear mins per arc.

Reference analog: Image/OpenCVModified.cpp:1225 FAST_t<16> (per-pixel
scalar arc test + LUT) and the 3x3 NMS of its keypoint pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mageslam_tpu.ops.fast import CIRCLE_OFFSETS

PAD = 3  # circle radius; also the 7-tap blur apron (ksize // 2)


def _fast_score(img_ref, h: int, w: int, thr: float) -> jnp.ndarray:
    """FAST-9/16 margin score over the (h, w) interior of a PAD-padded
    VMEM ref. Circular-arc window minima via a doubling scheme."""
    center = img_ref[PAD:PAD + h, PAD:PAD + w]
    circle = [img_ref[PAD + dy:PAD + dy + h, PAD + dx:PAD + dx + w]
              for dx, dy in CIRCLE_OFFSETS]

    def arc_score(diffs):
        m1 = [jnp.minimum(diffs[k], diffs[(k + 1) % 16]) for k in range(16)]
        m2 = [jnp.minimum(m1[k], m1[(k + 2) % 16]) for k in range(16)]
        # m8[k] = min over diffs[k .. k+7] (cyclic)
        m8 = [jnp.minimum(m2[k], m2[(k + 4) % 16]) for k in range(16)]
        best = None
        for k in range(16):
            w9 = jnp.minimum(m8[k], diffs[(k + 8) % 16])
            best = w9 if best is None else jnp.maximum(best, w9)
        return best

    d_bright = [c - center - thr for c in circle]
    d_dark = [center - c - thr for c in circle]
    score = jnp.maximum(
        jnp.maximum(arc_score(d_bright), arc_score(d_dark)), 0.0)

    # interior mask (the circle reads padding at the border)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((yy >= PAD) & (yy < h - PAD) &
                (xx >= PAD) & (xx < w - PAD))
    return jnp.where(interior, score, 0.0)


def _nms3x3(score: jnp.ndarray, apron_ref, h: int, w: int) -> jnp.ndarray:
    """3x3 NMS through a 1-pixel zero apron in scratch.  Ties are KEPT
    (score >= neighborhood max): equal-score plateaus yield one keypoint
    per plateau pixel, matching ops.fast.nms3x3 bit-exactly."""
    apron_ref[:, :] = jnp.zeros((h + 2, w + 2), jnp.float32)
    apron_ref[1:h + 1, 1:w + 1] = score
    m = apron_ref[0:h, 0:w]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, apron_ref[dy:dy + h, dx:dx + w])
    return jnp.where((score >= m) & (score > 0), score, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def detect(img: jnp.ndarray, threshold: float,
           interpret: bool = False) -> jnp.ndarray:
    """NMS'd FAST-9/16 score map; drop-in for ops.fast.detect.  threshold
    is STATIC (a compile-time constant): it comes from the settings bag and
    never changes within a session, and baking it in is worth ~0.3 ms/frame
    vs feeding it through SMEM (measured on v5e: 0.99 vs 1.33 ms).
    interpret=True runs the Mosaic interpreter (CPU testing)."""
    h, w = img.shape
    padded = jnp.pad(img.astype(jnp.float32), PAD)
    thr = float(threshold)

    def kernel(img_ref, out_ref, apron_ref):
        score = _fast_score(img_ref, h, w, thr)
        out_ref[:, :] = _nms3x3(score, apron_ref, h, w)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32)],
        interpret=interpret,
    )(padded)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "ksize", "interpret"))
def detect_and_smooth(img: jnp.ndarray, threshold: float, ksize: int = 7,
                      interpret: bool = False):
    """Fused frontend image stage: (NMS'd FAST score map, Gaussian-smoothed
    image) from ONE HBM read of the frame.

    Replaces the pair ops.pyramid.gaussian_blur + ops.fast.detect — XLA:TPU
    lowers single-channel convolutions poorly (off-MXU), and the two jnp
    stages each re-stage the image through HBM.  Here the separable 7-tap
    blur runs as shifted multiply-adds in VMEM alongside the corner score.

    The input is reflect-padded by 3 (= blur apron for ksize<=7); FAST is
    indifferent to the padding mode because its 3-pixel border is masked.
    Blur matches pyramid.gaussian_blur (reflect / BORDER_REFLECT_101) to
    float32 mul-add reassociation.
    """
    if ksize > 2 * PAD + 1:
        raise ValueError(f"ksize {ksize} needs a larger apron than {PAD}")
    h, w = img.shape
    padded = jnp.pad(img.astype(jnp.float32), PAD, mode="reflect")
    thr = float(threshold)
    import numpy as np
    # same taps as pyramid.gaussian_kernel1d (OpenCV default sigma)
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2.0
    taps = np.exp(-0.5 * (x / np.float32(sigma)) ** 2).astype(np.float32)
    taps = taps / taps.sum()
    off0 = PAD - ksize // 2  # offset of the first tap inside the apron

    def kernel(img_ref, score_ref, smooth_ref, apron_ref, hblur_ref):
        score = _fast_score(img_ref, h, w, thr)
        score_ref[:, :] = _nms3x3(score, apron_ref, h, w)

        # horizontal blur over all padded rows (vertical pass needs y+-3)
        hb = None
        for i, tap in enumerate(taps.tolist()):
            term = img_ref[:, off0 + i:off0 + i + w] * tap
            hb = term if hb is None else hb + term
        hblur_ref[:, :] = hb
        vb = None
        for j, tap in enumerate(taps.tolist()):
            term = hblur_ref[off0 + j:off0 + j + h, :] * tap
            vb = term if vb is None else vb + term
        smooth_ref[:, :] = vb

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32),
                        pltpu.VMEM((h + 2 * PAD, w), jnp.float32)],
        interpret=interpret,
    )(padded)
