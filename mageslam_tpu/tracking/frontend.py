"""Feature-extraction frontend: image -> FrameFeatures.

The batched equivalent of the reference's ImageAnalyzer + OrbFeatureDetector
stage (Tasks/ImageAnalyzer.cpp:94-127: undistort dispatch -> ORB
detectAndCompute -> BoW training feed;  Image/AnalyzedImage.h:25-160 is the
immutable product).  One jitted program does blur -> FAST -> NMS -> gridded
top-k -> orientation -> BRIEF -> keypoint undistortion for a whole frame;
the output FrameFeatures is the fixed-shape analog of AnalyzedImage.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import FeatureExtractorSettings, PerCameraSettings
from mageslam_tpu.geometry.camera import CameraCalibration, unproject
from mageslam_tpu.ops import fast, fast_pallas, orb, pyramid, select


# The grid-less Pallas kernels keep the whole padded image plus ~40 (h, w)
# f32 intermediates live in VMEM (~16 MB); beyond this pixel count the
# Mosaic compile would blow VMEM, so larger levels take the jnp path.
PALLAS_MAX_PIXELS = 100_000


def _use_pallas(shape, use_pallas: bool | None) -> bool:
    """Resolve the kernel dispatch: explicit flag wins; default = the
    process backend (jax.default_backend()), guarded by the VMEM budget."""
    if shape[0] * shape[1] > PALLAS_MAX_PIXELS:
        return False
    if use_pallas is None:
        return jax.default_backend() == "tpu"
    return bool(use_pallas)


class FrameFeatures(NamedTuple):
    """Fixed-capacity per-frame features (analog of AnalyzedImage.h:25-160).

    All arrays have leading dim = capacity.max_features; `valid` masks real
    detections.  `uv` are detection (distorted-image) pixels; `xn_undist` are
    undistorted *normalized* coords used by all geometry.
    """

    uv: jnp.ndarray          # (K, 2) float32
    xn_undist: jnp.ndarray   # (K, 2) float32 normalized undistorted coords
    response: jnp.ndarray    # (K,) float32
    angle: jnp.ndarray       # (K,) float32 radians
    octave: jnp.ndarray      # (K,) int32 pyramid level
    desc: jnp.ndarray        # (K, 8) uint32 packed 256-bit BRIEF
    valid: jnp.ndarray       # (K,) bool

    @property
    def count(self):
        return jnp.sum(self.valid)


def empty_features(max_features: int) -> FrameFeatures:
    k = max_features
    return FrameFeatures(
        uv=jnp.zeros((k, 2), jnp.float32),
        xn_undist=jnp.zeros((k, 2), jnp.float32),
        response=jnp.zeros((k,), jnp.float32),
        angle=jnp.zeros((k,), jnp.float32),
        octave=jnp.zeros((k,), jnp.int32),
        desc=jnp.zeros((k, 8), jnp.uint32),
        valid=jnp.zeros((k,), bool),
    )


def extract_features(img: jnp.ndarray, cal: CameraCalibration,
                     fast_threshold: float,
                     max_features: int = 512,
                     num_levels: int = 1,
                     scale_factor: float = 1.5,
                     gaussian_ksize: int = 7,
                     use_orientation: bool = False,
                     cells_x: int = 32, cells_y: int = 32,
                     per_cell: int = 4,
                     use_subpixel: bool = True,
                     use_pallas: bool | None = None) -> FrameFeatures:
    """Full frontend on a grayscale float32 (H, W) image.

    Kernel dispatch (Pallas vs jnp) is resolved here per pyramid level —
    outside the jit — so the choice is an explicit static argument of the
    compiled program rather than a trace-time peek at the process default
    backend (the jit cache keys on it, and CPU placement in a TPU-default
    process works).
    """
    h, w = img.shape[:2]
    flags = tuple(
        _use_pallas(pyramid.level_shape(h, w, lvl, scale_factor), use_pallas)
        for lvl in range(num_levels))
    return _extract_features_impl(
        img, cal, fast_threshold, max_features, num_levels, scale_factor,
        gaussian_ksize, use_orientation, cells_x, cells_y, per_cell,
        use_subpixel, flags)


@functools.partial(
    jax.jit,
    static_argnames=("fast_threshold", "max_features", "num_levels",
                     "scale_factor", "gaussian_ksize", "use_orientation",
                     "cells_x", "cells_y", "per_cell", "use_subpixel",
                     "pallas_flags"))
def _extract_features_impl(img: jnp.ndarray, cal: CameraCalibration,
                           fast_threshold: float,
                           max_features: int,
                           num_levels: int,
                           scale_factor: float,
                           gaussian_ksize: int,
                           use_orientation: bool,
                           cells_x: int, cells_y: int,
                           per_cell: int,
                           use_subpixel: bool,
                           pallas_flags: tuple) -> FrameFeatures:
    """Jitted frontend body.  Multi-level detection splits the feature
    budget per level by inverse scale area (like the reference's per-level
    allocation) and maps keypoint coords back to level-0 pixels."""
    img = img.astype(jnp.float32)
    levels = pyramid.build_pyramid(img, num_levels, scale_factor)

    per_level_feats = []
    # budget per level proportional to pixel count
    areas = [lv.shape[0] * lv.shape[1] for lv in levels]
    total_area = sum(areas)
    budgets = [max(16, int(round(max_features * a / total_area)))
               for a in areas]
    # fix rounding so sum == max_features
    budgets[0] += max_features - sum(budgets)

    for lvl, (lv_img, budget) in enumerate(zip(levels, budgets)):
        on_tpu = pallas_flags[lvl] if lvl < len(pallas_flags) else False
        if on_tpu and gaussian_ksize <= 2 * fast_pallas.PAD + 1:
            # fused Pallas stage: blur + FAST + NMS from one HBM read
            score, smooth = fast_pallas.detect_and_smooth(
                lv_img, float(fast_threshold), gaussian_ksize)
        else:
            smooth = pyramid.gaussian_blur(lv_img, gaussian_ksize)
            score = (fast_pallas.detect(lv_img, float(fast_threshold))
                     if on_tpu else fast.detect(lv_img, fast_threshold))
        kps = select.select_gridded(score, budget, cells_x, cells_y, per_cell)
        if use_subpixel:
            # parabola-vertex refinement on the RAW score neighborhood +
            # bilinear descriptor sampling at the refined centers (r5,
            # VERDICT r4 #3 — the integer-grid stack localized ~1.4 px
            # and grid quantization flipped descriptor bits frame to
            # frame; ops/fast.py score_patches_at / subpixel_offsets)
            sp = fast.score_patches_at(lv_img, kps.uv,
                                       float(fast_threshold))
            kps = kps._replace(
                uv=kps.uv + fast.subpixel_offsets(sp)
                * kps.valid[:, None])
        angles, desc = orb.orient_and_describe(smooth, kps.uv,
                                               use_orientation,
                                               bilinear=use_subpixel)
        scale = scale_factor ** lvl
        per_level_feats.append(FrameFeatures(
            uv=kps.uv * scale,
            xn_undist=jnp.zeros_like(kps.uv),
            response=kps.response,
            angle=angles,
            octave=jnp.full((budget,), lvl, jnp.int32),
            desc=desc,
            valid=kps.valid,
        ))

    f = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *per_level_feats)
    # undistorted normalized coords for geometry (reference undistorts
    # keypoints rather than pixels by default, PerCameraSettings
    # .UndistortImagePixels=false)
    xn = unproject(cal, f.uv)[..., :2]
    return f._replace(xn_undist=xn)


def extract_for_settings(img: jnp.ndarray, cal: CameraCalibration,
                         cam: PerCameraSettings,
                         max_features: int) -> FrameFeatures:
    """Frontend driven by a PerCameraSettings bag.

    Undistortion dispatch (Tasks/ImageAnalyzer.cpp:26-51): with
    ``undistort_image_pixels`` set, the IMAGE is rectified through the
    inverse distortion remap first and detection runs on the rectified
    pixels against the matching pinhole calibration; otherwise detection
    runs on the distorted image and only the KEYPOINT coordinates are
    undistorted downstream (the golden-path default)."""
    if cam.undistort_image_pixels:
        from mageslam_tpu.ops import undistort
        img = undistort.undistort_image(img, cal)
        cal = undistort.undistorted_calibration(cal)
    fe: FeatureExtractorSettings = cam.features
    return extract_features(
        img, cal,
        fast_threshold=float(fe.fast_threshold),
        max_features=max_features,
        num_levels=int(fe.num_levels),
        scale_factor=float(fe.scale_factor),
        gaussian_ksize=int(fe.gaussian_kernel_size),
        use_orientation=bool(fe.use_orientation),
        cells_x=int(fe.num_cells_x), cells_y=int(fe.num_cells_y),
        use_subpixel=bool(getattr(fe, "use_subpixel", True)),
    )
