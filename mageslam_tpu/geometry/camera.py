"""Camera models: pinhole + polynomial / rational distortion.

TPU-native equivalent of the reference's camera-model hierarchy
(Data/Data.h:150-330: PinholeCameraModel, Poly3KCameraModel,
Rational6KCameraModel, LinearFocalLengthModel) and
Device/CameraCalibration.h:17-89.  One fixed-shape ``CameraCalibration``
pytree covers all variants: a model id selects how many distortion
coefficients are active, so jitted code never branches on python types.

Distortion follows the OpenCV convention the reference relies on:
  poly3k:     k1, k2, k3 radial          (Data.h Poly3K)
  rational6k: k1..k6 rational radial + p1, p2 tangential (Rational6K)

All functions broadcast over leading batch dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

MODEL_PINHOLE = 0
MODEL_POLY3K = 1
MODEL_RATIONAL6K = 2


class CameraCalibration(NamedTuple):
    """Fixed-shape calibration pytree.

    fx, fy, cx, cy: pixels.  dist: (8,) = [k1 k2 p1 p2 k3 k4 k5 k6]
    (OpenCV layout).  model: int32 scalar, one of MODEL_*.
    width/height: static python ints describing the calibrated image size.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray
    model: jnp.ndarray
    width: int = 320
    height: int = 180

    @staticmethod
    def pinhole(fx, fy, cx, cy, width=320, height=180) -> "CameraCalibration":
        return CameraCalibration(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
            jnp.float32(cy), jnp.zeros(8, jnp.float32),
            jnp.int32(MODEL_PINHOLE), width, height)

    @staticmethod
    def poly3k(fx, fy, cx, cy, k1, k2, k3, width=320,
               height=180) -> "CameraCalibration":
        d = jnp.array([k1, k2, 0.0, 0.0, k3, 0.0, 0.0, 0.0], jnp.float32)
        return CameraCalibration(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
            jnp.float32(cy), d, jnp.int32(MODEL_POLY3K), width, height)

    @staticmethod
    def rational6k(fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, k5, k6,
                   width=320, height=180) -> "CameraCalibration":
        d = jnp.array([k1, k2, p1, p2, k3, k4, k5, k6], jnp.float32)
        return CameraCalibration(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
            jnp.float32(cy), d, jnp.int32(MODEL_RATIONAL6K), width, height)

    def k_matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1),
        ], -2)

    def scaled(self, sx: float, sy: float) -> "CameraCalibration":
        """Calibration for a resized image (reference scales K per pyramid/
        resolution, MageSettings.h:336 tracking width)."""
        return self._replace(
            fx=self.fx * sx, fy=self.fy * sy,
            cx=self.cx * sx, cy=self.cy * sy,
            width=int(round(self.width * sx)),
            height=int(round(self.height * sy)))


def distort_normalized(cal: CameraCalibration, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply distortion to normalized coords (..., 2) -> (..., 2)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(cal.dist, -1, 0)
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    xd = jnp.stack([x * radial + dx, y * radial + dy], axis=-1)
    return jnp.where(cal.model == MODEL_PINHOLE, xn, xd)


def undistort_normalized(cal: CameraCalibration, xd: jnp.ndarray,
                         iters: int = 8) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (fixed count, jit-safe).

    Replaces the reference's keypoint undistortion
    (Image/OrbFeatureDetector.h:43-47, Image/ImagePreprocessor.*).
    """
    xn = xd
    for _ in range(iters):
        delta = distort_normalized(cal, xn) - xn
        xn = xd - delta
    return jnp.where(cal.model == MODEL_PINHOLE, xd, xn)


def project(cal: CameraCalibration, x_cam: jnp.ndarray):
    """Camera-frame points (..., 3) -> pixel coords (..., 2), depth (...,).

    Callers mask on depth > 0 and in-bounds; this never NaNs on z<=0.
    """
    z = x_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    xn = x_cam[..., :2] / zs[..., None]
    xd = distort_normalized(cal, xn)
    u = cal.fx * xd[..., 0] + cal.cx
    v = cal.fy * xd[..., 1] + cal.cy
    return jnp.stack([u, v], axis=-1), z


def unproject(cal: CameraCalibration, uv: jnp.ndarray,
              depth: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pixels (..., 2) (+ optional depth) -> camera-frame rays/points (...,3)."""
    xn = jnp.stack([(uv[..., 0] - cal.cx) / cal.fx,
                    (uv[..., 1] - cal.cy) / cal.fy], axis=-1)
    xn = undistort_normalized(cal, xn)
    ray = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    if depth is not None:
        ray = ray * depth[..., None]
    return ray


def in_bounds(cal: CameraCalibration, uv: jnp.ndarray,
              border: float = 0.0) -> jnp.ndarray:
    return ((uv[..., 0] >= border) & (uv[..., 0] <= cal.width - 1 - border)
            & (uv[..., 1] >= border) & (uv[..., 1] <= cal.height - 1 - border))


def project_world(cal: CameraCalibration, pose7: jnp.ndarray,
                  x_world: jnp.ndarray):
    """World points through a view pose to pixels: (uv, depth)."""
    from mageslam_tpu.geometry import se3
    return project(cal, se3.pose_apply(pose7, x_world))


class LinearFocalLengthModel(NamedTuple):
    """Focal length as a linear function of lens position
    (reference Data/Data.h LinearFocalLengthModel: fx = m*lensPos + b)."""

    m: jnp.ndarray
    b: jnp.ndarray
    cx: jnp.ndarray  # principal point, normalized [0,1]
    cy: jnp.ndarray

    def calibration(self, lens_position, width, height,
                    dist=None, model=MODEL_PINHOLE) -> CameraCalibration:
        f = (self.m * lens_position + self.b) * width
        d = jnp.zeros(8, jnp.float32) if dist is None else dist
        return CameraCalibration(f, f, self.cx * width, self.cy * height,
                                 d, jnp.int32(model), width, height)
