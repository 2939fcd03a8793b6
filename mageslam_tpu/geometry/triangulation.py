"""Two-view triangulation, batched.

Equivalent of the reference's Tracking/Triangulation.* (DLT via
cv::triangulatePoints plus a fast closest-point-of-two-rays midpoint method,
Triangulation.cpp:24-60).  Both methods here are batched over N point pairs
and jit/vmap-safe; no per-point loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration, unproject


def triangulate_midpoint(pose0: jnp.ndarray, pose1: jnp.ndarray,
                         ray0: jnp.ndarray, ray1: jnp.ndarray):
    """Midpoint of closest approach of two world-frame rays.

    pose{0,1}: (7,) view poses.  ray{0,1}: (..., 3) camera-frame rays
    (unit or unnormalised).  Returns (points_world (...,3), valid (...,)).
    valid is False when rays are near-parallel.
    """
    c0 = se3.camera_center(pose0)
    c1 = se3.camera_center(pose1)
    R0t = se3.quat_conj(se3.pose_q(pose0))
    R1t = se3.quat_conj(se3.pose_q(pose1))
    d0 = se3.quat_rotate(R0t, ray0)
    d1 = se3.quat_rotate(R1t, ray1)
    d0 = d0 / jnp.maximum(jnp.linalg.norm(d0, axis=-1, keepdims=True), 1e-12)
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-12)

    b = c1 - c0
    d0d1 = jnp.sum(d0 * d1, axis=-1)
    denom = 1.0 - d0d1 * d0d1
    bd0 = jnp.sum(b * d0, axis=-1)
    bd1 = jnp.sum(b * d1, axis=-1)
    s = (bd0 - d0d1 * bd1) / jnp.maximum(denom, 1e-9)
    t = (d0d1 * bd0 - bd1) / jnp.maximum(denom, 1e-9)
    p0 = c0 + s[..., None] * d0
    p1 = c1 + t[..., None] * d1
    valid = (denom > 1e-7) & (s > 0) & (t > 0)
    return 0.5 * (p0 + p1), valid


def triangulate_dlt(pose0: jnp.ndarray, pose1: jnp.ndarray,
                    xn0: jnp.ndarray, xn1: jnp.ndarray):
    """DLT triangulation from normalized image coords (..., 2).

    Builds the standard 4x4 system from P0, P1 (3x4 view matrices) and takes
    the smallest-singular-vector; batched via jnp.linalg.svd on (..., 4, 4).
    """
    P0 = se3.pose_to_mat44(pose0)[..., :3, :]
    P1 = se3.pose_to_mat44(pose1)[..., :3, :]
    rows = jnp.stack([
        xn0[..., 0, None] * P0[..., 2, :] - P0[..., 0, :],
        xn0[..., 1, None] * P0[..., 2, :] - P0[..., 1, :],
        xn1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        xn1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
    ], axis=-2)  # (..., 4, 4)
    _, s, vt = jnp.linalg.svd(rows)
    Xh = vt[..., -1, :]
    w = Xh[..., 3]
    valid = jnp.abs(w) > 1e-9
    X = Xh[..., :3] / jnp.where(valid, w, 1.0)[..., None]
    return X, valid


def triangulate_pixels(cal0: CameraCalibration, cal1: CameraCalibration,
                       pose0, pose1, uv0, uv1, method: str = "midpoint"):
    """Triangulate pixel correspondences; returns (X_world, valid)."""
    r0 = unproject(cal0, uv0)
    r1 = unproject(cal1, uv1)
    if method == "midpoint":
        return triangulate_midpoint(pose0, pose1, r0, r1)
    return triangulate_dlt(pose0, pose1, r0[..., :2], r1[..., :2])


def parallax_cos(pose0, pose1, x_world: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the angle subtended at the point by the two camera centers.

    Used for the reference's parallax gates in map-point creation
    (Mapping/NewMapPointsCreation.h:17-105)."""
    c0 = se3.camera_center(pose0)
    c1 = se3.camera_center(pose1)
    v0 = c0 - x_world
    v1 = c1 - x_world
    n = (jnp.linalg.norm(v0, axis=-1) * jnp.linalg.norm(v1, axis=-1))
    return jnp.sum(v0 * v1, axis=-1) / jnp.maximum(n, 1e-12)
