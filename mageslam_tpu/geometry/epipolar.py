"""Epipolar geometry: essential/fundamental matrices and distances.

Equivalent of the reference's Utils/Epipolar.* (epipolar line distance tests)
and the essential-matrix plumbing in Tracking/MapInitialization.*.  All
batched; the RANSAC solver itself lives in solvers/essential.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from mageslam_tpu.geometry import se3


def essential_from_pose(rel_pose: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R for the relative view transform x1 = R x0 + t.

    rel_pose: (7,) pose taking camera-0 frame into camera-1 frame
    (rel = pose1 * pose0^-1)."""
    R = se3.quat_to_mat(se3.pose_q(rel_pose))
    t = se3.pose_t(rel_pose)
    return se3.hat(t) @ R


def sampson_distance_sq(E: jnp.ndarray, xn0: jnp.ndarray,
                        xn1: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) squared distance in normalized coords.

    xn0, xn1: (..., 2) normalized image points; E: (..., 3, 3).
    """
    x0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], axis=-1)
    x1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("...ij,...j->...i", E, x0)
    Etx1 = jnp.einsum("...ji,...j->...i", E, x1)
    x1Ex0 = jnp.sum(x1 * Ex0, axis=-1)
    denom = (Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2
             + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2)
    return x1Ex0 ** 2 / jnp.maximum(denom, 1e-12)


def symmetric_epipolar_distance_sq(E: jnp.ndarray, xn0: jnp.ndarray,
                                   xn1: jnp.ndarray) -> jnp.ndarray:
    """Symmetric point-to-epipolar-line squared distance (the reference's
    symmetric-transfer-error scoring, MapInitialization.cpp:279+)."""
    x0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], axis=-1)
    x1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("...ij,...j->...i", E, x0)
    Etx1 = jnp.einsum("...ji,...j->...i", E, x1)
    x1Ex0 = jnp.sum(x1 * Ex0, axis=-1)
    d1 = x1Ex0 ** 2 / jnp.maximum(Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2, 1e-12)
    d0 = x1Ex0 ** 2 / jnp.maximum(Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2, 1e-12)
    return d0 + d1


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate relative poses (R, t), batched over leading dims.

    Returns rel_poses: (..., 4, 7) view transforms x1 = R x0 + t with |t|=1.
    Caller disambiguates by cheirality (solvers/essential.py).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(Vt)
    U = U * jnp.where(dU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(dV < 0, -1.0, 1.0)[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

    def mk(R, tt):
        return se3.make_pose(se3.mat_to_quat(R), tt)

    cands = jnp.stack([mk(R1, t), mk(R1, -t), mk(R2, t), mk(R2, -t)],
                      axis=-2)
    return cands


def epipolar_line_distance_px(F: jnp.ndarray, uv0: jnp.ndarray,
                              uv1: jnp.ndarray) -> jnp.ndarray:
    """Pixel distance of uv1 to the epipolar line F @ uv0 (reference
    Utils/Epipolar.* line-distance test)."""
    x0 = jnp.concatenate([uv0, jnp.ones_like(uv0[..., :1])], axis=-1)
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    l = jnp.einsum("...ij,...j->...i", F, x0)
    num = jnp.abs(jnp.sum(x1 * l, axis=-1))
    den = jnp.sqrt(jnp.maximum(l[..., 0] ** 2 + l[..., 1] ** 2, 1e-12))
    return num / den


def fundamental_from_essential(E: jnp.ndarray, K0: jnp.ndarray,
                               K1: jnp.ndarray) -> jnp.ndarray:
    """F = K1^-T E K0^-1."""
    K0i = jnp.linalg.inv(K0)
    K1i = jnp.linalg.inv(K1)
    return K1i.swapaxes(-1, -2) @ E @ K0i
