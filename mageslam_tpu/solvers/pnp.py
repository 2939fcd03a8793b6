"""Perspective-n-Point: robust Gauss-Newton refinement + DLT-RANSAC.

TPU-native replacement for the reference's PnP paths
(Tracking/PoseEstimator.cpp:143-217 TryEstimatePoseWithPrior — project,
radius-match, then cv::solvePnPRansac at :610;  relocalization round-robin
RANSAC at :219-437).  Design changes for TPU:

  - The normal tracking path refines from a motion-model prior with a fixed
    number of damped Gauss-Newton iterations on Huber-weighted reprojection
    residuals (analytic SE(3) Jacobians), instead of an opaque OpenCV call.
  - Relocalization RANSAC is a *vmapped hypothesis batch*: H pose hypotheses
    are solved in parallel from random 6-point minimal sets via the DLT
    (SVD of a 12x12 system each), scored by masked inlier counts, and the
    winner is GN-polished — fixed shapes, no early-exit loops
    (SURVEY.md §7 "RANSAC/control flow").

All functions operate in *normalized undistorted* image coordinates; pixel
thresholds are converted by the caller via focal length.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3


def project_normalized(pose7: jnp.ndarray, x_world: jnp.ndarray):
    """World -> normalized image coords (..., 2) + depth (...,)."""
    y = se3.pose_apply(pose7, x_world)
    z = y[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return y[..., :2] / zs[..., None], z


def reprojection_residuals(pose7, points_w, xn_obs):
    xn, z = project_normalized(pose7, points_w)
    return xn - xn_obs, z


def _pose_jacobian(pose7, points_w):
    """Analytic d(residual)/d(xi) for left-multiplicative update, (N, 2, 6)."""
    y = se3.pose_apply(pose7, points_w)          # camera-frame points
    x, yy, z = y[..., 0], y[..., 1], y[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    # dpi/dy: (N, 2, 3)
    zero = jnp.zeros_like(iz)
    dpi = jnp.stack([
        jnp.stack([iz, zero, -x * iz2], -1),
        jnp.stack([zero, iz, -yy * iz2], -1),
    ], -2)
    # dy/dxi = [-hat(y) | I]: (N, 3, 6)
    hy = se3.hat(y)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), hy.shape)
    dy = jnp.concatenate([-hy, eye], -1)
    return dpi @ dy  # (N, 2, 6)


def huber_weights(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt IRLS weights for the Huber loss (reference Huber kernels in
    BundlerLib.cpp:178)."""
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(r_norm, 1e-12)))


class PnPResult(NamedTuple):
    pose: jnp.ndarray        # (7,)
    inliers: jnp.ndarray     # (N,) bool
    num_inliers: jnp.ndarray
    mean_sq_error: jnp.ndarray  # over inliers, normalized coords


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_pose(pose0: jnp.ndarray, points_w: jnp.ndarray,
                xn_obs: jnp.ndarray, valid: jnp.ndarray,
                huber_delta: jnp.ndarray,
                outlier_thresh: jnp.ndarray,
                iters: int = 8,
                damping: float = 1e-4) -> PnPResult:
    """Damped GN pose-only optimization (the reference's single-camera
    fixed-points BA, TrackLocalMap.cpp:421-505, done natively).

    huber_delta / outlier_thresh in normalized-coordinate units.
    """
    def step(pose, weight_mask):
        r, z = reprojection_residuals(pose, points_w, xn_obs)
        J = _pose_jacobian(pose, points_w)
        rn = jnp.linalg.norm(r, axis=-1)
        w = huber_weights(rn, huber_delta) * weight_mask * (z > 0)
        Jw = J * w[:, None, None]
        rw = r * w[:, None]
        H = jnp.einsum("nij,nik->jk", Jw, Jw)
        g = -jnp.einsum("nij,ni->j", Jw, rw)
        H = H + damping * jnp.eye(6, dtype=H.dtype) * (1.0 + jnp.diag(H))
        dx = jnp.linalg.solve(H, g)
        return se3.pose_retract(pose, dx)

    def inlier_set(pose):
        r, z = reprojection_residuals(pose, points_w, xn_obs)
        err = jnp.sum(r * r, -1)
        return valid & (z > 0) & (err < outlier_thresh ** 2), err

    # stage 1: robust IRLS over everything (reference OptimizeCameraPose #1,
    # TrackLocalMap.cpp:95)
    pose, _ = jax.lax.scan(lambda p, _: (step(p, valid), None), pose0,
                           None, length=iters)
    inl1, _ = inlier_set(pose)
    # stage 2: re-refine on inliers only (reference outlier unassociation
    # between the two OptimizeCameraPose calls, TrackLocalMap.cpp:270-276)
    w2 = inl1.astype(jnp.float32)
    pose, _ = jax.lax.scan(lambda p, _: (step(p, w2), None), pose,
                           None, length=max(2, iters // 2))
    inl, err = inlier_set(pose)
    n = jnp.sum(inl)
    mse = jnp.sum(jnp.where(inl, err, 0.0)) / jnp.maximum(n, 1)
    return PnPResult(pose, inl, n, mse)


def _dlt_pose(points_w: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Closed-form pose from >=6 correspondences via the projective DLT,
    with orthonormalization + cheirality fix.  points_w: (M, 3), xn: (M, 2).
    """
    X = jnp.concatenate([points_w, jnp.ones_like(points_w[..., :1])], -1)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    zeros = jnp.zeros_like(X)
    rows_u = jnp.concatenate([X, zeros, -u * X], -1)   # (M, 12)
    rows_v = jnp.concatenate([zeros, X, -v * X], -1)
    A = jnp.concatenate([rows_u, rows_v], 0)           # (2M, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    # cheirality: make depths positive for the majority of points
    depths = X @ P[2]
    P = P * jnp.where(jnp.sum(depths > 0) >= X.shape[0] / 2, 1.0, -1.0)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d) @ Vt2
    scale = jnp.mean(S) * d
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return se3.make_pose(se3.mat_to_quat(R), t)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def pnp_ransac(key: jax.Array, points_w: jnp.ndarray, xn_obs: jnp.ndarray,
               valid: jnp.ndarray,
               inlier_thresh: jnp.ndarray,
               huber_delta: jnp.ndarray,
               num_hypotheses: int = 64,
               refine_iters: int = 8,
               quality: jnp.ndarray | None = None,
               init_pose: jnp.ndarray | None = None) -> PnPResult:
    """Vmapped RANSAC PnP (relocalization;  reference round-robin PNPRansac,
    PoseEstimator.cpp:219-437,610).  Fixed hypothesis budget, masked scoring.

    quality (N,) optionally biases minimal-set sampling toward
    higher-confidence correspondences (PROSAC-style): with w% true matches
    uniformly sampled, a 6-point DLT set is all-inlier with probability w^6
    — quality weighting raises the effective w, which is what makes
    wide-baseline relocalization viable at ~50% match precision.

    init_pose (7,) optionally adds minimal-4 hypotheses: 4 sampled
    correspondences refined by GN *from init_pose* (half the budget; the
    other half stays 6-point DLT).  This is the TPU substitute for a P3P
    minimal solver — relocalization always has the candidate keyframe's
    pose as a basin-of-attraction initializer, and a 4-point set is
    all-inlier at w^4 instead of w^6, which is decisive at the ~40% match
    precision of wide-baseline recovery.
    """
    n = points_w.shape[0]
    p = valid.astype(jnp.float32)
    if quality is not None:
        p = p * quality
    p = p / jnp.maximum(jnp.sum(p), 1e-9)
    thresh_sq = inlier_thresh ** 2

    def score_pose(pose):
        r, z = reprojection_residuals(pose, points_w, xn_obs)
        err = jnp.sum(r * r, -1)
        inl = valid & (z > 0) & (err < thresh_sq)
        finite = jnp.all(jnp.isfinite(pose))
        return jnp.where(finite, jnp.sum(inl), -1), inl

    def hypothesis_dlt(k):
        idx = jax.random.choice(k, n, shape=(6,), replace=False, p=p)
        pose = _dlt_pose(points_w[idx], xn_obs[idx])
        s, _ = score_pose(pose)
        return pose, s

    if init_pose is None:
        keys = jax.random.split(key, num_hypotheses)
        poses, scores = jax.vmap(hypothesis_dlt)(keys)
    else:
        def hypothesis_gn(k):
            idx = jax.random.choice(k, n, shape=(4,), replace=False, p=p)
            mask = jnp.zeros(n, bool).at[idx].set(True) & valid
            r = refine_pose(init_pose, points_w, xn_obs, mask,
                            huber_delta, inlier_thresh, iters=10)
            s, _ = score_pose(r.pose)
            return r.pose, s

        k1, k2 = jax.random.split(key)
        keys1 = jax.random.split(k1, num_hypotheses // 2)
        keys2 = jax.random.split(k2, num_hypotheses - num_hypotheses // 2)
        poses_a, scores_a = jax.vmap(hypothesis_gn)(keys1)
        poses_b, scores_b = jax.vmap(hypothesis_dlt)(keys2)
        poses = jnp.concatenate([poses_a, poses_b])
        scores = jnp.concatenate([scores_a, scores_b])
    best = jnp.argmax(scores)
    pose_best = poses[best]
    # polish on the WINNING hypothesis's inlier set — refining over all
    # correspondences diverges at >50% outlier rates (robust IRLS is not a
    # consensus estimator), which silently broke wide-baseline recovery
    _, inl_best = score_pose(pose_best)
    res = refine_pose(pose_best, points_w, xn_obs, inl_best,
                      huber_delta, inlier_thresh, iters=refine_iters)
    # final inlier verdict over ALL valid correspondences
    r, z = reprojection_residuals(res.pose, points_w, xn_obs)
    err = jnp.sum(r * r, -1)
    inl = valid & (z > 0) & (err < thresh_sq)
    ninl = jnp.sum(inl)
    mse = jnp.sum(jnp.where(inl, err, 0.0)) / jnp.maximum(ninl, 1)
    return PnPResult(res.pose, inl, ninl, mse)
