"""Monocular map initialization: two-view bootstrap.

Equivalent of the reference's MapInitialization
(Tracking/MapInitialization.cpp:490-690: frame-pair time gating, octave-0
matching, essential RANSAC with pixel-spread rejection + symmetric-transfer
scoring, pose disambiguation by cheirality, triangulation with epipolar /
parallax gates, multi-step init BA with outlier culling, validation).

The candidate-pair time gating and retry-until-success control flow live in
the host runtime (runtime/slam.py); this module is the jitted geometry:
``attempt_initialization`` runs match -> E-RANSAC -> triangulate -> gates ->
init-BA in one compiled program and returns fixed-shape results + a success
flag the host reads back.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import MonoMapInitializationSettings
from mageslam_tpu.geometry import se3, triangulation
from mageslam_tpu.ops import matching
from mageslam_tpu.solvers import essential, homography
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, bundle_adjust,
                                                empty_tethers)
from mageslam_tpu.tracking.frontend import FrameFeatures


class InitResult(NamedTuple):
    success: jnp.ndarray        # bool
    pose1: jnp.ndarray          # (7,) second-view pose (first = identity)
    points: jnp.ndarray         # (F,) -> (F, 3) one candidate point per
    point_valid: jnp.ndarray    # (F,) bool     feature of frame0
    match_idx: jnp.ndarray      # (F,) int32 feature index in frame1 or -1
    num_points: jnp.ndarray
    num_matches: jnp.ndarray
    mean_sq_error: jnp.ndarray
    used_homography: jnp.ndarray  # bool — planar (H) model won the vote


@functools.partial(jax.jit, static_argnames=("settings", "fx"))
def attempt_initialization(key: jax.Array, f0: FrameFeatures,
                           f1: FrameFeatures,
                           settings: MonoMapInitializationSettings,
                           fx: float) -> InitResult:
    """Try to bootstrap a map from a frame pair.  fx converts the settings'
    pixel thresholds to normalized units (static for jit caching)."""
    F = f0.valid.shape[0]
    s = settings
    px = 1.0 / fx

    # --- octave-0 matching (MapInitialization.cpp:567-594)
    oct0_a = f0.valid & (f0.octave == 0)
    oct0_b = f1.valid & (f1.octave == 0)
    idx, dist = matching.match(
        f0.desc, f1.desc, oct0_a, oct0_b,
        max_distance=s.five_point_matching.max_hamming_distance,
        min_difference=s.five_point_matching.min_hamming_difference)
    matched = idx >= 0
    n_matches = jnp.sum(matched)

    xn0 = f0.xn_undist
    xn1 = f1.xn_undist[jnp.clip(idx, 0)]

    # --- dual-model RANSAC (FindPossiblePoses): 8-point essential AND
    # 4-point homography, scored against each other.  The reference grafts
    # the Nistér 5-point solver for exactly the configurations where the
    # 8-point F/E degenerates — planar scenes and low parallax
    # (ComputeEssential.cpp:1-10, MageSettings.h:110
    # RansacIterationsForModels "homography and fundamental model").
    # TPU-first equivalent: pick the model whose truncated symmetric
    # transfer score explains the matches (ORB-SLAM's R_H heuristic) and
    # reconstruct from it — H via Faugeras decomposition, E via cheirality.
    kE, kH = jax.random.split(key)
    weight = jnp.exp(-dist.astype(jnp.float32) / 12.0)
    eres = essential.essential_ransac(
        kE, xn0, xn1, matched,
        inlier_thresh=jnp.float32(s.fundamental_transfer_error_threshold
                                  * px),
        min_pixel_spread=jnp.float32(s.min_pixel_spread * px),
        num_hypotheses=1024,
        sample_weight=weight)
    hres = homography.homography_ransac(
        kH, xn0, xn1, matched,
        inlier_thresh=jnp.float32(s.fundamental_transfer_error_threshold
                                  * px),
        min_pixel_spread=jnp.float32(s.min_pixel_spread * px),
        num_hypotheses=512,
        sample_weight=weight)
    r_h = hres.score / jnp.maximum(hres.score + eres.score, 1e-12)
    use_h = r_h > s.homography_model_ratio
    pose_h = homography.recover_pose_from_h(hres.H, xn0, xn1, hres.inliers)
    pose1 = jnp.where(use_h, pose_h, eres.rel_pose)
    inl = jnp.where(use_h, hres.inliers, eres.inliers)
    model_inliers = jnp.where(use_h, hres.num_inliers, eres.num_inliers)

    # --- triangulate inliers (TriangulatePoints + gates)
    r0 = jnp.concatenate([xn0, jnp.ones((F, 1))], -1)
    r1 = jnp.concatenate([xn1, jnp.ones((F, 1))], -1)
    pose0 = se3.pose_identity()
    X, tri_ok = triangulation.triangulate_midpoint(pose0, pose1, r0, r1)
    z0 = X[:, 2]
    z1 = se3.pose_apply(pose1, X)[:, 2]
    # reprojection gate in both views (MaxEpipolarError)
    pr0 = X[:, :2] / jnp.where(jnp.abs(z0) < 1e-9, 1e-9, z0)[:, None]
    y1 = se3.pose_apply(pose1, X)
    pr1 = y1[:, :2] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)[:, None]
    reproj_ok = (jnp.sum((pr0 - xn0) ** 2, -1)
                 < (s.max_epipolar_error * px) ** 2) \
        & (jnp.sum((pr1 - xn1) ** 2, -1) < (s.max_epipolar_error * px) ** 2)
    dist_ok = (jnp.linalg.norm(X, axis=-1) < s.max_parallax_3d_distance)
    pt_ok = inl & tri_ok & (z0 > 0) & (z1 > 0) & reproj_ok & dist_ok

    # median-depth gate (MaxParallax3dMedianDistance; baseline |t|=1 units)
    depths = jnp.where(pt_ok, z0, jnp.nan)
    med = jnp.nanmedian(depths)
    med_ok = jnp.isfinite(med) & (med < s.max_parallax_3d_median_distance)

    # --- init BA: both views, first fixed; landmark-major table with M=2
    obs_xn = jnp.stack([xn0, xn1], axis=1)            # (F, 2, 2)
    obs_kf = jnp.broadcast_to(
        jnp.arange(2, dtype=jnp.int32)[None, :], (F, 2))
    problem = BAProblem(
        kf_poses=jnp.stack([pose0, pose1]),
        kf_fixed=jnp.array([True, False]),
        points=X,
        point_valid=pt_ok,
        obs_kf=obs_kf,
        obs_xn=obs_xn,
        obs_valid=jnp.stack([pt_ok, pt_ok], 1),
        **empty_tethers(0))
    bares = bundle_adjust(
        problem,
        huber_delta=jnp.float32(s.final_ba_huber_width * px),
        max_outlier_error=jnp.float32(s.final_ba_max_outlier_error * px),
        num_steps=s.final_ba_num_steps)
    pose1_ba = bares.kf_poses[1]
    X_ba = bares.points
    pt_ok &= ~(bares.outliers[:, 0] | bares.outliers[:, 1])

    # pose-change sanity (AmountBACanChangePose)
    dpose = se3.pose_log(se3.pose_compose(pose1_ba, se3.pose_inverse(pose1)))
    pose_ok = jnp.linalg.norm(dpose) < s.amount_ba_can_change_pose

    n_points = jnp.sum(pt_ok)
    success = ((n_matches >= s.min_feature_matches)
               & (model_inliers >= s.min_scoring_inliers)
               & (model_inliers
                  >= s.min_inlier_percentage * jnp.maximum(n_matches, 1))
               & med_ok
               & (n_points >= s.min_initial_map_points)
               & pose_ok)

    return InitResult(
        success=success,
        pose1=pose1_ba,
        points=X_ba,
        point_valid=pt_ok,
        match_idx=jnp.where(pt_ok, idx, -1),
        num_points=n_points,
        num_matches=n_matches,
        mean_sq_error=bares.mean_sq_error,
        used_homography=use_h,
    )
