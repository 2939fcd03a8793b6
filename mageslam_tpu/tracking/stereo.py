"""Stereo map initialization from a calibrated pair.

Equivalent of the reference's Stereo/StereoMapInit.* (StereoMapInit.h:23-28:
match the pair, triangulate with the known extrinsics, tether the two
keyframes with an EXTRINSIC constraint) and the
StereoInitializationWorker driving it.  Metric scale is free (the baseline
is known), unlike the monocular bootstrap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import StereoMapInitializationSettings
from mageslam_tpu.geometry import epipolar, se3, triangulation
from mageslam_tpu.ops import matching
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, TETHER_EXTRINSIC,
                                                bundle_adjust)
from mageslam_tpu.tracking.frontend import FrameFeatures


class StereoInitResult(NamedTuple):
    success: jnp.ndarray
    points: jnp.ndarray        # (F, 3) world (= camera-1) frame
    point_valid: jnp.ndarray   # (F,)
    match_idx: jnp.ndarray     # (F,) feature in frame2 or -1
    num_points: jnp.ndarray
    mean_sq_error: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("settings", "fx"))
def stereo_initialize(f1: FrameFeatures, f2: FrameFeatures,
                      extrinsics: jnp.ndarray,
                      settings: StereoMapInitializationSettings,
                      fx: float) -> StereoInitResult:
    """Bootstrap a metric map from one stereo pair.

    extrinsics: (7,) pose taking camera-1 coords to camera-2 coords
    (x2 = R x1 + t), i.e. the rig calibration.
    """
    s = settings
    px = 1.0 / fx
    F = f1.valid.shape[0]

    idx, dist = matching.match(
        f1.desc, f2.desc, f1.valid, f2.valid,
        max_distance=s.matcher.max_hamming_distance,
        min_difference=s.matcher.min_hamming_difference)
    matched = idx >= 0
    n_matches = jnp.sum(matched)

    xn1 = f1.xn_undist
    xn2 = f2.xn_undist[jnp.clip(idx, 0)]

    # epipolar gate against the KNOWN essential matrix
    E = epipolar.essential_from_pose(extrinsics)
    epi = epipolar.symmetric_epipolar_distance_sq(E, xn1, xn2)
    epi_ok = epi < (s.max_epipolar_error * px) ** 2

    pose1 = se3.pose_identity()
    r1 = jnp.concatenate([xn1, jnp.ones((F, 1))], -1)
    r2 = jnp.concatenate([xn2, jnp.ones((F, 1))], -1)
    X, tri_ok = triangulation.triangulate_midpoint(pose1, extrinsics,
                                                  r1, r2)
    z1 = X[:, 2]
    z2 = se3.pose_apply(extrinsics, X)[:, 2]
    depth_ok = (z1 > 0) & (z2 > 0) & (z1 < s.max_depth_meters)
    baseline = jnp.linalg.norm(se3.pose_t(extrinsics))
    ratio_ok = (jnp.linalg.norm(X, axis=-1) / jnp.maximum(baseline, 1e-9)) \
        > s.min_accepted_distance_ratio
    pt_ok = matched & epi_ok & tri_ok & depth_ok & ratio_ok

    # BA with the extrinsic tether (InitializationTetherStrength)
    obs_xn = jnp.stack([xn1, xn2], 1)
    problem = BAProblem(
        kf_poses=jnp.stack([pose1, extrinsics]),
        kf_fixed=jnp.array([True, False]),
        points=X, point_valid=pt_ok,
        obs_kf=jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None],
                                (F, 2)),
        obs_xn=obs_xn,
        obs_valid=jnp.stack([pt_ok, pt_ok], 1),
        tether_i=jnp.array([1], jnp.int32),
        tether_j=jnp.array([0], jnp.int32),
        tether_type=jnp.array([TETHER_EXTRINSIC], jnp.int32),
        tether_pose=extrinsics[None],
        tether_dist=jnp.zeros(1, jnp.float32),
        tether_weight=jnp.array([s.initialization_tether_strength],
                                jnp.float32),
    )
    bares = bundle_adjust(
        problem,
        huber_delta=jnp.float32(s.bundle_adjust.huber_width * px),
        max_outlier_error=jnp.float32(s.max_outlier_error * px),
        num_steps=int(s.bundle_adjust.num_steps) * 4 + 4)
    pt_ok &= ~(bares.outliers[:, 0] | bares.outliers[:, 1])
    n_points = jnp.sum(pt_ok)

    success = (n_matches >= s.min_feature_matches) \
        & (n_points >= s.min_init_map_points)
    return StereoInitResult(
        success=success, points=bares.points, point_valid=pt_ok,
        match_idx=jnp.where(pt_ok, idx, -1),
        num_points=n_points, mean_sq_error=bares.mean_sq_error)
