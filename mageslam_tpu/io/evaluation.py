"""Trajectory evaluation: Sim3-aligned ATE / RPE.

The reference publishes no accuracy numbers (BASELINE.md); this is the
standard monocular evaluator (Sim3 alignment because monocular scale is
free) used to produce ours: ATE RMSE after Umeyama alignment of estimated
camera centers to ground truth.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.geometry import se3, sim3


def camera_centers(view_poses: np.ndarray) -> np.ndarray:
    return np.asarray(se3.camera_center(jnp.asarray(view_poses)))


def ate_rmse(est_view_poses: np.ndarray, gt_view_poses: np.ndarray,
             with_scale: bool = True):
    """Sim3-aligned absolute trajectory error.

    Returns (rmse, aligned_est_centers, gt_centers)."""
    est_c = camera_centers(est_view_poses)
    gt_c = camera_centers(gt_view_poses)
    g = sim3.umeyama_alignment(jnp.asarray(est_c), jnp.asarray(gt_c),
                               with_scale=with_scale)
    aligned = np.asarray(sim3.sim3_apply(g, jnp.asarray(est_c)))
    err = np.linalg.norm(aligned - gt_c, axis=-1)
    return float(np.sqrt(np.mean(err ** 2))), aligned, gt_c


def rpe_stats(est_view_poses: np.ndarray, gt_view_poses: np.ndarray,
              delta: int = 1):
    """Relative pose error over frame gaps of `delta` (translation m,
    rotation rad) — scale-aligned first."""
    est_c = camera_centers(est_view_poses)
    gt_c = camera_centers(gt_view_poses)
    g = sim3.umeyama_alignment(jnp.asarray(est_c), jnp.asarray(gt_c))
    s = float(sim3.sim3_s(g)[0])

    t_errs, r_errs = [], []
    for i in range(len(est_view_poses) - delta):
        e_rel = se3.pose_compose(
            jnp.asarray(est_view_poses[i + delta]),
            se3.pose_inverse(jnp.asarray(est_view_poses[i])))
        g_rel = se3.pose_compose(
            jnp.asarray(gt_view_poses[i + delta]),
            se3.pose_inverse(jnp.asarray(gt_view_poses[i])))
        dt = np.linalg.norm(s * np.asarray(se3.pose_t(e_rel))
                            - np.asarray(se3.pose_t(g_rel)))
        dr = np.linalg.norm(np.asarray(se3.so3_log(se3.quat_mul(
            se3.pose_q(e_rel), se3.quat_conj(se3.pose_q(g_rel))))))
        t_errs.append(dt)
        r_errs.append(dr)
    return float(np.sqrt(np.mean(np.square(t_errs)))), \
        float(np.sqrt(np.mean(np.square(r_errs))))
