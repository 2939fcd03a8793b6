"""Measure bootstrap success vs inlier ratio / match count (VERDICT r3 #8).

Synthesizes two-view feature sets with an exact designed match count and
inlier ratio (outlier matches get random second-view positions), runs
attempt_initialization at REFERENCE gates, and reports solver-level pose
correctness + pipeline acceptance over trials.

Usage: python tools/debug_init_stress.py [n_trials]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_pair(rng, n_matches, ratio, F=512, n_extra=60):
    """Returns (f0, f1, R, t_dir): designed correspondences.
    Inliers project a general 3D scene in both views; outliers get random
    positions in view 1.  Descriptor pairs are identical (distance 0)."""
    import jax.numpy as jnp
    from mageslam_tpu.geometry import se3
    from mageslam_tpu.solvers import pnp
    from mageslam_tpu.tracking.frontend import FrameFeatures

    n_inl = int(round(n_matches * ratio))
    pts = np.stack([rng.uniform(-2.5, 2.5, n_matches),
                    rng.uniform(-1.8, 1.8, n_matches),
                    rng.uniform(3.5, 9.0, n_matches)], -1).astype(np.float32)
    rotv = rng.normal(0, 0.02, 3).astype(np.float32) \
        + np.array([0, 0.04, 0], np.float32)
    t = np.array([0.35, 0.02, 0.0], np.float32) \
        + rng.normal(0, 0.02, 3).astype(np.float32)
    pose1 = se3.make_pose(se3.so3_exp(jnp.asarray(rotv)), jnp.asarray(t))
    xn0 = np.asarray(pts[:, :2] / pts[:, 2:3])
    xn1_true, _ = pnp.project_normalized(pose1, jnp.asarray(pts))
    xn1 = np.asarray(xn1_true).copy()
    # outliers: wrong positions in view 1 (uniform over the image)
    xn1[n_inl:] = np.stack([rng.uniform(-0.55, 0.55, n_matches - n_inl),
                            rng.uniform(-0.32, 0.32, n_matches - n_inl)],
                           -1)
    noise = 0.5 / 272.0   # 0.5 px localization noise
    xn0 = xn0 + rng.normal(0, noise, xn0.shape)
    xn1 = xn1 + rng.normal(0, noise, xn1.shape)

    # descriptors: identical per pair, random otherwise
    desc = rng.integers(0, 2**32, (F, 8), dtype=np.uint32)

    def feats(xn, n_used):
        uv = xn * 272.0 + np.array([160.0, 90.0])
        pad = F - n_used
        return FrameFeatures(
            uv=jnp.asarray(np.concatenate(
                [uv, np.zeros((pad, 2))]).astype(np.float32)),
            xn_undist=jnp.asarray(np.concatenate(
                [xn, np.zeros((pad, 2))]).astype(np.float32)),
            response=jnp.ones(F), angle=jnp.zeros(F),
            octave=jnp.zeros(F, jnp.int32), desc=jnp.asarray(desc),
            valid=jnp.arange(F) < n_used)

    return feats(xn0, n_matches), feats(xn1, n_matches), pose1, n_inl


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    import jax.numpy as jnp
    from mageslam_tpu.config import MageSlamSettings
    from mageslam_tpu.geometry import se3
    from mageslam_tpu.tracking import initialization

    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    s = MageSlamSettings().mono.map_init   # REFERENCE gates, untouched
    rng = np.random.default_rng(0)

    for n_matches, ratio in [(110, 0.30), (110, 0.35), (110, 0.40),
                             (110, 0.50), (110, 0.60),
                             (65, 0.35), (65, 0.5), (65, 0.6),
                             (150, 0.5)]:
        pose_ok = accept = 0
        for trial in range(n_trials):
            f0, f1, pose1_gt, n_inl = make_pair(rng, n_matches, ratio)
            key = jax.random.key(trial)
            res = initialization.attempt_initialization(key, f0, f1, s,
                                                        272.0)
            # solver-level: translation DIRECTION + rotation correct?
            t_est = np.asarray(se3.camera_center(res.pose1))
            t_gt = np.asarray(se3.camera_center(pose1_gt))
            cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est)
                                         * np.linalg.norm(t_gt) + 1e-12)
            dr = np.asarray(se3.pose_log(se3.pose_compose(
                res.pose1, se3.pose_inverse(
                    se3.make_pose(pose1_gt[:4],
                                  pose1_gt[4:] / np.linalg.norm(
                                      np.asarray(pose1_gt[4:])))))))
            rot_err = np.linalg.norm(dr[:3])
            if cos > 0.95 and rot_err < 0.08:
                pose_ok += 1
            if bool(res.success):
                accept += 1
        print(f"matches={n_matches} ratio={ratio}: pose_ok="
              f"{pose_ok}/{n_trials} accepted={accept}/{n_trials}",
              flush=True)


if __name__ == "__main__":
    main()
