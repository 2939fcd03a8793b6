"""Solver tests: PnP refinement/RANSAC, essential RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.solvers import pnp, essential


def make_scene(rng, n=100, depth=(2.0, 8.0)):
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(*depth, n)], -1).astype(np.float32)
    return jnp.asarray(pts)


def gt_pose():
    return se3.make_pose(se3.so3_exp(jnp.array([0.03, -0.06, 0.02])),
                         jnp.array([0.1, -0.2, 0.15]))


class TestRefinePose:
    def test_converges_from_perturbed_prior(self, rng):
        pts = make_scene(rng)
        pose_gt = gt_pose()
        xn, _ = pnp.project_normalized(pose_gt, pts)
        prior = se3.pose_retract(pose_gt,
                                 jnp.array([0.02, -0.01, 0.015,
                                            0.05, -0.04, 0.03]))
        res = pnp.refine_pose(prior, pts, xn, jnp.ones(pts.shape[0], bool),
                              huber_delta=jnp.float32(0.01),
                              outlier_thresh=jnp.float32(0.01))
        assert int(res.num_inliers) == pts.shape[0]
        err = np.asarray(se3.pose_log(
            se3.pose_compose(res.pose, se3.pose_inverse(pose_gt))))
        assert np.linalg.norm(err) < 1e-3

    def test_robust_to_outliers(self, rng):
        pts = make_scene(rng, 120)
        pose_gt = gt_pose()
        xn, _ = pnp.project_normalized(pose_gt, pts)
        xn = np.array(xn)
        xn[:30] += rng.uniform(0.05, 0.2, size=(30, 2)) * np.sign(
            rng.normal(size=(30, 2)))  # 25% outliers
        prior = se3.pose_retract(pose_gt,
                                 jnp.array([0.01, 0.01, -0.01,
                                            0.03, 0.02, -0.02]))
        res = pnp.refine_pose(prior, pts, jnp.asarray(xn),
                              jnp.ones(120, bool),
                              huber_delta=jnp.float32(0.005),
                              outlier_thresh=jnp.float32(0.01))
        err = np.asarray(se3.pose_log(
            se3.pose_compose(res.pose, se3.pose_inverse(pose_gt))))
        assert np.linalg.norm(err) < 5e-3
        # outliers excluded from the inlier set
        assert int(res.num_inliers) >= 85
        assert not np.any(np.asarray(res.inliers[:30]))

    def test_respects_valid_mask(self, rng):
        pts = make_scene(rng, 50)
        pose_gt = gt_pose()
        xn, _ = pnp.project_normalized(pose_gt, pts)
        xn = np.array(xn)
        xn[:25] = 10.0  # garbage, but masked out
        valid = jnp.arange(50) >= 25
        res = pnp.refine_pose(pose_gt, pts, jnp.asarray(xn), valid,
                              jnp.float32(0.01), jnp.float32(0.01))
        err = np.asarray(se3.pose_log(
            se3.pose_compose(res.pose, se3.pose_inverse(pose_gt))))
        assert np.linalg.norm(err) < 1e-3


class TestPnPRansac:
    def test_recovers_pose_no_prior(self, rng):
        pts = make_scene(rng, 80)
        pose_gt = gt_pose()
        xn, _ = pnp.project_normalized(pose_gt, pts)
        res = pnp.pnp_ransac(jax.random.key(0), pts, xn,
                             jnp.ones(80, bool),
                             inlier_thresh=jnp.float32(0.01),
                             huber_delta=jnp.float32(0.005))
        assert int(res.num_inliers) >= 75
        err = np.asarray(se3.pose_log(
            se3.pose_compose(res.pose, se3.pose_inverse(pose_gt))))
        assert np.linalg.norm(err) < 2e-3

    def test_with_outliers(self, rng):
        pts = make_scene(rng, 100)
        pose_gt = gt_pose()
        xn, _ = pnp.project_normalized(pose_gt, pts)
        xn = np.array(xn)
        bad = rng.choice(100, 35, replace=False)
        xn[bad] = rng.uniform(-0.5, 0.5, size=(35, 2))
        res = pnp.pnp_ransac(jax.random.key(3), pts, jnp.asarray(xn),
                             jnp.ones(100, bool),
                             inlier_thresh=jnp.float32(0.008),
                             huber_delta=jnp.float32(0.004))
        err = np.asarray(se3.pose_log(
            se3.pose_compose(res.pose, se3.pose_inverse(pose_gt))))
        assert np.linalg.norm(err) < 5e-3
        assert int(res.num_inliers) >= 55


class TestEssentialRansac:
    def _correspondences(self, rng, n=200, outlier_frac=0.0):
        pts = make_scene(rng, n, depth=(3.0, 9.0))
        pose0 = se3.pose_identity()
        t = jnp.array([0.8, 0.1, 0.05])
        t = t / jnp.linalg.norm(t)
        rel = se3.make_pose(se3.so3_exp(jnp.array([0.02, 0.08, -0.03])), t)
        xn0, _ = pnp.project_normalized(pose0, pts)
        xn1, _ = pnp.project_normalized(rel, pts)
        xn1 = np.array(xn1)
        n_out = int(n * outlier_frac)
        if n_out:
            bad = rng.choice(n, n_out, replace=False)
            xn1[bad] += rng.uniform(0.03, 0.3, (n_out, 2)) * np.sign(
                rng.normal(size=(n_out, 2)))
        return xn0, jnp.asarray(xn1), rel, pts

    def test_clean_correspondences(self, rng):
        xn0, xn1, rel_gt, _ = self._correspondences(rng)
        res = essential.essential_ransac(
            jax.random.key(1), xn0, xn1, jnp.ones(xn0.shape[0], bool),
            inlier_thresh=jnp.float32(0.005))
        assert int(res.num_inliers) >= 190
        # translation direction + rotation match
        t_est = np.asarray(se3.pose_t(res.rel_pose))
        t_gt = np.asarray(se3.pose_t(rel_gt))
        cos = abs(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt)))
        assert cos > 0.999
        dq = np.asarray(se3.so3_log(se3.quat_mul(
            se3.pose_q(res.rel_pose), se3.quat_conj(se3.pose_q(rel_gt)))))
        assert np.linalg.norm(dq) < 5e-3

    def test_with_outliers(self, rng):
        xn0, xn1, rel_gt, _ = self._correspondences(rng, outlier_frac=0.3)
        res = essential.essential_ransac(
            jax.random.key(2), xn0, xn1, jnp.ones(xn0.shape[0], bool),
            inlier_thresh=jnp.float32(0.005))
        t_est = np.asarray(se3.pose_t(res.rel_pose))
        t_gt = np.asarray(se3.pose_t(rel_gt))
        cos = abs(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt)))
        assert cos > 0.995
        assert int(res.num_inliers) >= 120

    def test_cheirality_sign(self, rng):
        # recovered pose must put triangulated points in front of BOTH views
        xn0, xn1, rel_gt, pts = self._correspondences(rng)
        res = essential.essential_ransac(
            jax.random.key(4), xn0, xn1, jnp.ones(xn0.shape[0], bool),
            inlier_thresh=jnp.float32(0.005))
        z1 = np.asarray(se3.pose_apply(res.rel_pose, np.asarray(
            pts / np.linalg.norm(np.asarray(se3.pose_t(rel_gt))))))[:, 2]
        assert (z1 > 0).mean() > 0.95


class TestPnPRansacWideBaseline:
    """The r3 relocalization machinery: PROSAC quality weighting and
    pose-seeded minimal-4 GN hypotheses must solve correspondence sets
    that defeat plain 6-point DLT RANSAC (~40% inliers, 64 budget)."""

    def _problem(self, inlier_frac=0.4, n=80, seed=0):
        import numpy as np
        import jax.numpy as jnp
        from mageslam_tpu.geometry import se3
        rng = np.random.default_rng(seed)
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(4, 9, n)], -1).astype(np.float32)
        pose_gt = se3.make_pose(
            se3.so3_exp(jnp.asarray([0.05, -0.3, 0.02])),
            jnp.asarray([0.4, -0.1, 0.3]))
        y = np.asarray(se3.pose_apply(pose_gt[None], jnp.asarray(pts)))
        xn = (y[:, :2] / y[:, 2:3]).astype(np.float32)
        xn += rng.normal(0, 1.4 / 272.0, xn.shape).astype(np.float32)
        n_out = int(n * (1 - inlier_frac))
        out_idx = rng.choice(n, n_out, replace=False)
        xn[out_idx] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
        # true matches have lower Hamming "distance"
        dist = np.full(n, 25.0, np.float32)
        dist[out_idx] = 45.0
        inlier_mask = np.ones(n, bool)
        inlier_mask[out_idx] = False
        return (jnp.asarray(pts), jnp.asarray(xn), jnp.asarray(dist),
                pose_gt, inlier_mask)

    def test_quality_and_init_pose_recover(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.solvers import pnp
        pts, xn, dist, pose_gt, inl = self._problem()
        # init pose: a keyframe-like pose in the basin (offset from gt)
        init = se3.pose_compose(
            se3.make_pose(se3.so3_exp(jnp.asarray([0.0, 0.15, 0.0])),
                          jnp.asarray([0.3, 0.0, -0.2])), pose_gt)
        quality = jnp.exp(-dist / 12.0)
        res = pnp.pnp_ransac(
            jax.random.key(3), pts, xn, jnp.ones(pts.shape[0], bool),
            inlier_thresh=jnp.float32(8.0 / 272.0),
            huber_delta=jnp.float32(4.0 / 272.0),
            num_hypotheses=256, quality=quality, init_pose=init)
        assert int(res.num_inliers) >= int(0.85 * inl.sum())
        c_err = float(jnp.linalg.norm(
            se3.camera_center(res.pose) - se3.camera_center(pose_gt)))
        assert c_err < 0.05, c_err
        # the found inliers are (mostly) the true ones
        found = np.asarray(res.inliers)
        precision = (found & inl).sum() / max(found.sum(), 1)
        assert precision > 0.9, precision

    def test_polish_ignores_outlier_majority(self):
        """The winner's consensus-only polish must not be dragged by a
        60 percent outlier fraction (regression for the refine-over-all
        divergence that silently broke wide-baseline recovery)."""
        import jax
        import jax.numpy as jnp
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.solvers import pnp
        pts, xn, dist, pose_gt, inl = self._problem(inlier_frac=0.4,
                                                    seed=5)
        quality = jnp.exp(-dist / 12.0)
        init = pose_gt  # perfect seed: failure means the polish diverges
        res = pnp.pnp_ransac(
            jax.random.key(11), pts, xn, jnp.ones(pts.shape[0], bool),
            inlier_thresh=jnp.float32(8.0 / 272.0),
            huber_delta=jnp.float32(4.0 / 272.0),
            num_hypotheses=128, quality=quality, init_pose=init)
        c_err = float(jnp.linalg.norm(
            se3.camera_center(res.pose) - se3.camera_center(pose_gt)))
        assert c_err < 0.05, c_err
