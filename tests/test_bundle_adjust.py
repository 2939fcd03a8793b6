"""Bundle adjustment solver tests on synthetic multi-view problems."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.solvers import pnp
from mageslam_tpu.solvers.bundle_adjust import (
    BAProblem, TETHER_DISTANCE, TETHER_SIX_DOF, bundle_adjust, empty_tethers)


def build_problem(rng, K=6, L=120, M=6, pose_noise=0.02, point_noise=0.05,
                  obs_noise=0.0, T=0):
    """Synthetic BA problem: K cameras in an arc looking at L points."""
    pts_gt = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                       rng.uniform(4.0, 9.0, L)], -1).astype(np.float32)
    poses_gt = []
    for k in range(K):
        ang = 0.08 * (k - K / 2)
        q = se3.so3_exp(jnp.array([0.0, ang, 0.0]))
        t = jnp.array([0.4 * (k - K / 2), 0.02 * k, 0.0])
        poses_gt.append(np.asarray(se3.make_pose(q, t)))
    poses_gt = np.asarray(poses_gt, np.float32)

    # observations: each point seen by M consecutive cameras
    obs_kf = np.zeros((L, M), np.int32)
    obs_xn = np.zeros((L, M, 2), np.float32)
    obs_valid = np.zeros((L, M), bool)
    for l in range(L):
        k0 = rng.integers(0, max(K - M, 1))
        for m in range(M):
            k = min(k0 + m, K - 1)
            obs_kf[l, m] = k
            xn, z = pnp.project_normalized(jnp.asarray(poses_gt[k]),
                                           jnp.asarray(pts_gt[l]))
            obs_xn[l, m] = np.asarray(xn) + rng.normal(0, obs_noise, 2)
            obs_valid[l, m] = float(z) > 0

    # perturb initial estimates (keyframes 0/1 stay at GT — they are the
    # fixed gauge anchors below, so GT must remain reachable)
    poses0 = poses_gt.copy()
    for k in range(2, K):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses0[k] = np.asarray(se3.pose_retract(jnp.asarray(poses_gt[k]),
                                                jnp.asarray(xi)))
    pts0 = pts_gt + rng.normal(0, point_noise, (L, 3)).astype(np.float32)

    kf_fixed = np.zeros(K, bool)
    kf_fixed[0] = True
    kf_fixed[1] = True  # fix two cams to pin scale+gauge

    problem = BAProblem(
        kf_poses=jnp.asarray(poses0),
        kf_fixed=jnp.asarray(kf_fixed),
        points=jnp.asarray(pts0),
        point_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_xn=jnp.asarray(obs_xn),
        obs_valid=jnp.asarray(obs_valid),
        **{k: jnp.asarray(v) for k, v in empty_tethers(T).items()},
    )
    return problem, poses_gt, pts_gt


class TestBundleAdjust:
    def test_reduces_error_and_recovers_geometry(self, rng):
        problem, poses_gt, pts_gt = build_problem(rng)
        res = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                            num_steps=10)
        assert float(res.mean_sq_error) < 1e-8
        # pose error vs ground truth
        for k in range(poses_gt.shape[0]):
            err = np.asarray(se3.pose_log(se3.pose_compose(
                res.kf_poses[k], se3.pose_inverse(jnp.asarray(poses_gt[k])))))
            assert np.linalg.norm(err) < 5e-3, k
        # point error
        d = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=-1)
        assert np.median(d) < 2e-2

    def test_fixed_keyframes_unchanged(self, rng):
        problem, _, _ = build_problem(rng)
        res = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                            num_steps=5)
        np.testing.assert_allclose(np.asarray(res.kf_poses[0]),
                                   np.asarray(problem.kf_poses[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.kf_poses[1]),
                                   np.asarray(problem.kf_poses[1]), atol=1e-7)

    def test_outlier_flagging(self, rng):
        problem, _, _ = build_problem(rng, pose_noise=0.0, point_noise=0.0)
        # corrupt some observations
        obs_xn = np.array(problem.obs_xn)
        obs_xn[:10, 0] += 0.1
        problem = problem._replace(obs_xn=jnp.asarray(obs_xn))
        res = bundle_adjust(problem, jnp.float32(0.005), jnp.float32(0.01),
                            num_steps=5)
        out = np.asarray(res.outliers)
        assert out[:10, 0].sum() >= 8
        assert out[10:].sum() <= 5

    def test_noisy_observations_converge(self, rng):
        problem, poses_gt, _ = build_problem(rng, obs_noise=5e-4)
        res = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.02),
                            num_steps=10)
        # mse should be near the noise floor (~2 * 5e-4^2)
        assert float(res.mean_sq_error) < 4 * (5e-4) ** 2

    def test_lambda_persists(self, rng):
        problem, _, _ = build_problem(rng)
        res1 = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                             num_steps=3)
        res2 = bundle_adjust(
            problem._replace(kf_poses=res1.kf_poses, points=res1.points),
            jnp.float32(0.01), jnp.float32(0.01), num_steps=3, lam0=res1.lam)
        assert float(res2.mean_sq_error) <= float(res1.mean_sq_error) + 1e-10

    def test_distance_tether_holds_baseline(self, rng):
        problem, poses_gt, _ = build_problem(rng, T=1)
        c0 = np.asarray(se3.camera_center(jnp.asarray(poses_gt[0])))
        c5 = np.asarray(se3.camera_center(jnp.asarray(poses_gt[-1])))
        target = float(np.linalg.norm(c0 - c5))
        problem = problem._replace(
            tether_i=jnp.array([0], jnp.int32),
            tether_j=jnp.array([problem.kf_poses.shape[0] - 1], jnp.int32),
            tether_type=jnp.array([TETHER_DISTANCE], jnp.int32),
            tether_dist=jnp.array([target], jnp.float32),
            tether_weight=jnp.array([50.0], jnp.float32),
        )
        res = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                            num_steps=10)
        c0e = np.asarray(se3.camera_center(res.kf_poses[0]))
        c5e = np.asarray(se3.camera_center(res.kf_poses[-1]))
        assert abs(np.linalg.norm(c0e - c5e) - target) < 1e-2

    def test_six_dof_tether(self, rng):
        problem, poses_gt, _ = build_problem(rng, T=1)
        K = problem.kf_poses.shape[0]
        rel_gt = se3.pose_compose(jnp.asarray(poses_gt[2]),
                                  se3.pose_inverse(jnp.asarray(poses_gt[3])))
        problem = problem._replace(
            tether_i=jnp.array([2], jnp.int32),
            tether_j=jnp.array([3], jnp.int32),
            tether_type=jnp.array([TETHER_SIX_DOF], jnp.int32),
            tether_pose=rel_gt[None],
            tether_weight=jnp.array([100.0], jnp.float32),
        )
        res = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                            num_steps=10)
        rel_est = se3.pose_compose(res.kf_poses[2],
                                   se3.pose_inverse(res.kf_poses[3]))
        err = np.asarray(se3.pose_log(se3.pose_compose(
            rel_est, se3.pose_inverse(rel_gt))))
        assert np.linalg.norm(err) < 5e-3
