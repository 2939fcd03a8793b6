"""Distributed BA on the virtual 8-device CPU mesh: correctness vs
single-device (BASELINE.json: 'distributed BA converging to the same
reprojection error as single-host')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.parallel import distributed_ba
from mageslam_tpu.solvers.bundle_adjust import bundle_adjust
from tests.test_bundle_adjust import build_problem


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return distributed_ba.make_mesh(8)


class TestDistributedBA:
    def test_matches_single_device(self, mesh8, rng):
        problem, poses_gt, pts_gt = build_problem(rng, K=6, L=128, M=6,
                                                  obs_noise=3e-4)
        res1 = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.02),
                             num_steps=8)
        sp = distributed_ba.shard_problem(problem, mesh8)
        resN = distributed_ba.distributed_bundle_adjust(
            sp, 0.01, 0.02, mesh8, num_steps=8)
        # same reprojection error + same solution (deterministic path)
        assert float(resN.mean_sq_error) == pytest.approx(
            float(res1.mean_sq_error), rel=1e-3, abs=1e-9)
        np.testing.assert_allclose(np.asarray(resN.kf_poses),
                                   np.asarray(res1.kf_poses), atol=1e-4)
        np.testing.assert_allclose(np.asarray(resN.points),
                                   np.asarray(res1.points), atol=1e-3)

    def test_converges_on_mesh(self, mesh8, rng):
        problem, poses_gt, _ = build_problem(rng, K=6, L=128, M=6,
                                             pose_noise=0.03)
        sp = distributed_ba.shard_problem(problem, mesh8)
        res = distributed_ba.distributed_bundle_adjust(
            sp, 0.01, 0.01, mesh8, num_steps=10)
        assert float(res.mean_sq_error) < 1e-7

    def test_tethers_counted_once(self, mesh8, rng):
        from mageslam_tpu.solvers.bundle_adjust import TETHER_DISTANCE
        from mageslam_tpu.geometry import se3
        problem, poses_gt, _ = build_problem(rng, K=6, L=128, M=6, T=1)
        c0 = np.asarray(se3.camera_center(jnp.asarray(poses_gt[0])))
        c5 = np.asarray(se3.camera_center(jnp.asarray(poses_gt[-1])))
        target = float(np.linalg.norm(c0 - c5))
        problem = problem._replace(
            tether_i=jnp.array([0], jnp.int32),
            tether_j=jnp.array([5], jnp.int32),
            tether_type=jnp.array([TETHER_DISTANCE], jnp.int32),
            tether_dist=jnp.array([target], jnp.float32),
            tether_weight=jnp.array([50.0], jnp.float32),
        )
        res1 = bundle_adjust(problem, jnp.float32(0.01), jnp.float32(0.01),
                             num_steps=8)
        sp = distributed_ba.shard_problem(problem, mesh8)
        resN = distributed_ba.distributed_bundle_adjust(
            sp, 0.01, 0.01, mesh8, num_steps=8)
        np.testing.assert_allclose(np.asarray(resN.kf_poses),
                                   np.asarray(res1.kf_poses), atol=5e-4)
