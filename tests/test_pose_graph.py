"""Sim3 pose-graph optimization tests: loop-closure drift correction."""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3, sim3
from mageslam_tpu.solvers.pose_graph import (
    PoseGraphProblem, make_odometry_edges, optimize_pose_graph)


def circle_trajectory(K, radius=3.0):
    """Ground-truth sim3 view states around a circle (scale 1)."""
    states = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        q = se3.so3_exp(jnp.array([0.0, ang, 0.0]))
        c = jnp.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))])
        t = -se3.quat_rotate(q, c)
        states.append(np.asarray(sim3.make_sim3(q, t, 1.0)))
    return np.asarray(states, np.float32)


class TestPoseGraph:
    def test_drift_correction_with_loop_edge(self, rng):
        K = 12
        gt = circle_trajectory(K)
        # accumulate drift: each successive pose gets an increasing error +
        # scale drift (the monocular failure mode)
        drift = np.array(gt)
        for k in range(1, K):
            xi = np.zeros(7, np.float32)
            xi[:6] = rng.normal(0, 0.01 * k, 6)
            xi[6] = 0.01  # per-step log-scale drift
            drift[k] = np.asarray(sim3.sim3_retract(jnp.asarray(drift[k]),
                                                    jnp.asarray(xi)))
        states = jnp.asarray(drift)
        valid = jnp.ones(K, bool)
        # odometry edges measured from the DRIFTED chain (what odometry saw)
        ei, ej, erel, ew = make_odometry_edges(states, valid, 1.0)
        # loop edge: keyframe K-1 to keyframe 0 with the TRUE relative
        gt_states = jnp.asarray(gt)
        rel_loop = sim3.sim3_compose(gt_states[K - 1],
                                     sim3.sim3_inverse(gt_states[0]))
        ei = jnp.concatenate([ei, jnp.array([K - 1], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.array([0], jnp.int32)])
        erel = jnp.concatenate([erel, rel_loop[None]])
        ew = jnp.concatenate([ew, jnp.array([100.0])])

        fixed = jnp.zeros(K, bool).at[0].set(True)
        problem = PoseGraphProblem(states, fixed, ei, ej, erel, ew)
        res = optimize_pose_graph(problem, num_steps=25)

        # the loop edge must now be satisfied
        final_rel = sim3.sim3_compose(res.states[K - 1],
                                      sim3.sim3_inverse(res.states[0]))
        err = np.asarray(sim3.sim3_log(sim3.sim3_compose(
            final_rel, sim3.sim3_inverse(rel_loop))))
        assert np.linalg.norm(err) < 1e-2
        # and scale drift must shrink: end-keyframe scale back near 1
        assert abs(float(sim3.sim3_s(res.states[K - 1])[0]) - 1.0) < 0.05
        assert float(res.final_error) < 1e-2

    def test_identity_problem_stays_put(self, rng):
        K = 6
        gt = jnp.asarray(circle_trajectory(K))
        valid = jnp.ones(K, bool)
        ei, ej, erel, ew = make_odometry_edges(gt, valid, 1.0)
        problem = PoseGraphProblem(gt, jnp.zeros(K, bool).at[0].set(True),
                                   ei, ej, erel, ew)
        res = optimize_pose_graph(problem, num_steps=5)
        np.testing.assert_allclose(np.asarray(res.states), np.asarray(gt),
                                   atol=1e-4)

    def test_inactive_edges_ignored(self, rng):
        K = 6
        gt = jnp.asarray(circle_trajectory(K))
        valid = jnp.ones(K, bool)
        ei, ej, erel, ew = make_odometry_edges(gt, valid, 1.0)
        # add a garbage edge with weight 0 — must not affect the solution
        ei = jnp.concatenate([ei, jnp.array([3], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.array([0], jnp.int32)])
        erel = jnp.concatenate([erel, sim3.sim3_identity()[None] * 7.0])
        ew = jnp.concatenate([ew, jnp.array([0.0])])
        problem = PoseGraphProblem(gt, jnp.zeros(K, bool).at[0].set(True),
                                   ei, ej, erel, ew)
        res = optimize_pose_graph(problem, num_steps=5)
        np.testing.assert_allclose(np.asarray(res.states), np.asarray(gt),
                                   atol=1e-4)
