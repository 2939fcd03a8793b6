"""Geometry core tests: quaternions, SE(3), Sim(3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.geometry import se3, sim3


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(se3.quat_normalize(jnp.asarray(q)))


def random_pose(rng, n=()):
    q = random_quat(rng, n)
    t = rng.normal(size=n + (3,)).astype(np.float32)
    return np.asarray(se3.make_pose(jnp.asarray(q), jnp.asarray(t)))


class TestQuaternion:
    def test_mul_identity(self, rng):
        q = jnp.asarray(random_quat(rng, (5,)))
        e = jnp.broadcast_to(se3.quat_identity(), q.shape)
        np.testing.assert_allclose(se3.quat_mul(e, q), q, atol=1e-6)
        np.testing.assert_allclose(se3.quat_mul(q, e), q, atol=1e-6)

    def test_rotate_matches_matrix(self, rng):
        q = jnp.asarray(random_quat(rng, (7,)))
        v = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        R = se3.quat_to_mat(q)
        np.testing.assert_allclose(
            se3.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", R, v), atol=1e-5)

    def test_mat_quat_roundtrip(self, rng):
        q = jnp.asarray(random_quat(rng, (32,)))
        q2 = se3.mat_to_quat(se3.quat_to_mat(q))
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(q * q2), -1)),
                                   1.0, atol=1e-5)

    def test_roundtrip_near_180deg(self):
        # rotation by pi about x — the degenerate trace case
        q = jnp.array([[1e-5, 1.0, 0.0, 0.0]])
        q = se3.quat_normalize(q)
        q2 = se3.mat_to_quat(se3.quat_to_mat(q))
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(q * q2), -1)),
                                   1.0, atol=1e-4)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        np.testing.assert_allclose(se3.so3_log(se3.so3_exp(w)), w, atol=1e-4)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        q = se3.so3_exp(w)
        assert not np.any(np.isnan(np.asarray(q)))
        np.testing.assert_allclose(q[1], se3.quat_identity(), atol=1e-7)

    def test_exp_matches_rodrigues(self, rng):
        w = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
        theta = float(jnp.linalg.norm(w))
        K = np.asarray(se3.hat(w / theta))
        R_rod = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(np.asarray(se3.quat_to_mat(se3.so3_exp(w))),
                                   R_rod, atol=1e-5)


class TestPose:
    def test_compose_inverse(self, rng):
        p = jnp.asarray(random_pose(rng, (8,)))
        e = se3.pose_compose(p, se3.pose_inverse(p))
        np.testing.assert_allclose(np.asarray(se3.pose_t(e)),
                                   np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.asarray(se3.pose_q(e))[:, 0]), 1.0, atol=1e-5)

    def test_apply_matches_mat44(self, rng):
        p = jnp.asarray(random_pose(rng, (4,)))
        x = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        M = se3.pose_to_mat44(p)
        xh = jnp.concatenate([x, jnp.ones((4, 1))], -1)
        np.testing.assert_allclose(
            np.asarray(se3.pose_apply(p, x)),
            np.asarray(jnp.einsum("nij,nj->ni", M, xh))[:, :3], atol=1e-5)

    def test_camera_center(self, rng):
        p = jnp.asarray(random_pose(rng))
        c = se3.camera_center(p)
        np.testing.assert_allclose(np.asarray(se3.pose_apply(p, c)),
                                   np.zeros(3), atol=1e-5)

    def test_retract_zero(self, rng):
        p = jnp.asarray(random_pose(rng))
        p2 = se3.pose_retract(p, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-6)

    def test_constant_velocity(self, rng):
        # uniform motion: prediction should continue the motion exactly
        p0 = jnp.asarray(random_pose(rng))
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1)
        p1 = se3.pose_retract(p0, xi)
        p2_pred = se3.constant_velocity_extrapolate(p0, p1)
        p2_true = se3.pose_retract(p1, xi)
        np.testing.assert_allclose(np.asarray(p2_pred), np.asarray(p2_true),
                                   atol=1e-4)

    def test_interpolate_endpoints(self, rng):
        a = jnp.asarray(random_pose(rng))
        b = jnp.asarray(random_pose(rng))
        np.testing.assert_allclose(np.asarray(se3.pose_interpolate(a, b, 0.0)),
                                   np.asarray(a), atol=1e-5)
        np.testing.assert_allclose(np.asarray(se3.pose_interpolate(a, b, 1.0)),
                                   np.asarray(b), atol=1e-5)

    def test_jit_and_vmap(self, rng):
        p = jnp.asarray(random_pose(rng, (8,)))
        x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        f = jax.jit(jax.vmap(se3.pose_apply))
        np.testing.assert_allclose(np.asarray(f(p, x)),
                                   np.asarray(se3.pose_apply(p, x)), atol=1e-6)


class TestSim3:
    def test_compose_inverse(self, rng):
        q = jnp.asarray(random_quat(rng))
        g = sim3.make_sim3(q, jnp.asarray(rng.normal(size=3).astype(np.float32)),
                           1.7)
        e = sim3.sim3_compose(g, sim3.sim3_inverse(g))
        np.testing.assert_allclose(np.asarray(sim3.sim3_t(e)), np.zeros(3),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sim3.sim3_s(e)), 1.0, atol=1e-5)

    def test_apply_scale(self, rng):
        g = sim3.make_sim3(se3.quat_identity(), jnp.zeros(3), 2.0)
        x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(sim3.sim3_apply(g, x)),
                                   2.0 * np.asarray(x), atol=1e-5)

    def test_umeyama_recovers_transform(self, rng):
        q = jnp.asarray(random_quat(rng))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32))
        s = 0.7
        g_true = sim3.make_sim3(q, t, s)
        src = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        dst = sim3.sim3_apply(g_true, src)
        g_est = sim3.umeyama_alignment(src, dst)
        np.testing.assert_allclose(np.asarray(sim3.sim3_apply(g_est, src)),
                                   np.asarray(dst), atol=1e-4)
        np.testing.assert_allclose(float(sim3.sim3_s(g_est)[0]), s, atol=1e-4)
