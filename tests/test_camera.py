"""Camera model + triangulation + epipolar tests."""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3, epipolar, triangulation
from mageslam_tpu.geometry.camera import (
    CameraCalibration, project, unproject, project_world, in_bounds)


def make_cal():
    return CameraCalibration.pinhole(250.0, 250.0, 160.0, 90.0, 320, 180)


def make_distorted_cal():
    return CameraCalibration.poly3k(250.0, 250.0, 160.0, 90.0,
                                    -0.28, 0.07, -0.01, 320, 180)


class TestCamera:
    def test_project_unproject_pinhole(self, rng):
        cal = make_cal()
        pts = rng.uniform(0.2, 5.0, size=(20, 3)).astype(np.float32)
        pts[:, :2] -= 2.5
        uv, z = project(cal, jnp.asarray(pts))
        back = unproject(cal, uv, z)
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)

    def test_project_unproject_distorted(self, rng):
        cal = make_distorted_cal()
        pts = np.stack([rng.uniform(-0.8, 0.8, 30), rng.uniform(-0.5, 0.5, 30),
                        rng.uniform(1.0, 4.0, 30)], -1).astype(np.float32)
        pts[:, :2] *= pts[:, 2:3]
        uv, z = project(cal, jnp.asarray(pts))
        back = unproject(cal, uv, z)
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-3)

    def test_known_projection(self):
        cal = make_cal()
        uv, z = project(cal, jnp.array([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [160.0, 90.0], atol=1e-5)
        assert float(z) == 2.0

    def test_in_bounds(self):
        cal = make_cal()
        uv = jnp.array([[0.0, 0.0], [319.0, 179.0], [-1.0, 5.0],
                        [100.0, 185.0]])
        np.testing.assert_array_equal(
            np.asarray(in_bounds(cal, uv)), [True, True, False, False])

    def test_negative_depth_no_nan(self):
        cal = make_cal()
        uv, z = project(cal, jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]]))
        assert not np.any(np.isnan(np.asarray(uv)))


class TestTriangulation:
    def _two_view(self, rng, n=40):
        cal = make_cal()
        pose0 = se3.pose_identity()
        pose1 = se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.05, 0.0])),
                              jnp.array([-0.3, 0.0, 0.0]))
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n),
                        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
        uv0, _ = project_world(cal, pose0, jnp.asarray(pts))
        uv1, _ = project_world(cal, pose1, jnp.asarray(pts))
        return cal, pose0, pose1, pts, uv0, uv1

    def test_midpoint(self, rng):
        cal, p0, p1, pts, uv0, uv1 = self._two_view(rng)
        X, valid = triangulation.triangulate_pixels(cal, cal, p0, p1, uv0, uv1,
                                                    "midpoint")
        assert bool(np.all(np.asarray(valid)))
        np.testing.assert_allclose(np.asarray(X), pts, rtol=1e-2, atol=1e-2)

    def test_dlt(self, rng):
        cal, p0, p1, pts, uv0, uv1 = self._two_view(rng)
        X, valid = triangulation.triangulate_pixels(cal, cal, p0, p1, uv0, uv1,
                                                    "dlt")
        np.testing.assert_allclose(np.asarray(X), pts, rtol=1e-2, atol=1e-2)

    def test_parallel_rays_invalid(self):
        p0 = se3.pose_identity()
        p1 = se3.pose_identity()  # same camera -> no parallax
        ray = jnp.array([[0.1, 0.2, 1.0]])
        _, valid = triangulation.triangulate_midpoint(p0, p1, ray, ray)
        assert not bool(valid[0])

    def test_parallax_cos(self, rng):
        p0 = se3.pose_identity()
        p1 = se3.make_pose(se3.quat_identity(), jnp.array([-1.0, 0.0, 0.0]))
        x = jnp.array([0.5, 0.0, 1.0])
        c = triangulation.parallax_cos(p0, p1, x)
        # angle at the point between the two centers
        c0, c1 = np.array([0, 0, 0.0]), np.array([1, 0, 0.0])
        v0, v1 = c0 - np.asarray(x), c1 - np.asarray(x)
        expect = v0 @ v1 / (np.linalg.norm(v0) * np.linalg.norm(v1))
        np.testing.assert_allclose(float(c), expect, atol=1e-5)


class TestEpipolar:
    def test_essential_consistency(self, rng):
        cal = make_cal()
        pose0 = se3.make_pose(se3.so3_exp(jnp.array([0.02, -0.03, 0.01])),
                              jnp.array([0.1, -0.2, 0.3]))
        pose1 = se3.make_pose(se3.so3_exp(jnp.array([-0.05, 0.04, 0.02])),
                              jnp.array([-0.2, 0.1, 0.25]))
        rel = se3.pose_compose(pose1, se3.pose_inverse(pose0))
        E = epipolar.essential_from_pose(rel)
        pts = np.stack([rng.uniform(-1, 1, 30), rng.uniform(-0.6, 0.6, 30),
                        rng.uniform(2.0, 6.0, 30)], -1).astype(np.float32)
        x0 = se3.pose_apply(pose0, jnp.asarray(pts))
        x1 = se3.pose_apply(pose1, jnp.asarray(pts))
        xn0 = x0[:, :2] / x0[:, 2:]
        xn1 = x1[:, :2] / x1[:, 2:]
        d = epipolar.sampson_distance_sq(E, xn0, xn1)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)
        d2 = epipolar.symmetric_epipolar_distance_sq(E, xn0, xn1)
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)

    def test_decompose_essential_recovers_pose(self, rng):
        rel = se3.make_pose(se3.so3_exp(jnp.array([0.1, -0.05, 0.02])),
                            jnp.array([0.6, -0.8, 0.0]))
        t_unit = se3.pose_t(rel) / jnp.linalg.norm(se3.pose_t(rel))
        rel_unit = se3.make_pose(se3.pose_q(rel), t_unit)
        E = epipolar.essential_from_pose(rel_unit)
        cands = epipolar.decompose_essential(E)
        # one of the 4 candidates must match rel (up to quaternion sign)
        best = min(
            float(jnp.minimum(
                jnp.linalg.norm(cands[i] - rel_unit),
                jnp.linalg.norm(cands[i] * jnp.array([-1.0, -1, -1, -1, 1, 1, 1])
                                - rel_unit)))
            for i in range(4))
        assert best < 1e-4
