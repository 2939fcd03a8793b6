"""H/F dual-model bootstrap: planar-degenerate initialization.

The reference grafts the Nistér five-point solver because the 8-point
essential matrix degenerates on planar scenes
(Tracking/ComputeEssential.cpp:1-10); this build reconstructs from a scored
4-point homography instead.  These tests pin (1) the Faugeras decomposition
against a constructed ground-truth homography, (2) model selection +
reconstruction on exact planar vs volumetric correspondences, and (3) the
full frontend path on a rendered planar wall — the configuration that made
``create_planar`` exist (io/synthetic.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.geometry import se3
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration)
from mageslam_tpu.solvers import homography
from mageslam_tpu.tracking import initialization
from mageslam_tpu.tracking.frontend import extract_for_settings
from mageslam_tpu.ops import pyramid

from test_slam_e2e import fast_settings


def _planar_correspondences(n=120, depth=6.0, seed=0):
    """Exact correspondences of a fronto-parallel plane under a known
    relative pose (rotation + lateral translation)."""
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  np.full(n, depth)], -1).astype(np.float32)
    ang = 0.08
    Rcw = np.array([[np.cos(ang), 0, -np.sin(ang)],
                    [0, 1, 0],
                    [np.sin(ang), 0, np.cos(ang)]], np.float32)
    t = np.array([-0.45, 0.1, 0.05], np.float32)
    pose1 = np.asarray(se3.make_pose(
        se3.mat_to_quat(jnp.asarray(Rcw)), jnp.asarray(t)))
    xn0 = X[:, :2] / X[:, 2:3]
    Y = X @ Rcw.T + t
    xn1 = Y[:, :2] / Y[:, 2:3]
    return (jnp.asarray(xn0), jnp.asarray(xn1), jnp.asarray(pose1),
            jnp.asarray(X))


def _volumetric_correspondences(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4.0, 12.0, n)], -1).astype(np.float32)
    ang = 0.08
    Rcw = np.array([[np.cos(ang), 0, -np.sin(ang)],
                    [0, 1, 0],
                    [np.sin(ang), 0, np.cos(ang)]], np.float32)
    t = np.array([-0.45, 0.1, 0.05], np.float32)
    pose1 = np.asarray(se3.make_pose(
        se3.mat_to_quat(jnp.asarray(Rcw)), jnp.asarray(t)))
    xn0 = X[:, :2] / X[:, 2:3]
    Y = X @ Rcw.T + t
    xn1 = Y[:, :2] / Y[:, 2:3]
    return (jnp.asarray(xn0), jnp.asarray(xn1), jnp.asarray(pose1),
            jnp.asarray(X))


def _pose_direction_error(pose_est, pose_gt):
    """Angle between unit translations + rotation geodesic (monocular
    scale-free comparison)."""
    t_e = np.asarray(se3.pose_t(pose_est))
    t_g = np.asarray(se3.pose_t(pose_gt))
    t_e = t_e / np.linalg.norm(t_e)
    t_g = t_g / np.linalg.norm(t_g)
    dt = np.degrees(np.arccos(np.clip(np.dot(t_e, t_g), -1, 1)))
    dq = np.asarray(se3.pose_log(se3.pose_compose(
        pose_est, se3.pose_inverse(pose_gt))))[:3]
    return dt, np.degrees(np.linalg.norm(dq))


class TestHomographySolver:
    def test_four_point_exact(self):
        xn0, xn1, pose1, X = _planar_correspondences()
        H = homography._four_point_h(xn0[:4], xn1[:4])
        err = homography.symmetric_transfer_error_sq(H, xn0, xn1)
        assert float(jnp.max(err)) < 1e-6

    def test_ransac_and_decomposition(self):
        xn0, xn1, pose1, X = _planar_correspondences()
        valid = jnp.ones(xn0.shape[0], bool)
        res = homography.homography_ransac(
            jax.random.key(0), xn0, xn1, valid,
            inlier_thresh=jnp.float32(2e-3), num_hypotheses=128)
        assert int(res.num_inliers) >= 110
        pose = homography.recover_pose_from_h(res.H, xn0, xn1, res.inliers)
        dt, dr = _pose_direction_error(pose, pose1)
        assert dt < 2.0, dt
        assert dr < 1.0, dr

    def test_model_selection_planar_vs_volumetric(self):
        s = fast_settings().mono.map_init
        F = 320

        def run(xn0, xn1):
            from mageslam_tpu.tracking.frontend import FrameFeatures
            n = xn0.shape[0]
            pad = F - n

            def feats(xn):
                uvz = jnp.pad(xn, ((0, pad), (0, 0)))
                desc = jax.random.randint(
                    jax.random.key(1), (F, 8), 0, 2**31 - 1
                ).astype(jnp.uint32)
                return FrameFeatures(
                    uv=uvz * 272.0 + jnp.asarray([160.0, 90.0]),
                    xn_undist=uvz,
                    response=jnp.ones(F), angle=jnp.zeros(F),
                    octave=jnp.zeros(F, jnp.int32),
                    desc=desc,
                    valid=jnp.arange(F) < n)
            # identical descriptors in both frames -> perfect matching
            f0 = feats(xn0)
            f1 = feats(xn1)
            return initialization.attempt_initialization(
                jax.random.key(2), f0, f1, s, 272.0)

        xn0, xn1, pose1, _ = _planar_correspondences()
        r_planar = run(xn0, xn1)
        assert bool(r_planar.used_homography)
        assert bool(r_planar.success)
        dt, dr = _pose_direction_error(r_planar.pose1, pose1)
        assert dt < 5.0 and dr < 2.0, (dt, dr)

        xn0, xn1, pose1, _ = _volumetric_correspondences()
        r_vol = run(xn0, xn1)
        assert not bool(r_vol.used_homography)
        assert bool(r_vol.success)
        dt, dr = _pose_direction_error(r_vol.pose1, pose1)
        assert dt < 5.0 and dr < 2.0, (dt, dr)


class TestPlanarSceneInit:
    def test_planar_wall_initializes(self):
        """Rendered fronto-parallel wall (create_planar): the 8-point-only
        bootstrap of rounds 1-2 could not initialize here reliably; the
        dual-model path must — and through the H branch."""
        world = SyntheticWorld.create_planar(500, seed=7)
        cal = default_calibration()
        s = fast_settings()
        # two views with lateral parallax on the plane
        p0 = np.asarray(se3.pose_identity())
        ang = 0.06
        Rcw = np.array([[np.cos(ang), 0, -np.sin(ang)],
                        [0, 1, 0],
                        [np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([-0.5, 0.05, 0.0], np.float32)
        p1 = np.asarray(se3.make_pose(
            se3.mat_to_quat(jnp.asarray(Rcw)), jnp.asarray(t)))
        img0 = world.render(cal, p0, seed=11)
        img1 = world.render(cal, p1, seed=12)
        f0 = extract_for_settings(pyramid.to_gray_f32(img0), cal,
                                  s.mono.camera, s.capacity.max_features)
        f1 = extract_for_settings(pyramid.to_gray_f32(img1), cal,
                                  s.mono.camera, s.capacity.max_features)
        res = initialization.attempt_initialization(
            jax.random.key(3), f0, f1, s.mono.map_init, float(cal.fx))
        assert bool(res.success)
        assert bool(res.used_homography)
        dt, dr = _pose_direction_error(res.pose1, jnp.asarray(p1))
        assert dt < 10.0, dt
        assert dr < 3.0, dr
