"""MapState, covisibility, local BA window, and pose history tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.mapstore import pose_history as ph
from mageslam_tpu.mapping import local_ba
from mageslam_tpu.solvers import pnp
from mageslam_tpu.solvers.bundle_adjust import bundle_adjust
from mageslam_tpu.tracking.frontend import FrameFeatures

K, F, L = 16, 64, 256


def mk_feats(rng, n_valid=40):
    uv = rng.uniform(0, 200, (F, 2)).astype(np.float32)
    return FrameFeatures(
        uv=jnp.asarray(uv),
        xn_undist=jnp.asarray((uv - 100.0) / 250.0),
        response=jnp.ones(F, jnp.float32),
        angle=jnp.zeros(F, jnp.float32),
        octave=jnp.zeros(F, jnp.int32),
        desc=jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint32)),
        valid=jnp.arange(F) < n_valid,
    )


class TestMapState:
    def test_insert_and_capacity(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f,
                                   jnp.full(F, -1, jnp.int32), 0)
        m, s1 = ms.insert_keyframe(m, se3.pose_identity(), f,
                                   jnp.full(F, -1, jnp.int32), 1)
        assert int(s0) == 0 and int(s1) == 1
        assert int(jnp.sum(m.kf_valid)) == 2
        assert int(m.num_kf_ever) == 2

    def test_allocate_points_and_membership(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        n = 20
        pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        desc = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
        m, ids = ms.allocate_map_points(
            m, pos, desc, jnp.zeros((n, 3)), 0, jnp.ones(n, bool))
        assert np.all(np.asarray(ids) >= 0)
        assert int(jnp.sum(m.mp_valid)) == n
        # associate first 20 features of kf0 with these points
        assoc = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids)
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f, assoc, 0)
        mem = ms.member_matrix(m)
        assert int(jnp.sum(mem[s0])) == n

    def test_allocation_overflow_drops(self, rng):
        m = ms.empty_map(K, F, 32)
        n = 64
        pos = jnp.zeros((n, 3))
        desc = jnp.zeros((n, 8), jnp.uint32)
        m, ids = ms.allocate_map_points(m, pos, desc, jnp.zeros((n, 3)), 0,
                                        jnp.ones(n, bool))
        assert int(jnp.sum(ids >= 0)) == 32
        assert int(jnp.sum(m.mp_valid)) == 32

    def test_covisibility_counts(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        n = 30
        m, ids = ms.allocate_map_points(
            m, jnp.zeros((n, 3)), jnp.zeros((n, 8), jnp.uint32),
            jnp.zeros((n, 3)), 0, jnp.ones(n, bool))
        # kf0 sees all 30, kf1 sees first 10
        a0 = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids)
        a1 = jnp.full(F, -1, jnp.int32).at[jnp.arange(10)].set(ids[:10])
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f, a0, 0)
        m, s1 = ms.insert_keyframe(m, se3.pose_identity(), f, a1, 1)
        cov = ms.covisibility(m)
        assert int(cov[s0, s1]) == 10
        assert int(cov[s0, s0]) == 0

    def test_remove_points_clears_assoc(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        n = 10
        m, ids = ms.allocate_map_points(
            m, jnp.zeros((n, 3)), jnp.zeros((n, 8), jnp.uint32),
            jnp.zeros((n, 3)), 0, jnp.ones(n, bool))
        a0 = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids)
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f, a0, 0)
        kill = jnp.zeros(L, bool).at[ids[:5]].set(True)
        m = ms.remove_map_points(m, kill)
        assert int(jnp.sum(m.mp_valid)) == 5
        assert int(jnp.sum(m.kf_assoc[s0] >= 0)) == 5

    def test_merge_points(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        n = 6
        m, ids = ms.allocate_map_points(
            m, jnp.zeros((n, 3)), jnp.zeros((n, 8), jnp.uint32),
            jnp.zeros((n, 3)), 0, jnp.ones(n, bool))
        a0 = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids)
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f, a0, 0)
        # merge points 0,1 into 2,3
        m = ms.merge_map_points(m, ids[:2], ids[2:4], jnp.ones(2, bool))
        assert int(jnp.sum(m.mp_valid)) == n - 2
        assoc = np.asarray(m.kf_assoc[s0][:n])
        np.testing.assert_array_equal(assoc[:2], np.asarray(ids[2:4]))

    def test_remove_keyframe_protects_immortal(self, rng):
        m = ms.empty_map(K, F, L)
        f = mk_feats(rng)
        m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f,
                                   jnp.full(F, -1, jnp.int32), 0,
                                   immortal=True)
        m, s1 = ms.insert_keyframe(m, se3.pose_identity(), f,
                                   jnp.full(F, -1, jnp.int32), 1)
        m = ms.remove_keyframes(m, jnp.ones(K, bool))
        assert bool(m.kf_valid[s0]) and not bool(m.kf_valid[s1])


class TestLocalBAWindow:
    def _build_mini_slam_map(self, rng, n_kf=5, n_pts=60):
        """Map with a consistent multi-view geometry."""
        m = ms.empty_map(K, F, L)
        pts = np.stack([rng.uniform(-2, 2, n_pts),
                        rng.uniform(-1.5, 1.5, n_pts),
                        rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
        poses = []
        for k in range(n_kf):
            q = se3.so3_exp(jnp.array([0.0, 0.05 * k, 0.0]))
            t = jnp.array([0.3 * k, 0.0, 0.0])
            poses.append(se3.make_pose(q, t))
        m, ids = ms.allocate_map_points(
            m, jnp.asarray(pts),
            jnp.asarray(rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)),
            jnp.zeros((n_pts, 3)), 0, jnp.ones(n_pts, bool))
        for k, pose in enumerate(poses):
            xn, z = pnp.project_normalized(pose, jnp.asarray(pts))
            f = FrameFeatures(
                uv=jnp.zeros((F, 2)),
                xn_undist=jnp.zeros((F, 2)).at[jnp.arange(n_pts)].set(xn),
                response=jnp.ones(F), angle=jnp.zeros(F),
                octave=jnp.zeros(F, jnp.int32),
                desc=jnp.zeros((F, 8), jnp.uint32),
                valid=jnp.arange(F) < n_pts)
            assoc = jnp.full(F, -1, jnp.int32).at[jnp.arange(n_pts)].set(ids)
            m, _ = ms.insert_keyframe(m, pose, f, assoc, k)
        return m, np.asarray([np.asarray(p) for p in poses]), pts, ids

    def test_window_contains_covisible(self, rng):
        m, poses, pts, ids = self._build_mini_slam_map(rng)
        win = local_ba.build_local_window(m, 4, 5, window_size=8,
                                          num_fixed=4, max_points=128)
        sel = set(np.asarray(win.kf_list)[np.asarray(win.kf_list_valid)]
                  .tolist())
        assert {0, 1, 2, 3, 4} <= sel
        assert int(jnp.sum(win.mp_list_valid)) == 60
        # all 5 kfs observe every point -> each landmark has 5 valid obs
        assert int(jnp.sum(win.problem.obs_valid)) == 300

    def test_window_ba_restores_perturbed_map(self, rng):
        m, poses, pts, ids = self._build_mini_slam_map(rng)
        # perturb keyframe 4 pose and some points
        bad_pose = se3.pose_retract(jnp.asarray(poses[4]),
                                    jnp.array([0.01, -0.02, 0.01,
                                               0.05, 0.03, -0.04]))
        m = m._replace(kf_pose=m.kf_pose.at[4].set(bad_pose))
        noisy = np.array(np.asarray(m.mp_pos))
        noisy[np.asarray(ids[:20])] += rng.normal(0, 0.05, (20, 3))
        m = m._replace(mp_pos=jnp.asarray(noisy))

        win = local_ba.build_local_window(m, 4, 3, window_size=8,
                                          num_fixed=4, max_points=128)
        res = bundle_adjust(win.problem, jnp.float32(0.01),
                            jnp.float32(0.01), num_steps=8)
        m2 = local_ba.apply_window_result(m, win, res)
        err = np.asarray(se3.pose_log(se3.pose_compose(
            m2.kf_pose[4], se3.pose_inverse(jnp.asarray(poses[4])))))
        assert np.linalg.norm(err) < 5e-3
        d = np.linalg.norm(
            np.asarray(m2.mp_pos)[np.asarray(ids)] - pts, axis=-1)
        assert np.median(d) < 1e-2

    def test_unassociate_outliers(self, rng):
        m, poses, pts, ids = self._build_mini_slam_map(rng)
        # corrupt kf2's observation of point 0 by shifting its stored xn
        f_idx = 0  # feature 0 of kf2 observes point ids[0]
        xn_bad = m.kf_xn.at[2, f_idx].add(jnp.array([0.2, 0.2]))
        m = m._replace(kf_xn=xn_bad)
        win = local_ba.build_local_window(m, 4, 3, window_size=8,
                                          num_fixed=4, max_points=128)
        res = bundle_adjust(win.problem, jnp.float32(0.005),
                            jnp.float32(0.02), num_steps=5)
        assert int(jnp.sum(res.outliers)) >= 1
        m2 = local_ba.unassociate_outliers(m, win, res)
        assert int(m2.kf_assoc[2, f_idx]) == -1
        # other associations survive
        assert int(jnp.sum(m2.kf_assoc >= 0)) \
            == int(jnp.sum(m.kf_assoc >= 0)) - int(jnp.sum(res.outliers))


class TestPoseHistory:
    def test_add_and_world_pose(self, rng):
        h = ph.empty_history(64)
        kf_pose = jnp.tile(se3.pose_identity()[None], (4, 1))
        kf_pose = kf_pose.at[1].set(se3.make_pose(
            se3.so3_exp(jnp.array([0.0, 0.1, 0.0])),
            jnp.array([1.0, 0.0, 0.0])))
        frame_pose = se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.12, 0.0])),
                                   jnp.array([1.1, 0.0, 0.05]))
        h = ph.add_pose(h, 7, 0.2, frame_pose, 1, kf_pose)
        poses, ok = ph.world_poses(h, kf_pose, jnp.ones(4, bool))
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(poses[0]),
                                   np.asarray(frame_pose), atol=1e-5)

    def test_ba_adjustment_moves_history(self, rng):
        h = ph.empty_history(64)
        kf_pose = jnp.tile(se3.pose_identity()[None], (2, 1))
        frame_pose = se3.make_pose(se3.quat_identity(),
                                   jnp.array([0.1, 0.0, 0.0]))
        h = ph.add_pose(h, 1, 0.1, frame_pose, 0, kf_pose)
        # BA moves keyframe 0 by +1 in x
        kf_new = kf_pose.at[0, 4].add(1.0)
        poses, _ = ph.world_poses(h, kf_new, jnp.ones(2, bool))
        np.testing.assert_allclose(np.asarray(poses[0][4:]),
                                   [1.1, 0.0, 0.0], atol=1e-5)

    def test_reanchor_preserves_world_pose(self, rng):
        h = ph.empty_history(64)
        kf_pose = jnp.stack([
            se3.pose_identity(),
            se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.2, 0.0])),
                          jnp.array([0.5, 0.0, 0.0]))])
        frame_pose = se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.21, 0.0])),
                                   jnp.array([0.52, 0.0, 0.01]))
        h = ph.add_pose(h, 3, 0.3, frame_pose, 1, kf_pose)
        dead = jnp.array([False, True])
        targets = ph.nearest_valid_kf(jnp.ones(2, bool), dead,
                                      jnp.arange(2, dtype=jnp.int32))
        h2 = ph.reanchor(h, kf_pose, jnp.ones(2, bool), dead, targets)
        assert int(h2.anchor_kf[0, 0]) == 0
        poses, ok = ph.world_poses(h2, kf_pose, ~dead)
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(poses[0]),
                                   np.asarray(frame_pose), atol=1e-5)

    def test_ring_buffer_wrap(self, rng):
        h = ph.empty_history(4)
        p = se3.pose_identity()
        for i in range(6):
            h = ph.add_pose(h, i, float(i), p, 0, p[None])
        assert int(h.cursor) == 2
        assert set(np.asarray(h.frame_id).tolist()) == {4, 5, 2, 3}


class TestRefreshPointRepresentatives:
    """MapPoint::UpdateRepresentativeDescriptor /
    UpdateMeanViewDirectionAndDistances parity (MapPoint.cpp:80-131)."""

    def test_medoid_and_mean_direction(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import map_state as ms
        from mageslam_tpu.tracking.frontend import FrameFeatures

        K, F, L = 8, 16, 32
        m = ms.empty_map(K, F, L)
        pt = jnp.asarray([[0.0, 0.0, 6.0]])
        desc0 = jnp.zeros((F, 8), jnp.uint32)
        m, ids = ms.allocate_map_points(
            m, pt, desc0[:1], jnp.asarray([[0.0, 0.0, 1.0]]), 0,
            jnp.ones(1, bool))

        # three keyframes observe the point with descriptors A, A, B:
        # the medoid (min summed Hamming) must be A
        descA = jnp.zeros(8, jnp.uint32)
        descB = jnp.full(8, 0xFFFFFFFF, jnp.uint32)
        per_kf_desc = [descA, descA, descB]
        centers = [jnp.asarray([1.5, 0.0, 0.0]),
                   jnp.asarray([-1.5, 0.0, 0.0]),
                   jnp.asarray([0.0, 1.0, 0.0])]
        for k in range(3):
            pose = se3.make_pose(jnp.asarray([1.0, 0, 0, 0]),
                                 -centers[k])  # R=I -> t = -center
            feats = FrameFeatures(
                uv=jnp.zeros((F, 2)), xn_undist=jnp.zeros((F, 2)),
                response=jnp.ones(F), angle=jnp.zeros(F),
                octave=jnp.zeros(F, jnp.int32),
                desc=jnp.tile(per_kf_desc[k][None], (F, 1)),
                valid=jnp.arange(F) < 4)
            assoc = jnp.full(F, -1, jnp.int32).at[0].set(ids[0])
            m, _ = ms.insert_keyframe(m, pose, feats, assoc, k)

        # scramble the stored representative, then refresh
        m = m._replace(mp_desc=m.mp_desc.at[ids[0]].set(
            jnp.full(8, 0x0F0F0F0F, jnp.uint32)))
        m2 = ms.refresh_point_representatives(m)
        np.testing.assert_array_equal(np.asarray(m2.mp_desc[ids[0]]),
                                      np.asarray(descA))
        # mean viewing direction: average of unit(center->point) vectors
        dirs = [np.asarray(pt[0] - c) for c in centers]
        dirs = [d / np.linalg.norm(d) for d in dirs]
        mean = np.sum(dirs, axis=0)
        mean /= np.linalg.norm(mean)
        np.testing.assert_allclose(np.asarray(m2.mp_normal[ids[0]]),
                                   mean, atol=1e-5)

    def test_unobserved_points_untouched(self):
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.mapstore import map_state as ms
        m = ms.empty_map(4, 8, 16)
        m = m._replace(
            mp_valid=jnp.zeros(16, bool).at[3].set(True),
            mp_desc=m.mp_desc.at[3].set(jnp.full(8, 7, jnp.uint32)))
        m2 = ms.refresh_point_representatives(m)
        np.testing.assert_array_equal(np.asarray(m2.mp_desc[3]),
                                      np.full(8, 7, np.uint32))


class TestNAnchorHistory:
    def test_scale_aware_reconstruction(self):
        """When a Sim(3) correction rescales the anchors' separation, the
        frame's offset rescales with its sector (single-anchor
        reconstruction would keep the stale offset)."""
        import jax.numpy as jnp
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import pose_history as ph

        h = ph.empty_history(8)
        kf = jnp.stack([
            se3.make_pose(se3.quat_identity(), jnp.array([0.0, 0, 0])),
            se3.make_pose(se3.quat_identity(), jnp.array([-1.0, 0, 0]))])
        # frame halfway between the two keyframes (centers 0 and +1 in x)
        frame = se3.make_pose(se3.quat_identity(),
                              jnp.array([-0.5, 0.0, 0.0]))
        h = ph.add_pose(h, 5, 0.5, frame, jnp.array([0, 1]), kf)
        # a scale-1.5 correction moves keyframe 1's center from x=1 to 1.5
        kf_scaled = kf.at[1, 4].set(-1.5)
        poses, ok = ph.world_poses(h, kf_scaled, jnp.ones(2, bool))
        assert bool(ok[0])
        import numpy as np
        c = np.asarray(se3.camera_center(poses[0]))
        # scale-aware: the frame lands at the rescaled midpoint x=0.75
        np.testing.assert_allclose(c, [0.75, 0, 0], atol=1e-5)

    def test_single_anchor_unchanged(self):
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import pose_history as ph
        h = ph.empty_history(8)
        kf = jnp.stack([se3.pose_identity()])
        frame = se3.make_pose(se3.quat_identity(),
                              jnp.array([0.1, 0.0, 0.0]))
        h = ph.add_pose(h, 1, 0.1, frame, 0, kf)
        kf_new = kf.at[0, 4].add(1.0)
        poses, _ = ph.world_poses(h, kf_new, jnp.ones(1, bool))
        np.testing.assert_allclose(np.asarray(poses[0][4:]),
                                   [1.1, 0.0, 0.0], atol=1e-5)

    def test_inverse_distance_weighting(self):
        """The nearest anchor dominates the blend (HistoricalPose.cpp:87
        weight = 1/(eps + |offset|)): moving a FAR anchor perturbs the
        reconstruction far less than moving the near one."""
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import pose_history as ph

        kf = jnp.stack([
            se3.make_pose(se3.quat_identity(), jnp.array([-0.1, 0, 0])),
            se3.make_pose(se3.quat_identity(), jnp.array([-3.0, 0, 0]))])
        frame = se3.pose_identity()           # center at origin
        h = ph.empty_history(4)
        h = ph.add_pose(h, 1, 0.1, frame, jnp.array([0, 1]), kf)

        def center_after(kf_mod):
            poses, _ = ph.world_poses(h, kf_mod, jnp.ones(2, bool))
            return np.asarray(se3.camera_center(poses[0]))

        base = center_after(kf)
        # translate the FAR anchor 0.3 in y (scale ratio barely changes)
        far = center_after(kf.at[1, 5].add(-0.3))
        # translate the NEAR anchor 0.3 in y
        near = center_after(kf.at[0, 5].add(-0.3))
        d_far = np.linalg.norm(far - base)
        d_near = np.linalg.norm(near - base)
        assert d_near > 5 * d_far, (d_near, d_far)

    def test_seam_ramp_distribution(self):
        """A frame whose anchors straddle a correction seam gets a
        weighted INTERMEDIATE pose — the N-way blend ramps across the
        seam instead of jumping with one side (the r4 two-anchor gap that
        left rigid-mode fossils worse than no closure)."""
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import pose_history as ph

        # four anchors on a line; frame in the middle
        xs = [-1.0, -0.4, 0.4, 1.0]
        kf = jnp.stack([se3.make_pose(se3.quat_identity(),
                                      jnp.array([-x, 0.0, 0.0]))
                        for x in xs])
        frame = se3.pose_identity()
        h = ph.empty_history(4)
        h = ph.add_pose(h, 1, 0.1, frame, jnp.arange(4), kf)
        # rigid correction moves anchors 2,3 (one side of the seam) +1 y
        kf2 = kf.at[2, 5].add(-1.0).at[3, 5].add(-1.0)
        poses, ok = ph.world_poses(h, kf2, jnp.ones(4, bool))
        assert bool(ok[0])
        c = np.asarray(se3.camera_center(poses[0]))
        # blended y strictly between the two sides, near the middle
        assert 0.2 < c[1] < 0.8, c

    def test_duplicate_anchors_collapse(self):
        import jax.numpy as jnp
        import numpy as np
        from mageslam_tpu.geometry import se3
        from mageslam_tpu.mapstore import pose_history as ph
        kf = jnp.stack([se3.pose_identity(),
                        se3.make_pose(se3.quat_identity(),
                                      jnp.array([-1.0, 0, 0]))])
        frame = se3.make_pose(se3.quat_identity(),
                              jnp.array([-0.5, 0.0, 0.0]))
        h = ph.empty_history(4)
        h = ph.add_pose(h, 1, 0.1, frame, jnp.array([0, 0, 1, 1]), kf)
        a = np.asarray(h.anchor_kf[0])
        # duplicates dropped: exactly one slot per distinct anchor
        assert sorted(a[a >= 0].tolist()) == [0, 1], a
        poses, ok = ph.world_poses(h, kf, jnp.ones(2, bool))
        np.testing.assert_allclose(
            np.asarray(se3.camera_center(poses[0])), [0.5, 0, 0],
            atol=1e-5)
