"""Loop closure tests: detection on a revisit, Sim3 correction, merging."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.bow import database as bdb
from mageslam_tpu.bow import vocab as bv
from mageslam_tpu.config import LoopClosureSettings, RelocalizationSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.loop import closure
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.solvers import pnp
from mageslam_tpu.tracking.frontend import FrameFeatures

K, F, L = 32, 128, 1024
FX = 272.0


def make_scene_features(rng, pts, pose, desc):
    """Feature snapshot of pts viewed from pose with given descriptors."""
    xn, z = pnp.project_normalized(pose, jnp.asarray(pts))
    n = pts.shape[0]
    uv = jnp.stack([xn[:, 0] * FX + 160.0, xn[:, 1] * FX + 90.0], -1)
    return FrameFeatures(
        uv=jnp.zeros((F, 2)).at[:n].set(uv),
        xn_undist=jnp.zeros((F, 2)).at[:n].set(xn),
        response=jnp.ones(F), angle=jnp.zeros(F),
        octave=jnp.zeros(F, jnp.int32),
        desc=desc,
        valid=jnp.arange(F) < n)


def build_loop_scenario(rng, drift_scale=1.15, drift_t=(0.4, 0.0, 0.2)):
    """A map where keyframes 0-2 saw a place, keyframes 6-8 revisit the SAME
    place (same descriptors) but with drifted poses + scale, observing
    duplicate landmarks.  Keyframes 3-5 are elsewhere (no shared points), so
    the revisit is non-covisible with the origin."""
    n = 80
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 8, n)], -1).astype(np.float32)
    place_desc = jnp.asarray(
        rng.integers(0, 2**32, (F, 8), dtype=np.uint32))
    far_pts = pts + np.array([50.0, 0.0, 0.0], np.float32)
    far_desc = jnp.asarray(
        rng.integers(0, 2**32, (F, 8), dtype=np.uint32))

    m = ms.empty_map(K, F, L)
    # original visit: keyframes 0-2 see `pts` with place_desc
    m, ids_a = ms.allocate_map_points(
        m, jnp.asarray(pts), place_desc[:n],
        jnp.asarray(pts / np.linalg.norm(pts, axis=1, keepdims=True)),
        0, jnp.ones(n, bool))
    poses_true = []
    for k in range(3):
        pose = se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.05 * k, 0.0])),
                             jnp.array([0.3 * k, 0.0, 0.0]))
        poses_true.append(pose)
        f = make_scene_features(rng, pts, pose, place_desc)
        assoc = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids_a)
        m, _ = ms.insert_keyframe(m, pose, f, assoc, k)

    # elsewhere: keyframes 3-5 see far_pts (breaks covisibility)
    m, ids_b = ms.allocate_map_points(
        m, jnp.asarray(far_pts), far_desc[:n],
        jnp.zeros((n, 3)), 3, jnp.ones(n, bool))
    for k in range(3, 6):
        pose = se3.make_pose(se3.quat_identity(),
                             jnp.array([-50.0 + 0.3 * k, 0.0, 0.0]))
        f = make_scene_features(rng, far_pts, pose, far_desc)
        assoc = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids_b)
        m, _ = ms.insert_keyframe(m, pose, f, assoc, k)

    # revisit with drift: keyframes 6-8 see the SAME pts/descriptors but
    # the mapping created DUPLICATE landmarks at drifted positions
    g = np.asarray(drift_t, np.float32)
    drifted_pts = (pts * drift_scale + g).astype(np.float32)
    m, ids_c = ms.allocate_map_points(
        m, jnp.asarray(drifted_pts), place_desc[:n],
        jnp.zeros((n, 3)), 6, jnp.ones(n, bool))
    drifted_poses = []
    for k in range(3):
        true_pose = poses_true[k]
        # drifted view pose consistent with the drifted points: the view
        # sees drifted_pts exactly where true poses saw pts (scaled depth)
        q = se3.pose_q(true_pose)
        t = se3.pose_t(true_pose) * drift_scale \
            - se3.quat_rotate(q, jnp.asarray(g))
        dpose = se3.make_pose(q, t)
        drifted_poses.append(dpose)
        f = make_scene_features(rng, drifted_pts, dpose, place_desc)
        assoc = jnp.full(F, -1, jnp.int32).at[jnp.arange(n)].set(ids_c)
        m, _ = ms.insert_keyframe(m, dpose, f, assoc, 6 + k)

    # BoW database over all keyframes
    pool = jnp.concatenate([place_desc, far_desc])
    vocab = bv.train_vocabulary(jax.random.key(0), pool,
                                jnp.ones(pool.shape[0], bool), iters=6)
    db = bdb.empty_database(K)._replace(vocab=vocab)
    for k in range(9):
        db = bdb.add_keyframe(db, k, m.kf_desc[k], m.kf_feat_valid[k])
    return m, db, poses_true, drifted_poses, pts, ids_a, ids_c


class TestLoopClosure:
    def test_detect_and_correct(self, rng):
        m, db, poses_true, drifted_poses, pts, ids_a, ids_c = \
            build_loop_scenario(rng)
        lc = LoopClosureSettings(min_cluster_size=2, min_feature_matches=15,
                                 min_frame_gap=0)
        rs = RelocalizationSettings()
        det = closure.detect_loop(jax.random.key(1), m, db, 8, lc, rs, FX)
        assert bool(det.found)
        assert int(det.loop_kf) in (0, 1, 2)
        # scale must be recovered (old/current = 1/1.15)
        assert abs(float(det.scale) - 1.0 / 1.15) < 0.1

        m2 = closure.apply_similarity_correction(m, 8, det)
        # the revisit keyframe's pose must now match the original place
        # frame: reproject original pts through corrected kf8 pose and
        # compare against its stored measurements
        xn_expect, _ = pnp.project_normalized(m2.kf_pose[8],
                                              jnp.asarray(pts))
        stored = m2.kf_xn[8][:80]
        err = np.asarray(jnp.linalg.norm(xn_expect - stored, axis=-1)) * FX
        assert np.median(err) < 6.0, np.median(err)  # global BA polishes after

        # duplicated landmarks moved close to the originals
        d = np.asarray(jnp.linalg.norm(
            m2.mp_pos[ids_c] - jnp.asarray(pts), axis=-1))
        assert np.median(d) < 0.2, np.median(d)

    def test_merge_dedupes(self, rng):
        from mageslam_tpu.io.synthetic import default_calibration
        m, db, poses_true, drifted_poses, pts, ids_a, ids_c = \
            build_loop_scenario(rng)
        lc = LoopClosureSettings(min_cluster_size=2, min_feature_matches=15,
                                 min_frame_gap=0)
        rs = RelocalizationSettings()
        det = closure.detect_loop(jax.random.key(1), m, db, 8, lc, rs, FX)
        m2 = closure.apply_similarity_correction(m, 8, det)
        n_before = int(jnp.sum(m2.mp_valid))
        cal = default_calibration()
        m3 = closure.merge_loop_points(m2, 8, det, cal, lc)
        n_after = int(jnp.sum(m3.mp_valid))
        assert n_after < n_before  # duplicates merged
        # kf8 associations now point at the ORIGINAL landmarks
        assoc8 = np.asarray(m3.kf_assoc[8][:80])
        orig = set(np.asarray(ids_a).tolist())
        frac_orig = np.mean([a in orig for a in assoc8 if a >= 0])
        assert frac_orig > 0.5

    def test_no_loop_on_distinct_place(self, rng):
        m, db, *_ = build_loop_scenario(rng)
        lc = LoopClosureSettings(min_cluster_size=2, min_feature_matches=15,
                                 min_frame_gap=0)
        rs = RelocalizationSettings()
        # keyframe 4 is in the far place; its BoW matches are its own
        # covisible set (excluded) -> no loop
        det = closure.detect_loop(jax.random.key(2), m, db, 4, lc, rs, FX)
        assert not bool(det.found)


class TestPoseGraphLoopCorrection:
    def test_propagates_and_matches_similarity_on_covisible(self, rng):
        m, db, poses_true, drifted_poses, pts, ids_a, ids_c = \
            build_loop_scenario(rng)
        lc = LoopClosureSettings(min_cluster_size=2, min_feature_matches=15,
                                 min_frame_gap=0)
        rs = RelocalizationSettings()
        det = closure.detect_loop(jax.random.key(1), m, db, 8, lc, rs, FX)
        assert bool(det.found)
        m_sim = closure.apply_similarity_correction(m, 8, det)
        m_pg = closure.pose_graph_loop_correction(m, 8, det, num_steps=10)
        # covisible (fixed) keyframes: identical to the similarity move
        for k in (6, 7, 8):
            np.testing.assert_allclose(np.asarray(m_pg.kf_pose[k]),
                                       np.asarray(m_sim.kf_pose[k]),
                                       atol=1e-4)
        # old cluster fixed too
        for k in (0, 1, 2):
            np.testing.assert_allclose(np.asarray(m_pg.kf_pose[k]),
                                       np.asarray(m.kf_pose[k]), atol=1e-4)
        # the revisit keyframe still reprojects the original points
        xn_expect, _ = pnp.project_normalized(m_pg.kf_pose[8],
                                              jnp.asarray(pts))
        err = np.asarray(jnp.linalg.norm(
            xn_expect - m_pg.kf_xn[8][:80], axis=-1)) * FX
        assert np.median(err) < 6.0
        # free keyframes (3-5) moved to satisfy essential-graph constraints
        # and remain finite
        assert np.isfinite(np.asarray(m_pg.kf_pose)).all()
        assert np.isfinite(np.asarray(m_pg.mp_pos)).all()

    def test_not_found_is_identity(self, rng):
        m, db, *_ = build_loop_scenario(rng)
        lc = LoopClosureSettings(min_cluster_size=2, min_feature_matches=15,
                                 min_frame_gap=0)
        rs = RelocalizationSettings()
        det = closure.detect_loop(jax.random.key(2), m, db, 4, lc, rs, FX)
        assert not bool(det.found)
        m2 = closure.pose_graph_loop_correction(m, 4, det, num_steps=5)
        np.testing.assert_allclose(np.asarray(m2.kf_pose),
                                   np.asarray(m.kf_pose), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2.mp_pos),
                                   np.asarray(m.mp_pos), atol=1e-5)


class TestCheapLoopClosure:
    def test_reassociates_distant_points(self, rng):
        """A keyframe revisiting the first place (SAME landmark ids exist,
        but the new keyframe has no associations to them) gets stitched to
        the distant structure."""
        from mageslam_tpu.mapping.cheap_loop_closure import cheap_loop_closure
        from mageslam_tpu.io.synthetic import default_calibration

        m, db, poses_true, drifted_poses, pts, ids_a, ids_c = \
            build_loop_scenario(rng, drift_scale=1.0, drift_t=(0, 0, 0))
        # drop kf8's own associations so its features are unassociated and
        # point directly at the ORIGINAL landmarks' projections (no drift)
        m = m._replace(kf_assoc=m.kf_assoc.at[8].set(-1))
        cal = default_calibration()
        lc = LoopClosureSettings(match_search_radius=12.0)
        res = cheap_loop_closure(m, 8, cal, lc, min_matches=10)
        assert bool(res.applied)
        assert int(res.num_connected) >= 20
        # the new associations point at ORIGINAL (distant) landmarks
        assoc = np.asarray(res.map.kf_assoc[8])
        orig = set(np.asarray(ids_a).tolist())
        hits = [a for a in assoc if a >= 0]
        assert len(hits) >= 20
        assert np.mean([a in orig for a in hits]) > 0.9

    def test_below_threshold_is_noop(self, rng):
        from mageslam_tpu.mapping.cheap_loop_closure import cheap_loop_closure
        from mageslam_tpu.io.synthetic import default_calibration

        m, db, *_ = build_loop_scenario(rng)
        cal = default_calibration()
        # keyframe 4 is in the far place: the original-place points project
        # far outside its image, so nothing distant can match
        lc = LoopClosureSettings(match_search_radius=6.0)
        res = cheap_loop_closure(m, 4, cal, lc, min_matches=10)
        assert not bool(res.applied)
        np.testing.assert_array_equal(np.asarray(res.map.kf_assoc),
                                      np.asarray(m.kf_assoc))
