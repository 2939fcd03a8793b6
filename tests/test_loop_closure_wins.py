"""Loop closure must WIN where drift is real (VERDICT r3 next #3).

History: r2's ring drifted 2+ m organically; r3's gauge fix cut that to
~1.5-3%; r4's five-point bootstrap cut it further (300-frame ring,
cheap-LC off: 26% -> 3.3%).  Organic drift no longer reaches a level
where a correction is measurable above run-to-run chaos, so this suite
grades the correction machinery by FAULT INJECTION: drive the ring
normally, inject a known GRADUAL Sim(3) drift (rotation + translation +
scale ramped over 60 frames — locally consistent, globally wrong, the
structure of real accumulated drift) into the map, and require the
closure machinery to repair it.

Three layers of claim, strongest to weakest:
  1. component-level: on the drifted final map, DetectLoop -> rigid
     correction -> merge -> global BA must cut the keyframe ATE by
     >= 40% (measured 0.34 -> 0.08, a 4.3x cut).  Also the pose-graph
     mode (>= 30%).
  2. live integration: with loop closure enabled, the mid-drive closure
     must fire during the revisit and cut the map's keyframe ATE by
     >= 30% (measured 0.44 -> 0.18 across the closure frames).
  3. the no-closure baseline must show the injected drift is real
     (>= 3% of extent) — the scenario earns the comparison.

The full-trajectory fossil ATE under ADVERSARIAL scale drift (1.25x)
remains chaotic run-to-run (per-frame anchored history composes with
sector rescales; see BASELINE.md r4 loop-closure notes) and is
deliberately not asserted here; the r4 fixes it DID drive are in the
engines (fresh post-correction lambda, nearest-keyframe history anchors,
median scale, near-identity churn guards, 2-hop detection exclusion).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.geometry import se3, sim3
from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_e2e_loop_reloc import loop_settings

N = 150
INJECT_AT = 100          # frame where drift is injected
AFFECT_AFTER = 40        # ramp start (frame id)
DRIFT_ROT = 0.1          # rad
DRIFT_T = np.array([0.55, 0.1, -0.3], np.float32)
DRIFT_SCALE = 1.25


@pytest.fixture(scope="module")
def ring_imgs():
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt)]
    return imgs, poses_gt


def _settings(lc_on: bool, use_pg: bool = False):
    s = loop_settings()
    return s.replace(
        mapping=dataclasses.replace(s.mapping,
                                    use_cheap_loop_closure=False),
        loop_closure=dataclasses.replace(
            s.loop_closure, enable_loop_closure=lc_on,
            use_pose_graph=use_pg),
        capacity=dataclasses.replace(s.capacity, max_keyframes=48))


def _inject_drift(eng):
    """GRADUAL drift: keyframe i gets D(alpha_i), alpha ramping 0 -> 1
    between AFFECT_AFTER and INJECT_AT; anchored landmarks follow; the
    motion-model priors get the full D.  (A step discontinuity would be
    healed by the next few local-BA windows; the ramp is locally
    consistent but globally wrong — real drift's structure.)"""
    st = eng._state
    m = st.map
    ramp = float(INJECT_AT - AFFECT_AFTER)

    def D_of(alpha):
        return sim3.make_sim3(
            se3.so3_exp(jnp.array([0.0, DRIFT_ROT, 0.0]) * alpha),
            jnp.asarray(DRIFT_T) * alpha,
            jnp.float32(DRIFT_SCALE ** alpha))

    def drift_view(pose, alpha):
        s_ = sim3.sim3_compose(sim3.sim3_from_se3(pose, 1.0),
                               sim3.sim3_inverse(D_of(alpha)))
        return se3.make_pose(sim3.sim3_q(s_),
                             sim3.sim3_t(s_) / sim3.sim3_s(s_))

    fid = np.asarray(m.kf_frame_id)
    alphas = np.clip((fid - AFFECT_AFTER) / ramp, 0.0, 1.0)
    new_poses = np.asarray(m.kf_pose).copy()
    for k in range(len(fid)):
        if bool(np.asarray(m.kf_valid)[k]) and alphas[k] > 0:
            new_poses[k] = np.asarray(drift_view(m.kf_pose[k],
                                                 float(alphas[k])))
    K = m.kf_valid.shape[0]
    anchor = np.clip(np.asarray(m.mp_anchor_kf), 0, K - 1)
    mp_alpha = alphas[anchor]
    new_pts = np.asarray(m.mp_pos).copy()
    mp_aff = np.asarray(m.mp_valid) & (mp_alpha > 0) \
        & (np.asarray(m.mp_anchor_kf) >= 0)
    for li in np.nonzero(mp_aff)[0]:
        new_pts[li] = np.asarray(sim3.sim3_apply(
            D_of(float(mp_alpha[li])), m.mp_pos[li][None]))[0]
    eng._state = st._replace(
        map=m._replace(kf_pose=jnp.asarray(new_poses, jnp.float32),
                       mp_pos=jnp.asarray(new_pts, jnp.float32)),
        pose_prev=drift_view(st.pose_prev, 1.0),
        pose_prev2=drift_view(st.pose_prev2, 1.0))


def _kf_ate(m, poses_gt):
    """Sim3-aligned ATE over the map's keyframes (vs gt by frame id)."""
    fid = np.asarray(m.kf_frame_id)
    v = np.asarray(m.kf_valid)
    est = [np.asarray(m.kf_pose[k]) for k in np.nonzero(v)[0]]
    gt = [poses_gt[fid[k]] for k in np.nonzero(v)[0]]
    return ate_rmse(np.asarray(est), np.asarray(gt))[0]


def _drive(settings, imgs, poses_gt, fetch_every=8, watch_closures=False):
    cal = default_calibration()
    eng = MageSlamTPUFused(settings, cal, seed=1,
                           fetch_every=fetch_every)
    pre_close_ate = None
    loops_prev = 0
    for i, img in enumerate(imgs):
        if i == INJECT_AT:
            eng.flush()
            eng._settle()
            _inject_drift(eng)
        eng.process_frame(img, timestamp=i / 30.0)
        if watch_closures:
            eng.flush()
            # pre_close_ate = the map's drift just BEFORE the first
            # closure fires (it keeps growing along the ramp, so sample
            # continuously until then)
            if i >= INJECT_AT and eng.loops_closed == 0:
                pre_close_ate = _kf_ate(eng._state.map, poses_gt)
            if eng.loops_closed != loops_prev:
                loops_prev = eng.loops_closed
    results = eng.flush()
    fossil = eng.fossilize()
    est, gt = [], []
    for i in range(len(poses_gt)):
        r = results.get(i)
        if r is not None and r.state == TrackingState.TRACKING:
            p = fossil.pose_for_frame(r.frame_id)
            if p is not None:
                est.append(p)
                gt.append(poses_gt[i])
    assert len(est) >= 0.6 * len(poses_gt)
    rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
    extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    return eng, rmse, extent, pre_close_ate


@pytest.fixture(scope="module")
def off_run(ring_imgs):
    imgs, poses_gt = ring_imgs
    return _drive(_settings(False), imgs, poses_gt)


class TestInjectedDriftBaseline:
    def test_injected_drift_is_real(self, off_run):
        eng, rmse_off, extent, _ = off_run
        assert eng.loops_closed == 0
        assert rmse_off >= 0.03 * extent, (rmse_off, extent)


class TestClosureComponentWins:
    """Layer 1: on the drifted LC-off final map, the full closure
    pipeline must cut the keyframe ATE decisively."""

    @pytest.fixture(scope="class")
    def closed_maps(self, off_run, ring_imgs):
        from mageslam_tpu.bow import database as bdb
        from mageslam_tpu.loop import closure as lc
        from mageslam_tpu.mapping import global_ba

        imgs, poses_gt = ring_imgs
        eng = off_run[0]
        st = eng._state
        m = st.map
        cal = default_calibration()
        s = _settings(True)
        fid = np.asarray(m.kf_frame_id)
        v = np.asarray(m.kf_valid)
        slot = int(np.nonzero(v)[0][np.argmax(fid[v])])
        db = bdb.BowDatabase(st.vocab, st.kf_sig, st.kf_sig_valid)
        det = lc.detect_loop(jax.random.key(7), m, db, slot,
                             s.loop_closure, s.relocalization,
                             float(cal.fx))
        assert bool(det.found), "detection must fire on the drifted map"
        px = 1.0 / float(cal.fx)
        ba = s.loop_closure.bundle_adjust
        out = {}
        for name, corr in (
                ("rigid", lambda: lc.apply_similarity_correction(
                    m, slot, det)),
                ("pg", lambda: lc.pose_graph_loop_correction(
                    m, slot, det,
                    num_steps=int(s.loop_closure.pose_graph_steps),
                    min_covis=int(s.loop_closure.pose_graph_min_covis)))):
            m2 = lc.merge_loop_points(corr(), slot, det, cal,
                                      s.loop_closure)
            m3, _ = global_ba.global_bundle_adjust(
                m2, jnp.float32(ba.huber_width * px),
                jnp.float32(ba.max_outlier_error * px),
                num_steps=25, lam0=1e-4)
            out[name] = m3
        return m, out, det, poses_gt

    def test_scale_estimate(self, closed_maps):
        """Median depth-ratio scale must recover the injected 1/1.25."""
        _, _, det, _ = closed_maps
        assert abs(float(det.scale) - 1.0 / DRIFT_SCALE) < 0.15, \
            float(det.scale)

    def test_rigid_correction_cuts_kf_ate(self, closed_maps):
        m, out, _, poses_gt = closed_maps
        before = _kf_ate(m, poses_gt)
        after = _kf_ate(out["rigid"], poses_gt)
        assert after < 0.6 * before, (before, after)

    def test_pose_graph_correction_cuts_kf_ate(self, closed_maps):
        m, out, _, poses_gt = closed_maps
        before = _kf_ate(m, poses_gt)
        after = _kf_ate(out["pg"], poses_gt)
        assert after < 0.7 * before, (before, after)


class TestClosureLiveWins:
    """Layer 2: the ENGINE's own mid-drive closure must fire during the
    revisit and cut the map's keyframe ATE."""

    def test_live_closure_improves_map(self, ring_imgs):
        imgs, poses_gt = ring_imgs
        eng, _, _, pre_close_ate = _drive(
            _settings(True), imgs, poses_gt, fetch_every=1,
            watch_closures=True)
        assert eng.loops_closed >= 1
        final = _kf_ate(eng._state.map, poses_gt)
        assert final < 0.7 * pre_close_ate, (pre_close_ate, final)


class TestClosureTrajectoryWins:
    """Layer 4 (r5): the system's actual OUTPUT — the full-trajectory
    FOSSIL — must come out at least as good with loop closure as without,
    in BOTH correction modes, under the injected Sim(3) drift.  This was
    r4's documented 'known limitation' (rigid-mode fossil 1.33 vs 0.34
    without closure): per-frame history anchored to <= 2 keyframes
    sheared across the correction seam.  The r5 N-anchor inverse-
    distance-weighted history (mapstore/pose_history.py) re-interpolates
    every frame from up to 4 keyframes exactly like the reference
    (PoseHistory.cpp:34-52, HistoricalPose.cpp:78-130), and fossilize
    now runs the final BA to its error floor (global_ba_to_floor)."""

    @pytest.mark.parametrize("use_pg", [False, True], ids=["rigid", "pg"])
    def test_fossil_trajectory_not_worse(self, off_run, ring_imgs,
                                         use_pg):
        imgs, poses_gt = ring_imgs
        _, rmse_off, extent, _ = off_run
        eng, rmse_on, _, _ = _drive(_settings(True, use_pg), imgs,
                                    poses_gt)
        assert eng.loops_closed >= 1
        assert rmse_on <= rmse_off, (rmse_on, rmse_off)
