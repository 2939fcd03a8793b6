"""End-to-end loop closure + relocalization through the fused engine.

The reference exercises these paths live (LoopClosureWorker.cpp:90-210
AttemptLoopClosure per keyframe; PoseEstimationWorker.cpp:74-97 lost-mode
BoW relocalization).  Here a ring-world loop trajectory is driven through
MageSlamTPUFused and must actually close a loop; an occluded segment must
push tracking through SKIPPED -> RELOCALIZING and recover.
"""

import numpy as np
import pytest

from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory, occlusion_frame)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_slam_e2e import fast_settings

N_LOOP = 150


def loop_settings():
    s = fast_settings()
    lc = s.loop_closure.__class__(
        enable_loop_closure=True, min_keyframe=10, min_cluster_size=2,
        min_feature_matches=25,
        bundle_adjust=s.loop_closure.bundle_adjust)
    return s.replace(loop_closure=lc)


def _drive(settings, imgs):
    cal = default_calibration()
    eng = MageSlamTPUFused(settings, cal, seed=1)
    for i, img in enumerate(imgs):
        eng.process_frame(img, timestamp=i / 30.0)
    results = eng.flush()
    fossil = eng.fossilize()
    return eng, results, fossil


def _ate(results, fossil, poses_gt):
    est, gt = [], []
    for i in range(len(poses_gt)):
        r = results.get(i)
        if r is not None and r.state == TrackingState.TRACKING:
            p = fossil.pose_for_frame(r.frame_id)
            if p is not None:
                est.append(p)
                gt.append(poses_gt[i])
    assert len(est) >= 0.5 * len(poses_gt)
    rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
    extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    return rmse, extent


@pytest.fixture(scope="module")
def ring_imgs():
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N_LOOP, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt)]
    return imgs, poses_gt


@pytest.fixture(scope="module")
def loop_run(ring_imgs):
    imgs, poses_gt = ring_imgs
    eng, results, fossil = _drive(loop_settings(), imgs)
    return eng, results, fossil, poses_gt


def _seam_covisibility(eng, poses_gt):
    """Shared map points between first-sector keyframes (frames < 30) and
    revisit keyframes (frames > N_LOOP - 30): nonzero means the loop seam
    is stitched into one covisible map."""
    import jax.numpy as jnp
    from mageslam_tpu.mapstore import map_state as ms
    m = eng.map_state
    mem = np.asarray(ms.member_matrix(m))
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    early = valid & (fid >= 0) & (fid < 30)
    late = valid & (fid > len(poses_gt) - 30)
    if not early.any() or not late.any():
        return 0
    return int((mem[early].any(0) & mem[late].any(0)).sum())


class TestLoopClosureE2E:
    def test_loop_closed(self, loop_run):
        """The loop seam must be CLOSED: either the formal loop-closure
        machinery fired, or cheap loop closure + tracking re-acquired the
        original sector's points (covisible seam).  When drift at revisit
        is below the matching radius the reference behaves the same way —
        CheapLoopClosure (MappingWorker.cpp:30-75) re-associates the old
        points and DetectLoop never sees a non-covisible cluster.  The
        formal path is exercised separately by TestFormalLoopClosure."""
        eng, results, fossil, poses_gt = loop_run
        assert eng.loops_closed >= 1 \
            or _seam_covisibility(eng, poses_gt) >= 10

    def test_tracks_through_loop(self, loop_run):
        eng, results, fossil, poses_gt = loop_run
        states = [results[i].state for i in range(N_LOOP)]
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= 0.75 * N_LOOP

    def test_ate_with_loop_closure_enabled(self, loop_run, ring_imgs):
        """Absolute accuracy with the full system (loop closure enabled)
        against the identical run without it.

        History: r2's version demanded rmse_lc <= rmse_off because the
        baseline then drifted 2+ m around the ring and loop closure was
        the only recourse.  r3's gauge fix (local_ba.py) eliminated the
        drift itself — both runs now land near 1.5% of extent, where the
        difference between them is run-to-run solver noise, not loop-
        closure quality.  The surviving guarantees: the full system stays
        within the hard absolute bar, and enabling loop closure must not
        meaningfully DAMAGE an already-consistent map.  The drift-
        REDUCTION property is proven where drift genuinely exists:
        TestFormalLoopClosure below."""
        imgs, poses_gt = ring_imgs
        eng, results, fossil, _ = loop_run
        rmse_lc, extent = _ate(results, fossil, poses_gt)

        s_off = loop_settings()
        s_off = s_off.replace(loop_closure=s_off.loop_closure.__class__(
            enable_loop_closure=False,
            bundle_adjust=s_off.loop_closure.bundle_adjust))
        eng2, results2, fossil2 = _drive(s_off, imgs)
        rmse_off, _ = _ate(results2, fossil2, poses_gt)
        assert eng2.loops_closed == 0
        # hard absolute bar (6% of an 8.5 m loop)
        assert rmse_lc < 0.06 * extent, (rmse_lc, extent)
        # non-degradation: the machinery must not WRECK a good map.  The
        # factor is calibrated to the measured run-to-run chaos spread of
        # healthy runs (1.4-3.7% of extent across RNG re-rolls); the
        # failure mode this clause exists for — a bad loop correction —
        # measured 10x+ degradation before the r3 fixes.
        assert rmse_lc <= max(2.0 * rmse_off, 0.03 * extent), \
            (rmse_lc, rmse_off)


class TestFormalLoopClosure:
    @pytest.mark.parametrize("use_pose_graph,bar", [
        (False, 0.25),   # reference semantics: rigid move + global BA
        (True, 0.06),    # Sim3 essential-graph relaxation (the solver
        #                  the reference ships unused)
    ])
    def test_ring_without_cheap_lc_stays_coherent(self, ring_imgs,
                                                  use_pose_graph, bar):
        """The ring with cheap loop closure disabled must stay coherent.

        History: through r3 this scenario drifted enough that the formal
        DetectLoop -> CloseLoop had to fire (and the test asserted it).
        r4's five-point bootstrap removed the organic drift (26% -> ~3%
        on the 300-frame variant) and the r4 churn guards correctly
        refuse to 'close' a loop whose correction would be noise-level
        (loop/closure.py near-identity skip) — so closure firing is no
        longer REQUIRED here, only coherence.  The detect-and-correct
        capability itself is now graded by fault injection where drift
        is guaranteed real: tests/test_loop_closure_wins.py."""
        import dataclasses
        imgs, poses_gt = ring_imgs
        s = loop_settings()
        s = s.replace(
            mapping=dataclasses.replace(s.mapping,
                                        use_cheap_loop_closure=False),
            loop_closure=dataclasses.replace(
                s.loop_closure, use_pose_graph=use_pose_graph),
            capacity=dataclasses.replace(s.capacity, max_keyframes=48))
        eng, results, fossil = _drive(s, imgs)
        rmse, extent = _ate(results, fossil, poses_gt)
        assert rmse < bar * extent, (rmse, extent, use_pose_graph)
        # if the machinery DID fire, it must not have wrecked the map
        assert rmse < 0.25 * extent


class TestRelocalizationE2E:
    def test_occlusion_recovery(self, ring_imgs):
        """Cover the lens for 8 frames mid-run: tracking must degrade to
        RELOCALIZING (after TrackingLostCountUntilReloc failures) and
        recover TRACKING shortly after the occlusion lifts."""
        imgs, poses_gt = ring_imgs
        cal = default_calibration()
        n, occ0, occ1 = 70, 42, 50
        seq = list(imgs[:occ0]) \
            + [occlusion_frame(cal, seed=i) for i in range(occ1 - occ0)] \
            + list(imgs[occ1:n])
        eng, results, fossil = _drive(loop_settings(), seq)
        states = [results[i].state for i in range(n)]
        # occluded frames: no poses; lost-mode reached
        assert TrackingState.RELOCALIZING in states[occ0:occ1 + 2]
        assert all(s != TrackingState.TRACKING
                   for s in states[occ0 + 1:occ1])
        # recovery within 6 frames of the occlusion lifting
        assert TrackingState.TRACKING in states[occ1:occ1 + 6]
        # and it keeps tracking afterwards
        tail = states[occ1 + 6:n]
        assert sum(s == TrackingState.TRACKING for s in tail) \
            >= 0.7 * len(tail)
