"""Loop closure must WIN where drift is real (VERDICT r3 next #3).

r3's loop e2e lost its teeth: after the gauge fix both LC-on and LC-off
runs landed near 1.5% of extent, so the relative clause degraded to
non-degradation.  This scenario restores the strict claim on a
trajectory where uncorrected drift is large: a 300-frame double-length
ring drive with cheap loop closure DISABLED (no implicit seam
stitching).  Calibrated on this rig (tools/debug_lc_wins.py):

    no LC:            ATE 2.21 m  = 26.0% of extent   (drift is real)
    rigid + globalBA: ATE 1.01 m  = 12.0%  (ratio 0.46 -> LC cuts >50%)

The reference-semantics correction (rigid covisible-set move + global
BA, LoopClosureWorker.cpp:164-210) must cut ATE by >=30%
(rmse_lc < 0.7 * rmse_off — the r2 clause, back with a scenario that
earns it).  The Sim3 pose-graph mode is exercised on the shorter ring in
test_e2e_loop_reloc.py::TestFormalLoopClosure; on THIS long-drift
scenario it re-closes repeatedly with smaller per-closure gain (measured
ratio 0.92), which is a known characterization, not the headline claim.
"""

import dataclasses

import numpy as np
import pytest

from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_e2e_loop_reloc import loop_settings

N = 300


@pytest.fixture(scope="module")
def long_ring():
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt)]
    return imgs, poses_gt


def _settings(lc_on: bool):
    s = loop_settings()
    return s.replace(
        mapping=dataclasses.replace(s.mapping,
                                    use_cheap_loop_closure=False),
        loop_closure=dataclasses.replace(
            s.loop_closure, enable_loop_closure=lc_on,
            use_pose_graph=False),
        capacity=dataclasses.replace(s.capacity, max_keyframes=64,
                                     pose_history_size=1024))


def _drive(settings, imgs, poses_gt):
    cal = default_calibration()
    eng = MageSlamTPUFused(settings, cal, seed=1)
    for i, img in enumerate(imgs):
        eng.process_frame(img, timestamp=i / 30.0)
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
    assert len(est) >= 0.75 * len(poses_gt)
    rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
    extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    return eng, rmse, extent


@pytest.fixture(scope="module")
def off_run(long_ring):
    imgs, poses_gt = long_ring
    return _drive(_settings(False), imgs, poses_gt)


@pytest.fixture(scope="module")
def lc_run(long_ring):
    imgs, poses_gt = long_ring
    return _drive(_settings(True), imgs, poses_gt)


class TestLoopClosureWins:
    def test_uncorrected_drift_is_real(self, off_run):
        """The scenario must EARN the relative clause: without loop
        closure the ring drive drifts at least 5% of extent (measured
        26% on this rig) — otherwise the comparison proves nothing."""
        eng, rmse_off, extent = off_run
        assert eng.loops_closed == 0
        assert rmse_off >= 0.05 * extent, (rmse_off, extent)

    def test_loop_closure_fires(self, lc_run):
        eng, _, _ = lc_run
        assert eng.loops_closed >= 1

    def test_loop_closure_cuts_ate(self, off_run, lc_run):
        """The strict r2 clause: correction must cut ATE by >= 30%."""
        _, rmse_off, extent = off_run
        _, rmse_lc, _ = lc_run
        assert rmse_lc < 0.7 * rmse_off, (rmse_lc, rmse_off)
        # and the corrected trajectory is globally coherent
        assert rmse_lc < 0.2 * extent, (rmse_lc, extent)
