"""Reference-scale long session: sustained operation through keyframe
culling churn at capacity (VERDICT r4 #2).

The reference budgets 10,000 poses ~ 5.5 minutes (MageSettings.h:212)
with a 60-frame keyframe cadence gate (MageSettings.h:84) and continuous
keyframe culling (ThreadSafeMap.cpp:1049-1130).  Prior rounds never
drove more than 150 frames; this suite drives the fused engine through
a 640-frame slow double loop — per-frame motion ~4x slower than the
150-frame ring fixture, so the keyframe cadence gate is actually
load-bearing — with a keyframe capacity SMALLER than the keyframes the
drive wants to create, so slot recycling, history re-anchoring, and
culling churn run continuously for hundreds of frames.

Asserted: sustained tracking across the whole session (no terminal
loss), keyframe creation well beyond capacity (churn is real), bounded
fossil ATE at the end, and stable array shapes (fixed-capacity model
held).  Matches console.cpp:291-341 (long pre-recorded drive) +
ThreadSafeMap culling churn.
"""

import numpy as np
import pytest

from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_e2e_loop_reloc import loop_settings

N = 640           # two slow revolutions: frame-to-frame motion ~4x
FRACTION = 2.24   # slower than the 150-frame e2e ring fixture
KF_CAP = 40       # deliberately below the keyframes the drive creates


def long_settings():
    s = loop_settings()
    return s.replace(
        # slow motion makes a LONG cadence gate meaningful — 10 frames
        # here corresponds to the same per-keyframe baseline as ~2-3 on
        # the fast ring (the reference's 60 assumes its golden-path
        # walking pace, MageSettings.h:84)
        keyframe=s.keyframe.__class__(
            min_frame_count=10, min_frame_count_reloc=3,
            min_tracking_point_count=15),
        capacity=s.capacity.__class__(
            max_features=320, max_keyframes=KF_CAP, max_map_points=2048,
            local_ba_keyframes=8, local_ba_points=512,
            pose_history_size=1024),
    )


@pytest.fixture(scope="module")
def long_run():
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N, radius=3.0, fraction=FRACTION)
    eng = MageSlamTPUFused(long_settings(), cal, seed=1)
    for i, p in enumerate(poses_gt):
        img = world.render(cal, p, seed=100 + i)
        eng.process_frame(img, timestamp=i / 30.0)
    results = eng.flush()
    fossil = eng.fossilize()
    return eng, results, fossil, poses_gt


class TestLongSession:
    def test_sustained_tracking(self, long_run):
        """No terminal loss: tracking must persist to the END of the
        session, and the overall tracked fraction must stay high."""
        eng, results, fossil, poses_gt = long_run
        states = [results[i].state if i in results else None
                  for i in range(N)]
        tracked = [s == TrackingState.TRACKING for s in states]
        assert sum(tracked) >= 0.85 * N, sum(tracked)
        # the last 50 frames still track (the session did not die early)
        assert sum(tracked[-50:]) >= 40, sum(tracked[-50:])

    def test_culling_churn_at_capacity(self, long_run):
        """Keyframe creation far exceeds capacity: slot recycling and
        history re-anchoring ran continuously (ThreadSafeMap.cpp:
        1049-1130 churn)."""
        eng, *_ = long_run
        m = eng._state.map
        ever = int(m.num_kf_ever)
        alive = int(np.asarray(m.kf_valid).sum())
        assert ever >= 1.5 * KF_CAP, ever     # churn is real
        assert alive <= KF_CAP                # capacity held

    def test_shapes_stable(self, long_run):
        """Fixed-capacity model held for the whole session."""
        eng, *_ = long_run
        m = eng._state.map
        assert m.kf_valid.shape[0] == KF_CAP
        h = eng._state.history
        assert h.valid.shape[0] == 1024
        # the deep history actually filled (ring wrapped or near-full)
        assert int(np.asarray(h.valid).sum()) >= 600

    def test_fossil_ate_bounded(self, long_run):
        """Sim3-aligned full-trajectory fossil ATE stays bounded after
        two revolutions with continuous culling (<= 8% of extent; the
        150-frame ring fixture holds ~2-6%, and a long culled session
        with a 40-slot map is the strictly harder workload)."""
        eng, results, fossil, poses_gt = long_run
        est, gt = [], []
        for i in range(N):
            r = results.get(i)
            if r is not None and r.state == TrackingState.TRACKING:
                p = fossil.pose_for_frame(r.frame_id)
                if p is not None:
                    est.append(p)
                    gt.append(poses_gt[i])
        assert len(est) >= 0.7 * N
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
        extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
        assert rmse <= 0.08 * extent, (rmse, extent)
