"""End-to-end SLAM tests on synthetic sequences: init -> track -> map -> BA.

The integration layer the reference never shipped (SURVEY.md §4): golden-path
runs with ATE measured against synthetic ground truth.
"""

import numpy as np
import pytest

from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState


def fast_settings() -> MageSlamSettings:
    """Settings tuned for small synthetic tests: modest feature budget,
    keyframes allowed frequently (synthetic sequences are short)."""
    s = MageSlamSettings()
    s = s.replace(
        keyframe=s.keyframe.__class__(min_frame_count=3,
                                      min_frame_count_reloc=3,
                                      min_tracking_point_count=15),
        track_local_map=s.track_local_map.__class__(
            min_tracked_feature_count=10),
        capacity=s.capacity.__class__(
            max_features=320, max_keyframes=32, max_map_points=2048,
            local_ba_keyframes=8, local_ba_points=512,
            pose_history_size=512),
    )
    mono = s.mono
    fe = mono.camera.features.__class__(num_features=320, fast_threshold=10)
    cam = mono.camera.__class__(features=fe)
    init = mono.map_init.__class__(
        min_feature_matches=40, min_scoring_inliers=20,
        min_initial_map_points=15, min_map_points=20,
        max_parallax_3d_median_distance=60.0,
        min_initialization_interval_ms=100,
        max_initialization_interval_ms=600)
    s = s.replace(mono=mono.__class__(camera=cam, map_init=init))
    return s


@pytest.fixture(scope="module")
def slam_run():
    """One shared 45-frame synthetic run (compile cost amortized)."""
    world = SyntheticWorld.create(700, seed=3)
    cal = default_calibration()
    poses_gt = orbit_trajectory(45, radius=2.0, forward=0.02, sweep=0.9)
    engine = MageSlamTPU(fast_settings(), cal, seed=1)
    results = []
    for i, p in enumerate(poses_gt):
        img = world.render(cal, p, seed=500 + i)
        results.append(engine.process_frame(img, timestamp=i / 30.0))
    fossil = engine.fossilize()
    return engine, results, fossil, poses_gt


class TestEndToEnd:
    def test_initializes_and_tracks(self, slam_run):
        engine, results, fossil, poses_gt = slam_run
        states = [r.state for r in results]
        assert TrackingState.TRACKING in states
        first_track = states.index(TrackingState.TRACKING)
        assert first_track < 15
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= 0.8 * (len(states) - first_track)

    def test_map_grows(self, slam_run):
        engine, *_ = slam_run
        assert engine.num_keyframes >= 3
        assert engine.num_map_points >= 30

    def test_ate_vs_ground_truth(self, slam_run):
        engine, results, fossil, poses_gt = slam_run
        est, gt = [], []
        for r in results:
            if r.state == TrackingState.TRACKING and r.pose is not None:
                p = fossil.pose_for_frame(r.frame_id)
                if p is not None:
                    est.append(p)
                    gt.append(poses_gt[r.frame_id])
        assert len(est) >= 20
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
        traj_extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
        # ATE under 5% of trajectory extent on this easy synthetic scene
        assert rmse < 0.05 * traj_extent, (rmse, traj_extent)

    def test_fossilize_exports(self, slam_run, tmp_path):
        engine, results, fossil, poses_gt = slam_run
        csv = tmp_path / "fossil.csv"
        fossil.export_csv(str(csv))
        lines = csv.read_text().strip().splitlines()
        assert len(lines) == len(fossil.frame_ids)
        assert len(lines[0].split(",")) == 17  # frame id + 4x4
        tum = tmp_path / "traj.tum"
        fossil.export_tum(str(tum))
        assert len(tum.read_text().strip().splitlines()) == len(lines)

    def test_get_tracking_results(self, slam_run):
        engine, results, fossil, poses_gt = slam_run
        tracked_ids = [r.frame_id for r in results
                       if r.state == TrackingState.TRACKING]
        out = engine.get_tracking_results_for_frames(tracked_ids[:5])
        assert all(o.pose is not None for o in out[1:])
