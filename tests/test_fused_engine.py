"""Fused device engine e2e: parity with the host-orchestrated runtime."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from tests.test_slam_e2e import fast_settings


@pytest.fixture(scope="module")
def fused_run():
    world = SyntheticWorld.create(700, seed=3)
    cal = default_calibration()
    poses_gt = orbit_trajectory(45, radius=2.0, forward=0.02, sweep=0.9)
    engine = MageSlamTPUFused(fast_settings(), cal, seed=1)
    for i, p in enumerate(poses_gt):
        img = world.render(cal, p, seed=500 + i)
        engine.process_frame(img, timestamp=i / 30.0)
    results = engine.flush()
    fossil = engine.fossilize()
    return engine, results, fossil, poses_gt


class TestFusedEngine:
    def test_tracks(self, fused_run):
        engine, results, fossil, poses_gt = fused_run
        states = [results[i].state for i in range(len(poses_gt))]
        assert TrackingState.TRACKING in states
        first = states.index(TrackingState.TRACKING)
        assert first < 15
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= 0.85 * (len(states) - first)

    def test_map_grows(self, fused_run):
        engine, *_ = fused_run
        assert engine.num_keyframes >= 3
        assert engine.num_map_points >= 30

    def test_ate(self, fused_run):
        engine, results, fossil, poses_gt = fused_run
        est, gt = [], []
        for i in range(len(poses_gt)):
            r = results[i]
            if r.state == TrackingState.TRACKING:
                p = fossil.pose_for_frame(r.frame_id)
                if p is not None:
                    est.append(p)
                    gt.append(poses_gt[r.frame_id])
        assert len(est) >= 20
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
        extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
        assert rmse < 0.05 * extent, (rmse, extent)

    def test_pending_results_resolve(self, fused_run):
        engine, results, fossil, poses_gt = fused_run
        # every frame has a resolved result after flush
        assert all(i in results for i in range(len(poses_gt)))

    def test_checkpoint_roundtrip(self, fused_run, tmp_path):
        from mageslam_tpu.io import serialization
        engine, *_ = fused_run
        p = str(tmp_path / "ck.npz")
        serialization.save_state(p, engine._state)
        from mageslam_tpu.runtime import device_engine as de
        st2 = serialization.load_state(
            p, de.empty_state(engine.settings))
        assert int(jnp.sum(st2.map.kf_valid)) == engine.num_keyframes
