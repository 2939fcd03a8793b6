"""Public API parity tests, parametrized over BOTH engine façades
(MageSlam.h:156-182 surface): stereo bootstrap, sensor samples, VOI query,
tracking-results-for-frames.  The host engine (runtime/slam.py) and the
fused device engine (runtime/fused.py) must expose the same behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.fuser.samples import SensorSample
from mageslam_tpu.geometry import se3
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState

from tests.test_slam_e2e import fast_settings

ENGINES = [MageSlamTPU, MageSlamTPUFused]


@pytest.fixture(params=ENGINES, ids=["host", "fused"])
def engine_cls(request):
    return request.param


class TestStereoAPI:
    def test_process_stereo_frames_bootstraps_metric_map(self, engine_cls):
        s = fast_settings()
        world = SyntheticWorld.create(700, seed=3,
                                      extent=(1.2, 0.8, 0.5),
                                      center=(0.0, 0.0, 1.4))
        cal = default_calibration()
        baseline = jnp.array([-0.11, 0.0, 0.0])
        extr = np.asarray(se3.make_pose(se3.quat_identity(), baseline))
        pose1 = np.asarray(se3.pose_identity())
        pose2 = np.asarray(se3.make_pose(se3.quat_identity(), baseline))
        img1 = world.render(cal, pose1, seed=1)
        img2 = world.render(cal, pose2, seed=2)
        engine = engine_cls(s, cal, seed=0)
        r1, r2 = engine.process_stereo_frames(img1, img2, extr)
        assert r1.state == TrackingState.TRACKING
        assert r2.state == TrackingState.TRACKING
        # per-pair results: secondary pose = extrinsics ∘ primary pose
        np.testing.assert_allclose(r2.pose, extr, atol=1e-6)
        assert engine.num_keyframes == 2
        assert engine.num_map_points >= s.stereo.map_init.min_init_map_points
        # metric: median landmark depth should be near the true scene depth
        depths = np.asarray(engine.map_state.mp_pos)[
            np.asarray(engine.map_state.mp_valid)][:, 2]
        assert 0.8 < np.median(depths) < 2.3


class TestSensorAPI:
    def test_add_samples_and_gravity(self, engine_cls):
        s = fast_settings()
        cal = default_calibration()
        engine = engine_cls(s, cal, seed=0)
        for i in range(100):
            assert engine.add_sensor_sample(
                SensorSample.accel(i / 200.0, (0.0, -9.80665, 0.0)))
        assert engine.get_gravity_direction() is None  # not converged yet
        assert engine.get_scale() is None

    def test_mag_dropped(self, engine_cls):
        s = fast_settings()
        engine = engine_cls(s, default_calibration(), seed=0)
        assert not engine.add_sensor_sample(
            SensorSample.mag(0.0, (1.0, 0, 0)))


def _short_run(engine_cls, n=18):
    s = fast_settings()
    world = SyntheticWorld.create(700, seed=3)
    cal = default_calibration()
    poses = orbit_trajectory(n, radius=2.0, forward=0.02, sweep=0.9)
    engine = engine_cls(s, cal, seed=1)
    for i, p in enumerate(poses):
        engine.process_frame(world.render(cal, p, seed=500 + i),
                             timestamp=i / 30.0)
    if hasattr(engine, "flush"):
        engine.flush()
    return engine, n


class TestVOIQuery:
    def test_voi_after_run(self, engine_cls):
        engine, _ = _short_run(engine_cls)
        if engine.num_keyframes >= 2:
            voi = engine.try_get_volume_of_interest()
            assert voi is None or (voi.max_corner > voi.min_corner).all()


class TestTrackingResultsQuery:
    def test_get_tracking_results_for_frames(self, engine_cls):
        engine, n = _short_run(engine_cls)
        results = engine.get_tracking_results_for_frames(list(range(n)))
        assert len(results) == n
        tracked = [r for r in results if r.state == TrackingState.TRACKING]
        # the engine initialized and most frames carry optimized poses
        assert len(tracked) >= 2
        for r in tracked:
            assert r.pose is not None and np.all(np.isfinite(r.pose))


class TestMediatorEvents:
    def test_pose_refined_fires(self, engine_cls):
        s = fast_settings()
        world = SyntheticWorld.create(700, seed=3)
        cal = default_calibration()
        poses = orbit_trajectory(18, radius=2.0, forward=0.02, sweep=0.9)
        engine = engine_cls(s, cal, seed=1)
        from mageslam_tpu.utils.mediator import AnalysisCompleted, PoseRefined
        seen = {"analysis": 0, "pose": 0}
        engine.mediator.subscribe(
            AnalysisCompleted,
            lambda e: seen.__setitem__("analysis", seen["analysis"] + 1))
        engine.mediator.subscribe(
            PoseRefined,
            lambda e: seen.__setitem__("pose", seen["pose"] + 1))
        for i, p in enumerate(poses):
            engine.process_frame(world.render(cal, p, seed=500 + i),
                                 timestamp=i / 30.0)
        if hasattr(engine, "flush"):
            engine.flush()
        assert seen["analysis"] >= 1
        assert seen["pose"] >= 1
