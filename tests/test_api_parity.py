"""Public API parity tests: stereo bootstrap, sensor samples, VOI query."""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.fuser.samples import SensorSample
from mageslam_tpu.geometry import se3
from mageslam_tpu.io.synthetic import SyntheticWorld, default_calibration
from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState

from tests.test_slam_e2e import fast_settings


class TestStereoAPI:
    def test_process_stereo_frames_bootstraps_metric_map(self):
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
        engine = MageSlamTPU(s, cal, seed=0)
        r = engine.process_stereo_frames(img1, img2, extr)
        assert r.state == TrackingState.TRACKING
        assert engine.num_keyframes == 2
        assert engine.num_map_points >= s.stereo.map_init.min_init_map_points
        # metric: median landmark depth should be near the true scene depth
        depths = np.asarray(engine.map_state.mp_pos)[
            np.asarray(engine.map_state.mp_valid)][:, 2]
        assert 0.8 < np.median(depths) < 2.3


class TestSensorAPI:
    def test_add_samples_and_gravity(self):
        s = fast_settings()
        cal = default_calibration()
        engine = MageSlamTPU(s, cal, seed=0)
        for i in range(100):
            assert engine.add_sensor_sample(
                SensorSample.accel(i / 200.0, (0.0, -9.80665, 0.0)))
        assert engine.get_gravity_direction() is None  # not converged yet
        assert engine.get_scale() is None

    def test_mag_dropped(self):
        s = fast_settings()
        engine = MageSlamTPU(s, default_calibration(), seed=0)
        assert not engine.add_sensor_sample(
            SensorSample.mag(0.0, (1.0, 0, 0)))


class TestVOIQuery:
    def test_voi_after_run(self):
        # reuse a short synthetic run
        from mageslam_tpu.io.synthetic import orbit_trajectory
        s = fast_settings()
        world = SyntheticWorld.create(700, seed=3)
        cal = default_calibration()
        poses = orbit_trajectory(18, radius=2.0, forward=0.02, sweep=0.9)
        engine = MageSlamTPU(s, cal, seed=1)
        for i, p in enumerate(poses):
            engine.process_frame(world.render(cal, p, seed=500 + i),
                                 timestamp=i / 30.0)
        if engine.num_keyframes >= 2:
            voi = engine.try_get_volume_of_interest()
            assert voi is None or (voi.max_corner > voi.min_corner).all()
