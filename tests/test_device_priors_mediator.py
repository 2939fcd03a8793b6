"""Device profiles, pose prior providers, typed mediator."""

import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.device import (CameraSettings, DeviceProfile,
                                 IMUCharacterization,
                                 LinearFocalLengthModel, get_device_profile,
                                 supported_devices)
from mageslam_tpu.geometry import se3
from mageslam_tpu.tracking.pose_priors import (IMUPosePriorProvider,
                                               MotionModelPriorProvider)
from mageslam_tpu.utils.mediator import (AnalysisCompleted, Mediator,
                                         PoseRefined, TrackingLost)


class TestDevice:
    def test_profiles(self):
        assert "euroc_mono" in supported_devices()
        p = get_device_profile("euroc_mono")
        assert isinstance(p, DeviceProfile)
        assert p.calibration.width == 320
        assert float(p.calibration.fx) == pytest.approx(
            458.654 * 320 / 752, rel=1e-5)
        with pytest.raises(KeyError, match="unknown"):
            get_device_profile("nope")

    def test_imu_characterization(self):
        imu = IMUCharacterization(sample_rate_hz=100.0,
                                  accel_noise_density=2e-3)
        assert imu.accel_covariance() == pytest.approx(4e-4)
        assert imu.body_to_camera_mat().shape == (4, 4)

    def test_linear_focal_length_model(self):
        lfl = LinearFocalLengthModel(m_fx=10.0, b_fx=250.0, m_fy=10.0,
                                     b_fy=252.0, cx=160.0, cy=90.0)
        cal = lfl.calibration_at(2.0)
        assert float(cal.fx) == pytest.approx(270.0)
        assert float(cal.fy) == pytest.approx(272.0)

    def test_camera_settings(self):
        cs = CameraSettings(exposure_time_s=0.01, iso=400)
        assert cs.iso == 400


class TestMotionModelPrior:
    def test_time_scaled_extrapolation(self):
        prov = MotionModelPriorProvider()
        assert prov.get_pose_for_time(0.1) is None
        p0 = se3.make_pose(se3.quat_identity(), jnp.array([0.0, 0, 0]))
        p1 = se3.make_pose(se3.quat_identity(), jnp.array([0.1, 0, 0]))
        prov.on_tracking_pose(0.0, p0)
        np.testing.assert_allclose(np.asarray(prov.get_pose_for_time(1.0)),
                                   np.asarray(p0))
        prov.on_tracking_pose(1.0, p1)
        # same dt forward -> same translation step again
        pred = prov.get_pose_for_time(2.0)
        np.testing.assert_allclose(se3.pose_t(pred), [0.2, 0, 0], atol=1e-5)
        # half dt -> half step
        pred = prov.get_pose_for_time(1.5)
        np.testing.assert_allclose(se3.pose_t(pred), [0.15, 0, 0],
                                   atol=1e-5)


class TestIMUPrior:
    def test_gyro_rotation_prior(self):
        prov = IMUPosePriorProvider()
        anchor = se3.pose_identity()
        prov.on_tracking_pose(0.0, anchor)
        # constant yaw rate 0.5 rad/s for 0.2 s (body +y)
        for i in range(21):
            prov.add_sample(i * 0.01, (0.0, 0.5, 0.0))
        pred = prov.get_pose_for_time(0.2)
        # predicted view rotation ~0.1 rad about y (sign: prior only needs
        # the magnitude to be right and be consistent frame-to-frame)
        ang = 2 * np.arccos(min(1.0, abs(float(se3.pose_q(pred)[0]))))
        assert ang == pytest.approx(0.1, abs=0.02)
        # translation unchanged (no filter -> constant position)
        np.testing.assert_allclose(se3.pose_t(pred), [0, 0, 0], atol=1e-6)

    def test_no_anchor_returns_none(self):
        prov = IMUPosePriorProvider()
        prov.add_sample(0.0, (0, 0, 0))
        assert prov.get_pose_for_time(0.1) is None


class TestMediator:
    def test_typed_dispatch(self):
        bus = Mediator()
        got = []
        unsub = bus.subscribe(AnalysisCompleted,
                              lambda e: got.append(("a", e.frame_id)))
        bus.subscribe(TrackingLost, lambda e: got.append(("l", e.frame_id)))
        assert bus.send(AnalysisCompleted(3, 100)) == 1
        assert bus.send(TrackingLost(4, 3)) == 1
        assert bus.send(PoseRefined(5, None)) == 0  # no listeners
        assert got == [("a", 3), ("l", 4)]
        unsub()
        assert bus.send(AnalysisCompleted(6, 1)) == 0

    def test_engine_fires_events(self, rng):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_slam_e2e import fast_settings

        from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                               default_calibration,
                                               orbit_trajectory)
        from mageslam_tpu.runtime.slam import MageSlamTPU

        world = SyntheticWorld.create(400, seed=9)
        cal = default_calibration()
        eng = MageSlamTPU(fast_settings(), cal, seed=0)
        analyzed, refined = [], []
        eng.mediator.subscribe(AnalysisCompleted,
                               lambda e: analyzed.append(e.frame_id))
        eng.mediator.subscribe(PoseRefined,
                               lambda e: refined.append(e.frame_id))
        for i, p in enumerate(orbit_trajectory(10, radius=2.0)):
            eng.process_frame(world.render(cal, p, seed=70 + i),
                              timestamp=i / 30.0)
        assert analyzed == list(range(10))
        assert len(refined) >= 4  # frames after initialization

    def test_engine_with_motion_prior_provider_tracks(self, rng):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_slam_e2e import fast_settings

        from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                               default_calibration,
                                               orbit_trajectory)
        from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState

        world = SyntheticWorld.create(400, seed=11)
        cal = default_calibration()
        eng = MageSlamTPU(fast_settings(), cal, seed=0,
                          pose_prior_provider=MotionModelPriorProvider())
        n_tracked = 0
        for i, p in enumerate(orbit_trajectory(12, radius=2.0)):
            r = eng.process_frame(world.render(cal, p, seed=90 + i),
                                  timestamp=i / 30.0)
            n_tracked += r.state == TrackingState.TRACKING
        assert n_tracked >= 6
