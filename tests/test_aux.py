"""Aux subsystem tests: fuser/IMU, stereo init, serialization, determinism,
tracing, depths, VOI, denoising."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.config import (BoundingDepthSettings,
                                 StereoMapInitializationSettings,
                                 VolumeOfInterestSettings)
from mageslam_tpu.fuser.imu import (Fuser, FuserMode, PoseInterpolator,
                                    UnfilteredIMU, integrate_gyro, GRAVITY)
from mageslam_tpu.fuser.samples import (SampleType, SensorSample,
                                        SensorSampleQueue)
from mageslam_tpu.geometry import se3
from mageslam_tpu.io import serialization
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.mapstore.denoising import (estimate_normals,
                                             mollify_normals,
                                             reposition_points)
from mageslam_tpu.mapstore.depths import bounding_plane_depths
from mageslam_tpu.mapstore.volume_of_interest import \
    compute_volume_of_interest
from mageslam_tpu.solvers import pnp
from mageslam_tpu.tracking.frontend import FrameFeatures
from mageslam_tpu.tracking.stereo import stereo_initialize
from mageslam_tpu.utils.determinism import Determinator, value_hash
from mageslam_tpu.utils.tracing import (Profiler, ObjectTrace,
                                        SkeletonLogger, SkeletonLoggerLevel)


class TestSampleQueue:
    def test_ordering_and_drain(self):
        q = SensorSampleQueue()
        q.add_sample(SensorSample.accel(0.3, (0, 0, 9.8)))
        q.add_sample(SensorSample.gyro(0.1, (0, 0, 0)))
        q.add_sample(SensorSample.accel(0.2, (0, 0, 9.8)))
        drained = q.drain_until(0.25)
        assert [s.timestamp for s in drained] == [0.1, 0.2]
        assert len(q) == 1

    def test_drop_mag(self):
        q = SensorSampleQueue(drop_mag=True)
        assert not q.add_sample(SensorSample.mag(0.1, (1, 0, 0)))
        assert len(q) == 0


class TestIMU:
    def test_gyro_integration_constant_rate(self):
        # rotate at 90 deg/s about z for 1s
        n = 101
        ts = np.linspace(0, 1, n)
        w = np.zeros((n, 4))
        w[:, 0] = ts
        w[:, 3] = np.pi / 2
        q = integrate_gyro(np.array([1.0, 0, 0, 0]), w)
        expect = np.asarray(se3.so3_exp(jnp.array([0.0, 0, np.pi / 2])))
        assert abs(abs(float(np.dot(q, expect))) - 1.0) < 1e-3

    def test_accel_integration_free_fall_cancels(self):
        imu = UnfilteredIMU()
        n = 51
        ts = np.linspace(0, 0.5, n)
        accel = np.zeros((n, 4))
        accel[:, 0] = ts
        accel[:, 2] = -GRAVITY  # gravity reading only (body = world here)
        dq, dp = imu.step(accel, np.zeros((0, 4)))
        assert np.linalg.norm(dp) < 1e-6

    def test_fuser_mode_machine(self):
        f = Fuser(gravity_samples_needed=10, scale_windows_needed=2)
        assert f.mode == FuserMode.WAIT_FOR_MAGE_INIT
        f.on_mage_initialized()
        assert f.mode == FuserMode.GRAVITY_CONVERGE
        accel = np.zeros((12, 4))
        accel[:, 0] = np.linspace(0, 0.1, 12)
        accel[:, 2] = -GRAVITY  # columns are (t, x, y, z): y reading
        f.process_fence(accel, np.zeros((0, 4)), None)
        assert f.mode == FuserMode.SCALE_INIT
        assert f.has_gravity
        np.testing.assert_allclose(f.gravity_w, [0, -GRAVITY, 0], atol=1e-5)
        # two windows with visual poses -> TRACKING
        p0 = np.asarray(se3.pose_identity())
        for k in range(3):
            pk = np.array(p0)
            pk[4] = 0.1 * k
            f.process_fence(accel, np.zeros((0, 4)), pk)
        assert f.mode == FuserMode.TRACKING

    def test_pose_interpolator(self):
        pi = PoseInterpolator()
        pi.add(0.0, np.asarray(se3.pose_identity()))
        p1 = np.asarray(se3.make_pose(se3.quat_identity(),
                                      jnp.array([1.0, 0, 0])))
        pi.add(1.0, p1)
        mid = pi.pose_at(0.5)
        np.testing.assert_allclose(mid[4:], [0.5, 0, 0], atol=1e-5)


class TestStereoInit:
    def test_metric_bootstrap(self, rng):
        n = 100
        F = 256
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n),
                        rng.uniform(0.8, 2.0, n)], -1).astype(np.float32)
        baseline = jnp.array([-0.12, 0.0, 0.0])  # 12 cm stereo rig
        extr = se3.make_pose(se3.quat_identity(), baseline)
        desc = jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint32))

        def feats(pose):
            xn, z = pnp.project_normalized(pose, jnp.asarray(pts))
            return FrameFeatures(
                uv=jnp.zeros((F, 2)),
                xn_undist=jnp.zeros((F, 2)).at[:n].set(xn),
                response=jnp.ones(F), angle=jnp.zeros(F),
                octave=jnp.zeros(F, jnp.int32), desc=desc,
                valid=jnp.arange(F) < n)

        f1 = feats(se3.pose_identity())
        f2 = feats(extr)
        res = stereo_initialize(f1, f2, extr,
                                StereoMapInitializationSettings(), 272.0)
        assert bool(res.success)
        assert int(res.num_points) >= 60
        ok = np.asarray(res.point_valid)[:n]
        d = np.linalg.norm(np.asarray(res.points)[:n][ok] - pts[ok],
                           axis=-1)
        assert np.median(d) < 0.01  # METRIC accuracy (known baseline)


class TestSerialization:
    def test_map_state_roundtrip(self, rng, tmp_path):
        m = ms.empty_map(8, 32, 64)
        m, ids = ms.allocate_map_points(
            m, jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32)),
            jnp.zeros((10, 8), jnp.uint32), jnp.zeros((10, 3)), 0,
            jnp.ones(10, bool))
        p = str(tmp_path / "map.npz")
        serialization.save_state(p, m, {"note": "test"})
        m2 = serialization.load_state(p, ms.empty_map(8, 32, 64))
        for a, b in zip(m, m2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_engine_state_roundtrip(self, tmp_path):
        from mageslam_tpu.runtime import device_engine as de
        from mageslam_tpu.config import MageSlamSettings
        s = MageSlamSettings()
        s = s.replace(capacity=s.capacity.__class__(
            max_features=32, max_keyframes=8, max_map_points=64,
            pose_history_size=16))
        st = de.empty_state(s, seed=7)
        p = str(tmp_path / "engine.npz")
        serialization.save_state(p, st)
        st2 = serialization.load_state(p, de.empty_state(s))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(st.key)),
            np.asarray(jax.random.key_data(st2.key)))
        assert bool(st2.initialized) == bool(st.initialized)


class TestDeterminism:
    def test_hash_stable_and_sensitive(self):
        a = np.arange(10, dtype=np.float32)
        assert value_hash(a) == value_hash(a.copy())
        b = a.copy()
        b[3] += 1e-6
        assert value_hash(a) != value_hash(b)

    def test_record_replay_compare(self, tmp_path):
        d1 = Determinator()
        d1.check("TrackingThread", np.arange(5))
        d1.check("TrackingThread", np.arange(3))
        d1.check("MappingThread", np.ones(2))
        p = str(tmp_path / "truth.json")
        d1.save(p)
        truth = Determinator.load(p)
        d2 = Determinator()
        d2.check("TrackingThread", np.arange(5))
        d2.check("TrackingThread", np.arange(4))  # diverges at idx 1
        d2.check("MappingThread", np.ones(2))
        diffs = d2.compare(truth)
        assert diffs["TrackingThread"] == 1
        assert diffs["MappingThread"] == -1


class TestTracing:
    def test_profiler_scopes(self):
        p = Profiler()
        with p.scope("a"):
            pass
        with p.scope("a"):
            pass
        assert p.stats["a"].count == 2
        assert "a" in p.report()

    def test_object_trace(self):
        tr = ObjectTrace()
        seen = []
        tr.listen("pose", seen.append)
        tr.fire("pose", 42)
        assert seen == [42]

    def test_skeleton_logger_levels(self):
        log = SkeletonLogger(level=SkeletonLoggerLevel.TRACKING)
        log.log(SkeletonLoggerLevel.TRACKING, "t")
        log.log(SkeletonLoggerLevel.MAPPING, "m")
        assert len(log.records) == 1


class TestDepthsAndVOI:
    def test_bounding_depths(self, rng):
        from mageslam_tpu.io.synthetic import default_calibration
        cal = default_calibration()
        pts = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-0.5, 0.5, 50),
                        rng.uniform(2.0, 8.0, 50)], -1).astype(np.float32)
        near, far, ok = bounding_plane_depths(
            se3.pose_identity(), jnp.asarray(pts), jnp.ones(50, bool), cal)
        assert bool(ok)
        assert 1.9 < float(near) < 3.0
        assert 6.0 < float(far) < 8.1

    def test_voi_contains_scene(self, rng):
        # frames looking at z in [2, 8] from origin-ish positions
        poses = np.stack([np.asarray(se3.make_pose(
            se3.quat_identity(), jnp.array([0.1 * k, 0.0, 0.0])))
            for k in range(5)])
        nears = np.full(5, 2.0, np.float32)
        fars = np.full(5, 8.0, np.float32)
        voi = compute_volume_of_interest(
            poses, nears, fars, np.ones(5, bool),
            VolumeOfInterestSettings(iterations=2, voxel_count_floor=4096))
        assert voi.valid
        center = (voi.min_corner + voi.max_corner) / 2
        assert 0.0 < center[2] < 10.0


class TestDenoising:
    def test_plane_normals_and_reposition(self, rng):
        n = 200
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                        rng.normal(0, 0.02, n)], -1).astype(np.float32)
        view = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
        valid = jnp.ones(n, bool)
        normals = estimate_normals(jnp.asarray(pts), valid,
                                   jnp.asarray(view))
        nz = np.abs(np.asarray(normals)[:, 2])
        assert np.median(nz) > 0.95  # plane normal ~ +-z
        normals = mollify_normals(jnp.asarray(pts), normals, valid)
        moved = reposition_points(jnp.asarray(pts), normals, valid,
                                  sigma=0.3)
        # repositioning flattens the plane
        assert float(jnp.std(moved[:, 2])) < np.std(pts[:, 2])
