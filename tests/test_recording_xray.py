"""Capture/replay (bob analog), xray/DataFlow, SkeletonKey inspector."""

import json

import numpy as np
import pytest

from mageslam_tpu.fuser.samples import SensorSample
from mageslam_tpu.io.recording import (Recording, RecordingWriter,
                                       record_session)
from mageslam_tpu.utils.xray import DataFlow, DataFlowLog, Xray


class TestRecording:
    def test_roundtrip_streams(self, tmp_path, rng):
        path = tmp_path / "rec"
        imgs = [rng.integers(0, 255, (12, 16), dtype=np.uint8)
                for _ in range(5)]
        with RecordingWriter(path, {"session": "t"}) as w:
            w.add_frame_stream(12, 16)
            w.add_imu_stream()
            for i, img in enumerate(imgs):
                w.append("frames", i / 30.0, img)
            w.append_imu(0.01, 0, (0.0, 9.8, 0.0))
            w.append_imu(0.02, 1, (0.1, 0.0, 0.0))

        rec = Recording(path)
        assert rec.metadata == {"session": "t"}
        fs = rec.streams["frames"]
        assert fs.records.shape == (5, 12, 16)
        np.testing.assert_array_equal(fs.records[3], imgs[3])
        np.testing.assert_allclose(fs.timestamps,
                                   [i / 30.0 for i in range(5)])
        imu = rec.streams["imu"]
        assert imu.records.shape == (2, 4)
        np.testing.assert_allclose(imu.records[0], [0, 0, 9.8, 0], atol=1e-6)

    def test_global_timestamp_merge(self, tmp_path, rng):
        path = tmp_path / "rec"
        imgs = [rng.integers(0, 255, (4, 4), dtype=np.uint8)
                for _ in range(3)]
        samples = [SensorSample.accel(0.005, (0, 9.8, 0)),
                   SensorSample.gyro(0.04, (0.1, 0, 0))]
        record_session(path, imgs, [0.0, 1 / 30.0, 2 / 30.0],
                       imu_samples=samples)
        events = list(Recording(path).replay())
        ts = [t for t, _, _ in events]
        assert ts == sorted(ts)
        kinds = [n for _, n, _ in events]
        assert kinds == ["frames", "imu", "frames", "imu", "frames"]

    def test_replay_feeds_identical_pipeline(self, tmp_path, rng):
        # record -> replay -> byte-identical frames (determinism substrate)
        path = tmp_path / "rec"
        imgs = [rng.integers(0, 255, (8, 8), dtype=np.uint8)
                for _ in range(4)]
        record_session(path, imgs, np.arange(4) / 30.0)
        back = [f for _, f in Recording(path).frames()]
        for a, b in zip(imgs, back):
            np.testing.assert_array_equal(a, b)

    def test_version_guard(self, tmp_path):
        path = tmp_path / "rec"
        record_session(path, [np.zeros((2, 2), np.uint8)], [0.0])
        man = json.loads((path / "manifest.json").read_text())
        man["version"] = 99
        (path / "manifest.json").write_text(json.dumps(man))
        with pytest.raises(ValueError, match="newer"):
            Recording(path)

    def test_shape_mismatch_rejected(self, tmp_path):
        with RecordingWriter(tmp_path / "rec") as w:
            w.add_frame_stream(4, 4)
            with pytest.raises(ValueError, match="shape"):
                w.append("frames", 0.0, np.zeros((5, 4), np.uint8))


class TestXray:
    def test_capture_and_save(self, tmp_path):
        x = Xray()

        @x.wrap("triangulate")
        def f(a, b):
            return a + b

        out = f(np.arange(3), b=np.ones(3))
        np.testing.assert_allclose(out, [1, 2, 3])
        assert len(x.records) == 1
        r = x.records[0]
        assert r["name"] == "triangulate"
        assert r["inputs"]["args"][0]["data"] == [0, 1, 2]
        assert r["outputs"]["data"] == [1.0, 2.0, 3.0]
        x.save(tmp_path / "x.json")
        assert json.loads((tmp_path / "x.json").read_text())[0]["name"] \
            == "triangulate"

    def test_large_arrays_hashed_not_dumped(self):
        x = Xray(max_elems=10)
        x.capture("big", np.zeros(100), np.ones(5))
        rec = x.records[0]
        assert "crc32" in rec["inputs"] and "data" not in rec["inputs"]
        assert rec["outputs"]["data"] == [1.0] * 5

    def test_disabled_is_free(self):
        x = Xray(enabled=False)
        x.capture("n", 1, 2)
        assert x.records == []


class TestDataFlow:
    def test_fingerprint_sensitivity(self):
        a = DataFlow("stage").input(np.arange(4)).output(np.ones(2))
        b = DataFlow("stage").input(np.arange(4)).output(np.ones(2))
        c = DataFlow("stage").input(np.arange(4)).output(np.zeros(2))
        assert a.fingerprint() == b.fingerprint()
        assert a.fingerprint() != c.fingerprint()

    def test_first_divergence(self, tmp_path):
        la, lb = DataFlowLog(), DataFlowLog()
        for i in range(4):
            la.add(DataFlow(f"s{i}").input(i).output(i * 2))
            lb.add(DataFlow(f"s{i}").input(i).output(
                i * 2 if i < 2 else i * 3))
        assert la.first_divergence(lb) == 2
        la.save(tmp_path / "a.json")
        assert DataFlowLog.load(
            tmp_path / "a.json").first_divergence(la) is None


class TestSkeletonKey:
    def test_inspects_live_engine(self, rng):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_slam_e2e import fast_settings

        from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                               default_calibration,
                                               orbit_trajectory)
        from mageslam_tpu.runtime.skeleton_key import (Introspector,
                                                       craft_skeleton_key)
        from mageslam_tpu.runtime.slam import MageSlamTPU

        world = SyntheticWorld.create(400, seed=5)
        cal = default_calibration()
        eng = MageSlamTPU(fast_settings(), cal, seed=0)
        for i, p in enumerate(orbit_trajectory(12, radius=2.0)):
            eng.process_frame(world.render(cal, p, seed=50 + i),
                              timestamp=i / 30.0)

        key = craft_skeleton_key(eng)
        assert key.get_map_points().shape[1] == 3
        assert len(key.get_keyframe_poses()) >= 2
        cov = key.get_covisibility()
        assert cov.shape[0] == cov.shape[1] == len(key.get_keyframe_poses())
        tree = key.get_spanning_tree()
        assert int(np.asarray(tree.parent >= 0).sum()) \
            == len(key.get_keyframe_poses()) - 1
        fids, poses = key.get_trajectory()
        assert len(fids) == len(poses) and len(fids) > 0

        seen = []

        class Sink(Introspector):
            def on_map_snapshot(self, snap):
                seen.append(snap["num_keyframes"])

        key.introspection.register(Sink())
        snap = key.snapshot()
        assert seen == [snap["num_keyframes"]]
