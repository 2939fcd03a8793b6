"""Drop-frame backpressure (Runtime.cpp:107-121 OneAtATime semantics).

A feed faster than the pipeline drains must SKIP stale frames and always
process the LATEST arrival; with pacing off every frame is dispatched.
The busy probe is injected so the schedule is deterministic on any host.
"""

import dataclasses

import numpy as np

from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_slam_e2e import fast_settings


def _paced_settings():
    s = fast_settings()
    return s.replace(runtime=dataclasses.replace(
        s.runtime, drop_frames_when_busy=True, max_pipeline_depth=3))


class TestDropFramePacing:
    def test_drops_stale_processes_latest(self):
        world = SyntheticWorld.create(400, seed=3)
        cal = default_calibration()
        poses = orbit_trajectory(20, radius=2.0, forward=0.02, sweep=0.9)
        # busy for frames 6..11 (two bursts), free otherwise
        busy_frames = {6, 7, 8, 10, 11}
        state = {"i": -1}

        def fake_busy():
            return 99 if state["i"] in busy_frames else 0

        eng = MageSlamTPUFused(_paced_settings(), cal, seed=1,
                               busy_fn=fake_busy)
        for i, p in enumerate(poses):
            state["i"] = i
            eng.process_frame(world.render(cal, p, seed=700 + i),
                              timestamp=i / 30.0)
        results = eng.flush()

        # every frame resolves to SOMETHING
        assert all(i in results for i in range(20))
        # stale held frames were dropped: 6,7 dropped when 8 arrived... the
        # LAST frame of each busy burst is processed at catch-up, earlier
        # burst frames are SKIPPED
        assert eng.frames_dropped >= 2
        for i in (6, 7, 10):
            assert results[i].state == TrackingState.SKIPPED
        # the latest of each burst must have been dispatched (any state
        # but the synthetic "dropped" SKIPPED marker is fine — it went
        # through the engine); spot-check it tracked
        assert results[12].state == TrackingState.TRACKING

    def test_no_pacing_processes_everything(self):
        world = SyntheticWorld.create(400, seed=3)
        cal = default_calibration()
        poses = orbit_trajectory(12, radius=2.0, forward=0.02, sweep=0.9)
        eng = MageSlamTPUFused(fast_settings(), cal, seed=1,
                               busy_fn=lambda: 99)  # probe ignored: off
        for i, p in enumerate(poses):
            eng.process_frame(world.render(cal, p, seed=700 + i),
                              timestamp=i / 30.0)
        results = eng.flush()
        assert eng.frames_dropped == 0
        assert all(i in results for i in range(12))
