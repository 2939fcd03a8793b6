"""Determinator wired into the live engines: record -> replay -> compare.

The reference's de-facto integration test (SURVEY.md §4): DETERMINISTIC_
CHECK streams per thread, saved and compared across runs
(arcana/analysis/determinator.h:16-110, sites like MappingWorker.cpp:
243-246).  Here both engines emit per-frame checkpoint streams; two
identical runs must agree hash-for-hash, a perturbed run must diverge,
and the save/load roundtrip must reproduce the comparison.
"""

import numpy as np

from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import MageSlamTPU
from mageslam_tpu.utils.determinism import Determinator

from test_slam_e2e import fast_settings

N = 14


def _drive_fused(det, perturb=False):
    world = SyntheticWorld.create(400, seed=3)
    cal = default_calibration()
    poses = orbit_trajectory(N, radius=2.0, forward=0.02, sweep=0.9)
    eng = MageSlamTPUFused(fast_settings(), cal, seed=1, determinator=det)
    for i, p in enumerate(poses):
        img = world.render(cal, p, seed=700 + i)
        if perturb and i == 8:
            img = np.roll(img, 1, axis=1)  # one-pixel shift at frame 8
        eng.process_frame(img, timestamp=i / 30.0)
    eng.flush()
    return eng


def _drive_host(det):
    world = SyntheticWorld.create(400, seed=3)
    cal = default_calibration()
    poses = orbit_trajectory(N, radius=2.0, forward=0.02, sweep=0.9)
    eng = MageSlamTPU(fast_settings(), cal, seed=1, determinator=det)
    for i, p in enumerate(poses):
        eng.process_frame(world.render(cal, p, seed=700 + i),
                          timestamp=i / 30.0)
    return eng


class TestDeterminatorWiring:
    def test_fused_record_replay_agrees(self, tmp_path):
        d1, d2 = Determinator(), Determinator()
        _drive_fused(d1)
        _drive_fused(d2)
        assert "FusedEngine" in d1.streams
        assert len(d1.streams["FusedEngine"]) == N
        p = str(tmp_path / "truth.json")
        d1.save(p)
        truth = Determinator.load(p)
        diffs = d2.compare(truth)
        assert all(v == -1 for v in diffs.values()), diffs

    def test_fused_divergence_detected(self):
        d1, d2 = Determinator(), Determinator()
        _drive_fused(d1)
        _drive_fused(d2, perturb=True)
        diffs = d2.compare(d1)
        # divergence at (or after) the perturbed frame, never before
        assert diffs["FusedEngine"] >= 8, diffs

    def test_fused_stage_streams_localize(self):
        """Per-STAGE streams (r4 densification toward the reference's ~40
        DETERMINISTIC_CHECK sites): an image perturbation at frame 8 must
        show up in the Frontend stream AT exactly frame 8 — and no stage
        stream may diverge before it (causality)."""
        d1, d2 = Determinator(), Determinator()
        _drive_fused(d1)
        _drive_fused(d2, perturb=True)
        stages = ["Frontend", "Mapping/kf_poses", "Mapping/points",
                  "Mapping/assoc", "Mapping/ba", "Tracking/pose",
                  "Tracking/inliers", "Tracking/assoc", "Scheduler"]
        for st in stages:
            assert st in d1.streams, st
            assert len(d1.streams[st]) == N, st
        diffs = d2.compare(d1)
        # the root cause localizes: extraction sees the shifted image at
        # frame 8 exactly
        assert diffs["Frontend"] == 8, diffs
        # nothing diverges before the perturbation
        for st in stages:
            assert diffs[st] == -1 or diffs[st] >= 8, (st, diffs)
        # mapping reads the PREVIOUS frames' keyframes: its first
        # divergence cannot precede the tracking one
        trk = diffs["Tracking/pose"]
        for st in ("Mapping/kf_poses", "Mapping/points"):
            assert diffs[st] == -1 or trk == -1 or diffs[st] >= trk, \
                (st, diffs)

    def test_hash_fold_sensitivity(self):
        """The r5 content hash must catch what the r4 float sums could
        not (VERDICT r4 weak #5): permutations, sign-symmetric drifts,
        and single-ulp changes."""
        import jax.numpy as jnp
        from mageslam_tpu.runtime.device_engine import _hash_fold

        a = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
        h = float(_hash_fold(a))
        # deterministic
        assert float(_hash_fold(a)) == h
        # permutation of rows changes the hash (float sum would not)
        assert float(_hash_fold(a[::-1])) != h
        # sign-symmetric divergence: +eps on one element, -eps on another
        b = np.asarray(a).copy()
        b[0, 0] += 0.5
        b[1, 0] -= 0.5
        assert float(_hash_fold(jnp.asarray(b))) != h
        # single-ulp change
        c = np.asarray(a).copy()
        c[2, 1] = np.nextafter(c[2, 1], np.float32(1e9))
        assert float(_hash_fold(jnp.asarray(c))) != h
        # int arrays: swapping two association entries changes the hash
        ia = jnp.asarray(np.array([3, 7, -1, 5], np.int32))
        ib = jnp.asarray(np.array([7, 3, -1, 5], np.int32))
        assert float(_hash_fold(ia)) != float(_hash_fold(ib))
        # value stays exactly representable in the f32 output slot
        assert h == int(h) and 0 <= h < 2 ** 24

    def test_host_streams_emitted(self):
        det = Determinator()
        eng = _drive_host(det)
        assert "TrackingThread" in det.streams
        assert len(det.streams["TrackingThread"]) >= 5
        # densified per-stage sites (r4)
        assert "Frontend" in det.streams
        assert len(det.streams["Frontend"]) == N
        assert "Tracking/prior" in det.streams
        assert "Tracking/assoc" in det.streams
        if eng.num_keyframes > 2:
            assert "MappingThread" in det.streams
            assert "Mapping/new_points" in det.streams
            assert "Mapping/ba" in det.streams
