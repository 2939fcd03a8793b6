"""Long real-texture ring sequence through the REAL dataset path
(VERDICT r3 next #5: more than one 40-frame orbit).

tests/data/ring_seq: 150 frames of real-photo-textured ring world with a
full-revolution loop trajectory (tools/make_dataset.py --scenario ring),
exact ground truth, on-disk EuRoC layout -> io/datasets.load_dataset ->
fused engine with loop closure enabled -> Sim3 ATE vs the groundtruth
CSV.  An 8-frame occlusion window mid-drive exercises the
SKIPPED -> RELOCALIZING -> recovery path on the dataset pipeline too
(the synthetic e2e covers it; this covers the console-path equivalent,
console.cpp:291-341)."""

import os

import numpy as np
import pytest

from mageslam_tpu.io import datasets
from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import occlusion_frame
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_e2e_loop_reloc import loop_settings

DATA = os.path.join(os.path.dirname(__file__), "data", "ring_seq")
# occlusion window in the REVISIT phase (frame 130 is ~349 deg — back in
# the start sector, which is mapped): quick relocalization is possible.
# A mid-ring blackout instead strands the camera ~20 deg past the map
# frontier and recovery must honestly wait until the trajectory re-enters
# mapped territory (measured: R-state until the start sector reappears)
# — real behavior, but not a few-frame-recovery scenario.
OCC0, OCC1 = 130, 138


def ring_settings():
    """loop_settings + a third-frame fit bar sized for real-photo
    texture: its keypoints localize to ~1.2-1.5 px^2 tracked MSE (vs
    ~0.6 on the clean synthetic splats the 1.1 px^2 default was
    calibrated against, config.py third_frame_max_mse_px2) — measured
    here: a GOOD 129-point bootstrap re-finds 87 points at 1.51 px^2
    and was being rejected every attempt.  Bad RANSAC draws on this
    texture measure >3 px^2, so 2.5 keeps the discrimination."""
    import dataclasses
    s = loop_settings()
    mono = s.mono
    init = dataclasses.replace(mono.map_init, third_frame_max_mse_px2=2.5)
    # the ring pans 2.4 deg/frame (a full revolution in 150 frames) and
    # the wall texture yields noisier matches at 3+-frame baselines than
    # the synthetic splats — the asynchronous mapper needs keyframes
    # every ~3 frames to keep the frontier triangulated (measured: at
    # the default cadence the fused map lags the synchronous host map
    # by ~25% keyframes and tracking dies a third of the way around)
    return s.replace(mono=mono.__class__(camera=mono.camera,
                                         map_init=init),
                     keyframe=dataclasses.replace(s.keyframe,
                                                  min_frame_count=2))


@pytest.fixture(scope="module")
def ring_dataset_run():
    seq = datasets.load_dataset(DATA)
    cal = seq.tracking_calibration(320)
    eng = MageSlamTPUFused(ring_settings(), cal, seed=1)
    from PIL import Image
    n = len(seq.image_paths)
    for i, path in enumerate(seq.image_paths):
        if OCC0 <= i < OCC1:
            img = occlusion_frame(cal, seed=i)
        else:
            img = np.asarray(Image.open(path), np.float32)
        eng.process_frame(img, timestamp=float(seq.timestamps[i]))
    results = eng.flush()
    fossil = eng.fossilize()
    gt = seq.gt_for_frames()
    return eng, results, fossil, gt, n


class TestRingDatasetE2E:
    def test_sequence_loaded(self, ring_dataset_run):
        eng, results, fossil, gt, n = ring_dataset_run
        assert n == 150
        assert gt is not None and gt.shape == (150, 7)

    def test_sustained_tracking(self, ring_dataset_run):
        """Lock within 20 frames; track nearly every non-occluded frame
        after lock (the r3 orbit test's sustained-tracking bar, now on a
        3.75x longer loop trajectory)."""
        eng, results, fossil, gt, n = ring_dataset_run
        states = [results[i].state for i in range(n)]
        last_init = max(i for i, s in enumerate(states)
                        if s == TrackingState.INITIALIZING)
        assert last_init < 20
        tail = [s for i, s in enumerate(states)
                if i > last_init and not (OCC0 <= i < OCC1 + 3)]
        tracked = sum(s == TrackingState.TRACKING for s in tail)
        assert tracked >= 0.85 * len(tail), \
            (tracked, len(tail))

    def test_occlusion_recovery_on_dataset_path(self, ring_dataset_run):
        """The console-path equivalent of the synthetic occlusion e2e:
        no tracking during blackout, recovery shortly after it lifts."""
        eng, results, fossil, gt, n = ring_dataset_run
        states = [results[i].state for i in range(n)]
        assert all(s != TrackingState.TRACKING
                   for s in states[OCC0 + 1:OCC1])
        assert TrackingState.TRACKING in states[OCC1:OCC1 + 6]

    def test_ate_vs_groundtruth_csv(self, ring_dataset_run):
        """Tighter than the r3 orbit bar (6%): the loop stitches the
        ring, so 4% of extent holds across the full revolution."""
        eng, results, fossil, gt, n = ring_dataset_run
        est, gtp = [], []
        for i in range(n):
            r = results.get(i)
            if r is not None and r.state == TrackingState.TRACKING:
                p = fossil.pose_for_frame(r.frame_id)
                if p is not None:
                    est.append(p)
                    gtp.append(gt[i])
        assert len(est) >= 90
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gtp))
        extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
        assert rmse < 0.04 * extent, (rmse, extent)
