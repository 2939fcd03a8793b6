"""Golden-path driver: synthetic sequence -> SLAM -> fossilized trajectory.

The equivalent of the reference's Console app (Apps/Console/console.cpp:
291-341: video in -> ProcessFrame per frame -> Fossilize -> CSV export).
With no camera on the box the input is the deterministic synthetic world.

Usage:
  python examples/run_synthetic.py [--frames N] [--cpu] [--csv out.csv]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: whatever JAX has)")
    ap.add_argument("--csv", type=str, default="")
    ap.add_argument("--tum", type=str, default="")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from mageslam_tpu.io.evaluation import ate_rmse
    from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                           default_calibration,
                                           orbit_trajectory)
    from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState

    # settings: the tests' tuned synthetic profile
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_slam_e2e import fast_settings

    world = SyntheticWorld.create(700, seed=args.seed)
    cal = default_calibration()
    poses_gt = orbit_trajectory(args.frames, radius=2.0, forward=0.02,
                                sweep=0.9)
    engine = MageSlamTPU(fast_settings(), cal, seed=1)

    print(f"[run_synthetic] {args.frames} frames on "
          f"{jax.devices()[0].platform}", flush=True)
    results = []
    t0 = time.perf_counter()
    for i, p in enumerate(poses_gt):
        img = world.render(cal, p, seed=500 + i)
        r = engine.process_frame(img, timestamp=i / 30.0)
        results.append(r)
    elapsed = time.perf_counter() - t0

    states = [r.state for r in results]
    n_tracked = sum(s == TrackingState.TRACKING for s in states)
    print(f"tracked {n_tracked}/{len(results)} frames, "
          f"keyframes={engine.num_keyframes}, "
          f"map points={engine.num_map_points}, "
          f"{len(results) / elapsed:.1f} frames/s wall")

    fossil = engine.fossilize()
    est, gt = [], []
    for r in results:
        if r.state == TrackingState.TRACKING:
            p = fossil.pose_for_frame(r.frame_id)
            if p is not None:
                est.append(p)
                gt.append(poses_gt[r.frame_id])
    if len(est) >= 10:
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
        extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
        print(f"ATE RMSE (Sim3-aligned): {rmse:.4f} m "
              f"({100 * rmse / extent:.2f}% of trajectory extent)")
    if args.csv:
        fossil.export_csv(args.csv)
        print(f"fossil CSV -> {args.csv}")
    if args.tum:
        fossil.export_tum(args.tum)
        print(f"TUM trajectory -> {args.tum}")


if __name__ == "__main__":
    main()
