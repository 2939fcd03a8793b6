"""Console app: dataset -> SLAM -> fossilized trajectory CSV.

Equivalent of the reference's golden-path driver (Apps/Console/console.cpp:
291-341: VideoCapture -> grayscale -> resize 320x180 -> ProcessFrame ->
Fossilize -> CSV of 4x4 poses, visualized by docs/Visualizers/
fossil_visualizer.html — our CSV format matches its layout).

Usage:
  python examples/console.py --dataset /path/to/euroc_or_tum_or_dir \
      [--width 320 --height 180] [--csv fossil.csv] [--tum traj.tum]
  python examples/console.py --synthetic 80   # no dataset needed
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--fx", type=float, default=0.0,
                    help="focal length in px at the tracking resolution "
                         "(default 0.85*width)")
    ap.add_argument("--csv", type=str, default="fossil.csv")
    ap.add_argument("--tum", type=str, default="")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--host-engine", action="store_true",
                    help="use the host-orchestrated runtime instead of "
                         "the fused device engine")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from mageslam_tpu.geometry.camera import CameraCalibration
    from mageslam_tpu.runtime.fused import MageSlamTPUFused
    from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState
    from test_slam_e2e import fast_settings

    # ---- calibration + frame source
    seq = None
    if args.dataset:
        from mageslam_tpu.io.datasets import load_dataset
        from mageslam_tpu.io.native_loader import FramePump
        seq = load_dataset(args.dataset, max_frames=args.max_frames)
        cal = seq.tracking_calibration(args.width)
        args.height = cal.height
        if args.fx:
            cal = CameraCalibration.pinhole(
                args.fx, args.fx, args.width / 2, args.height / 2,
                args.width, args.height)
    else:
        fx = args.fx or 0.85 * args.width
        cal = CameraCalibration.pinhole(fx, fx, args.width / 2,
                                        args.height / 2, args.width,
                                        args.height)
    settings = fast_settings()
    engine = (MageSlamTPU if args.host_engine else MageSlamTPUFused)(
        settings, cal, seed=1)

    if seq is not None:
        from mageslam_tpu.io.native_loader import FramePump
        print(f"[console] {len(seq.image_paths)} frames from "
              f"{args.dataset} ({seq.name}); gt="
              f"{seq.gt_view_poses is not None}")
        frames = FramePump(seq.image_paths, args.width, args.height,
                           capacity=8, n_threads=3)
    else:
        n = args.synthetic or 80
        from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                               default_calibration,
                                               orbit_trajectory)
        world = SyntheticWorld.create(700, seed=3)
        poses = orbit_trajectory(n, radius=2.0, forward=0.02, sweep=0.9)
        print(f"[console] {n} synthetic frames")
        frames = ((i, world.render(cal, p, seed=500 + i))
                  for i, p in enumerate(poses))

    # ---- golden path
    t0 = time.perf_counter()
    count = 0
    for i, img in frames:
        ts = (float(seq.timestamps[i] - seq.timestamps[0])
              if seq is not None else i / args.fps)
        engine.process_frame(img, timestamp=ts)
        count += 1
    if hasattr(engine, "flush"):
        results = engine.flush()
    else:
        results = engine._results
    elapsed = time.perf_counter() - t0
    tracked = sum(1 for r in results.values()
                  if r.state == TrackingState.TRACKING)
    print(f"[console] tracked {tracked}/{count} frames "
          f"({count / elapsed:.1f} frames/s), "
          f"keyframes={engine.num_keyframes}, "
          f"map points={engine.num_map_points}")

    fossil = engine.fossilize()
    fossil.export_csv(args.csv)
    print(f"[console] fossil CSV -> {args.csv} "
          f"({len(fossil.frame_ids)} poses)")
    if args.tum:
        fossil.export_tum(args.tum)
        print(f"[console] TUM -> {args.tum}")

    # ---- accuracy vs dataset ground truth (Sim3-aligned monocular ATE)
    if seq is not None and seq.gt_view_poses is not None:
        import numpy as np
        from mageslam_tpu.io.evaluation import ate_rmse
        gt = seq.gt_for_frames()
        fid_to_row = {int(f): k for k, f in enumerate(fossil.frame_ids)}
        est, ref = [], []
        for i in range(count):
            k = fid_to_row.get(i)
            if k is not None:
                est.append(fossil.poses[k])
                ref.append(gt[i])
        if len(est) >= 3:
            rmse, _, _ = ate_rmse(np.asarray(est), np.asarray(ref))
            print(f"[console] ATE RMSE (Sim3-aligned, {len(est)} "
                  f"frames): {rmse:.4f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
