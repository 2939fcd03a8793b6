"""Host-engine (runtime/slam.py) orbit accuracy bisect driver."""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from mageslam_tpu.io.evaluation import ate_rmse  # noqa: E402
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       orbit_trajectory)
from mageslam_tpu.runtime.slam import MageSlamTPU, TrackingState  # noqa: E402

from test_slam_e2e import fast_settings  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-h", action="store_true")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    world = SyntheticWorld.create(700, seed=3)
    cal = default_calibration()
    poses_gt = orbit_trajectory(45, radius=2.0, forward=0.02, sweep=0.9)
    s = fast_settings()
    if args.no_h:
        import dataclasses as _dc
        mono = s.mono
        s = s.replace(mono=mono.__class__(
            camera=mono.camera,
            map_init=_dc.replace(mono.map_init,
                                 homography_model_ratio=2.0)))
    engine = MageSlamTPU(s, cal, seed=args.seed)
    results = []
    for i, p in enumerate(poses_gt):
        img = world.render(cal, p, seed=500 + i)
        results.append(engine.process_frame(img, timestamp=i / 30.0))
    # raw tracking ATE (pre-fossilize)
    import jax.numpy as jnp
    from mageslam_tpu.geometry import se3
    est_r, gt_r = [], []
    for r in results:
        if r.state == TrackingState.TRACKING and r.pose is not None:
            est_r.append(np.asarray(
                se3.camera_center(jnp.asarray(r.pose))))
            gt_r.append(np.asarray(se3.camera_center(
                jnp.asarray(poses_gt[r.frame_id]))))
    rr, *_ = ate_rmse(
        np.asarray([np.concatenate([[1, 0, 0, 0], -c]) for c in est_r]),
        np.asarray([np.concatenate([[1, 0, 0, 0], -c]) for c in gt_r]))

    fossil = engine.fossilize()
    est, gt = [], []
    for r in results:
        if r.state == TrackingState.TRACKING and r.pose is not None:
            p = fossil.pose_for_frame(r.frame_id)
            if p is not None:
                est.append(p)
                gt.append(poses_gt[r.frame_id])
    rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
    extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    print(f"host orbit: tracked={len(est)}/45 ATE={rmse:.4f} "
          f"rawATE={rr:.4f} extent={extent:.3f} ratio={rmse/extent:.4f} "
          f"kf={engine.num_keyframes} mp={engine.num_map_points}")


if __name__ == "__main__":
    main()
