"""Calibrate a loop-closure-WINS scenario (VERDICT r3 next #3).

Find a ring configuration where the no-loop-closure run demonstrably
drifts (>= 5% of extent) and enabling loop closure cuts ATE by >= 30%,
so the strict relative clause (rmse_lc < 0.7 * rmse_off) can return to
the e2e suite.  Levers: trajectory length, cheap-LC off (no implicit
seam stitching), local-BA budget throttle.

Usage: python tools/debug_lc_wins.py [n_frames] [ba_mult]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mageslam_tpu.io.evaluation import ate_rmse
    from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                           default_calibration,
                                           loop_trajectory)
    from mageslam_tpu.runtime.fused import MageSlamTPUFused
    from mageslam_tpu.runtime.slam import TrackingState
    from test_e2e_loop_reloc import loop_settings

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    ba_steps = int(sys.argv[2]) if len(sys.argv) > 2 else None

    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(n, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt)]

    def run(lc_on, use_pg=True):
        s = loop_settings()
        s = s.replace(
            mapping=dataclasses.replace(s.mapping,
                                        use_cheap_loop_closure=False),
            loop_closure=dataclasses.replace(
                s.loop_closure, enable_loop_closure=lc_on,
                use_pose_graph=use_pg),
            capacity=dataclasses.replace(s.capacity, max_keyframes=64,
                                         pose_history_size=1024))
        if ba_steps is not None:
            s = s.replace(bundle_adjust=dataclasses.replace(
                s.bundle_adjust, num_steps_per_run=ba_steps))
        eng = MageSlamTPUFused(s, cal, seed=1)
        t0 = time.time()
        for i, img in enumerate(imgs):
            eng.process_frame(img, timestamp=i / 30.0)
        results = eng.flush()
        fossil = eng.fossilize()
        est, gt = [], []
        for i in range(n):
            r = results.get(i)
            if r is not None and r.state == TrackingState.TRACKING:
                p = fossil.pose_for_frame(r.frame_id)
                if p is not None:
                    est.append(p)
                    gt.append(poses_gt[i])
        rmse, _, gt_c = ate_rmse(np.asarray(est), np.asarray(gt))
        extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
        print(f"  lc={lc_on} pg={use_pg}: tracked={len(est)}/{n} "
              f"loops={eng.loops_closed} rmse={rmse:.3f} "
              f"extent={extent:.2f} pct={100*rmse/extent:.1f}% "
              f"[{time.time()-t0:.0f}s]", flush=True)
        return rmse, extent, eng.loops_closed

    print(f"n={n} ba_steps={ba_steps}")
    r_off, ext, _ = run(False)
    r_pg, _, loops_pg = run(True, True)
    r_rigid, _, loops_r = run(True, False)
    print(f"SUMMARY n={n}: off={r_off:.3f} ({100*r_off/ext:.1f}%) "
          f"pg={r_pg:.3f} ({100*r_pg/ext:.1f}%, {loops_pg} loops, "
          f"ratio {r_pg/max(r_off,1e-9):.2f}) "
          f"rigid={r_rigid:.3f} ({100*r_rigid/ext:.1f}%, {loops_r} loops, "
          f"ratio {r_rigid/max(r_off,1e-9):.2f})")


if __name__ == "__main__":
    main()
