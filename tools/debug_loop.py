"""Diagnostic driver for the loop-closure / orbit accuracy scenarios.

Runs the fused engine on the synthetic ring (or orbit) sequence and dumps
per-frame diagnostics: tracking state, inliers, KF/MP counts, per-step
scale ratio vs ground truth (the monocular scale-drift signature), and
final Sim3-aligned ATE.  Usage:

    python tools/debug_loop.py [orbit|loop] [--frames N]
"""

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

from mageslam_tpu.geometry import se3  # noqa: E402
from mageslam_tpu.io.evaluation import ate_rmse  # noqa: E402
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       loop_trajectory, orbit_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused  # noqa: E402
from mageslam_tpu.runtime.slam import TrackingState  # noqa: E402

from test_slam_e2e import fast_settings  # noqa: E402
from test_e2e_loop_reloc import loop_settings  # noqa: E402


def cam_center(p7):
    import jax.numpy as jnp
    return np.asarray(se3.camera_center(jnp.asarray(p7)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenario", nargs="?", default="loop",
                    choices=["loop", "orbit", "occ"])
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--no-lc", action="store_true")
    ap.add_argument("--ba-steps", type=int, default=None,
                    help="override bundle_adjust.num_steps_per_run")
    ap.add_argument("--no-h", action="store_true",
                    help="disable homography model in init")
    ap.add_argument("--no-reloc", action="store_true",
                    help="never enter lost-mode relocalization")
    ap.add_argument("--features", type=int, default=None,
                    help="feature budget override (reference default 440)")
    ap.add_argument("--pose-graph", action="store_true",
                    help="Sim3 pose-graph loop correction")
    ap.add_argument("--no-cheap", action="store_true",
                    help="disable cheap loop closure")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    cal = default_calibration()
    if args.scenario == "occ":
        n = 70
        world = SyntheticWorld.create_ring(900, seed=5)
        poses_gt = loop_trajectory(150, radius=3.0)[:n]
        settings = loop_settings()
        seeds = [100 + i for i in range(n)]
    elif args.scenario == "loop":
        n = args.frames or 150
        world = SyntheticWorld.create_ring(900, seed=5)
        poses_gt = loop_trajectory(n, radius=3.0)
        settings = loop_settings()
        seeds = [100 + i for i in range(n)]
    else:
        n = args.frames or 45
        world = SyntheticWorld.create(700, seed=3)
        poses_gt = orbit_trajectory(n, radius=2.0, forward=0.02, sweep=0.9)
        settings = fast_settings()
        seeds = [500 + i for i in range(n)]

    if args.ba_steps is not None:
        import dataclasses
        settings = settings.replace(
            bundle_adjust=dataclasses.replace(
                settings.bundle_adjust, num_steps_per_run=args.ba_steps))
    if args.no_h:
        import dataclasses as _dc
        mono = settings.mono
        settings = settings.replace(mono=mono.__class__(
            camera=mono.camera,
            map_init=_dc.replace(mono.map_init,
                                 homography_model_ratio=2.0)))
    if args.features:
        import dataclasses as _dc
        mono = settings.mono
        fe = _dc.replace(mono.camera.features, num_features=args.features)
        cam = mono.camera.__class__(features=fe)
        cap = _dc.replace(settings.capacity,
                          max_features=int(args.features * 1.2) // 32 * 32)
        settings = settings.replace(
            mono=mono.__class__(camera=cam, map_init=mono.map_init),
            capacity=cap)
    if args.no_reloc:
        import dataclasses as _dc
        settings = settings.replace(
            track_local_map=_dc.replace(
                settings.track_local_map,
                tracking_lost_count_until_reloc=100000))
    if args.no_lc:
        settings = settings.replace(
            loop_closure=settings.loop_closure.__class__(
                enable_loop_closure=False,
                bundle_adjust=settings.loop_closure.bundle_adjust))
    if args.no_cheap:
        import dataclasses as _dc
        settings = settings.replace(
            mapping=_dc.replace(settings.mapping,
                                use_cheap_loop_closure=False))
    if args.pose_graph:
        import dataclasses as _dc
        settings = settings.replace(
            loop_closure=_dc.replace(settings.loop_closure,
                                     use_pose_graph=True))

    eng = MageSlamTPUFused(settings, cal, seed=1)
    diag = []
    for i in range(n):
        if args.scenario == "occ" and 42 <= i < 50:
            from mageslam_tpu.io.synthetic import occlusion_frame
            img = occlusion_frame(cal, seed=i - 42)
        else:
            img = world.render(cal, poses_gt[i], seed=seeds[i])
        eng.process_frame(img, timestamp=i / 30.0)
        st = eng._state
        diag.append(dict(
            nkf=int(np.sum(np.asarray(st.map.kf_valid))),
            nmp=int(np.sum(np.asarray(st.map.mp_valid))),
            pend=int(st.pend_count),
            ba_active=bool(st.ba_active),
            ba_left=int(st.ba_steps_left),
            lost=int(st.lost_count),
            loops=int(st.loops_closed),
            lam=float(st.lam),
            covis_thr=float(st.covis_threshold),
        ))
    results = eng.flush()
    fossil = eng.fossilize()

    est, gt, fids = [], [], []
    for i in range(n):
        r = results.get(i)
        if r is not None and r.state == TrackingState.TRACKING:
            p = fossil.pose_for_frame(r.frame_id)
            if p is not None:
                est.append(p)
                gt.append(poses_gt[i])
                fids.append(i)
    est = np.asarray(est)
    gt = np.asarray(gt)
    rmse, est_aligned, gt_c = ate_rmse(est, gt)
    extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))

    print(f"# scenario={args.scenario} frames={n} tracked={len(est)} "
          f"ATE={rmse:.4f} extent={extent:.3f} "
          f"ratio={rmse/extent:.4f} loops={eng.loops_closed}")

    # per-frame: state, inliers, scale ratio of consecutive steps
    gt_cs = np.asarray([cam_center(p) for p in gt])
    # per-step length ratio (est aligned / gt): scale drift signature
    d_est = np.linalg.norm(np.diff(est_aligned, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt_cs, axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-9)
    states = [results[i].state.name if results.get(i) else "?"
              for i in range(n)]
    if args.quiet:
        # summary only: scale-decay profile in 5 bins
        nb = 5
        for b in range(nb):
            seg = ratio[b * len(ratio) // nb:(b + 1) * len(ratio) // nb]
            print(f"  scale bin {b}: median step_ratio "
                  f"{np.median(seg):.3f}")
        # RAW tracked poses (pre-BA/fossil): same bins, step-length ratio
        raw = []
        for i in range(n):
            r = results.get(i)
            raw.append(None if r is None or r.pose is None
                       else cam_center(r.pose))
        rr = []
        for i in range(1, n):
            if raw[i] is None or raw[i - 1] is None:
                continue
            dg = np.linalg.norm(cam_center(poses_gt[i])
                                - cam_center(poses_gt[i - 1]))
            rr.append(np.linalg.norm(raw[i] - raw[i - 1]) / max(dg, 1e-9))
        rr = np.asarray(rr)
        for b in range(nb):
            seg = rr[b * len(rr) // nb:(b + 1) * len(rr) // nb]
            print(f"  raw bin {b}: median step_ratio {np.median(seg):.3f}")
        return
    j = 0
    for i in range(n):
        d = diag[i]
        r = ""
        if j < len(fids) and fids[j] == i:
            err = np.linalg.norm(est_aligned[j] - gt_cs[j])
            sr = ratio[j - 1] if 0 < j <= len(ratio) else float("nan")
            r = f" err={err:.3f} step_ratio={sr:.3f}"
            j += 1
        print(f"{i:4d} {states[i]:13s} kf={d['nkf']:3d} mp={d['nmp']:5d} "
              f"pend={d['pend']} ba={'A' if d['ba_active'] else '.'}"
              f"{d['ba_left']:4d} lost={d['lost']} loops={d['loops']} "
              f"lam={d['lam']:.2e} cth={d['covis_thr']:.1f}{r}")


if __name__ == "__main__":
    main()
