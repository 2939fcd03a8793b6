"""Triangulation-bias forensics: for each mapping commit, compare each
NEWLY created point's depth (est units) against ground-truth depth at its
creating pixel, normalized by the CURRENT local map scale — a ratio < 1
means new points are born too close relative to the existing map, i.e.
triangulation itself amplifies scale drift."""

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

import jax.numpy as jnp  # noqa: E402

from mageslam_tpu.geometry import se3  # noqa: E402
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402


def main():
    cal = default_calibration()
    world = SyntheticWorld.create_ring(900, seed=5)
    N = 150
    poses_gt = loop_trajectory(N, radius=3.0)
    s = loop_settings()
    s = s.replace(loop_closure=s.loop_closure.__class__(
        enable_loop_closure=False, bundle_adjust=s.loop_closure.bundle_adjust))
    eng = MageSlamTPUFused(s, cal, seed=1)
    seen = set()
    prev_anchor_count = {}
    for i in range(N):
        img = world.render(cal, poses_gt[i], seed=100 + i)
        eng.process_frame(img, timestamp=i / 30.0)
        st = eng._state
        m = st.map
        valid = np.asarray(m.mp_valid)
        gen = np.asarray(m.mp_created_kf_gen)
        new_ids = [l for l in np.where(valid)[0]
                   if (l, int(gen[l])) not in seen]
        for l in np.where(valid)[0]:
            seen.add((l, int(gen[l])))
        if not new_ids:
            continue
        anchors = np.asarray(m.mp_anchor_kf)[new_ids]
        kf_fid = np.asarray(m.kf_frame_id)
        # group by anchor keyframe
        for a in np.unique(anchors):
            ids = [l for l, aa in zip(new_ids, anchors) if aa == a]
            fid = int(kf_fid[a])
            if fid < 0:
                continue
            _, depth = world.render(cal, poses_gt[fid], seed=100 + fid,
                                    return_depth=True)
            pose = m.kf_pose[a]
            pts = np.asarray(m.mp_pos)[ids]
            z_est = np.asarray(se3.pose_apply(pose[None],
                                              jnp.asarray(pts)))[:, 2]
            # pixel of each point: project
            y = np.asarray(se3.pose_apply(pose[None], jnp.asarray(pts)))
            u = (float(cal.fx) * y[:, 0] / np.maximum(y[:, 2], 1e-6)
                 + float(cal.cx))
            v = (float(cal.fy) * y[:, 1] / np.maximum(y[:, 2], 1e-6)
                 + float(cal.cy))
            ui = np.clip(u.round().astype(int), 0, cal.width - 1)
            vi = np.clip(v.round().astype(int), 0, cal.height - 1)
            z_true = depth[vi, ui]
            ok = (z_true > 0.1) & (z_est > 0.01)
            if ok.sum() < 3:
                continue
            ratios = z_est[ok] / z_true[ok]
            # current local map scale from the anchor's OLD associated pts
            assoc = np.asarray(m.kf_assoc[a])
            fv = np.asarray(m.kf_feat_valid[a])
            sel = (assoc >= 0) & fv
            old_sel = [f for f in np.where(sel)[0]
                       if assoc[f] not in ids]
            if len(old_sel) > 5:
                mp_old = np.asarray(m.mp_pos)[assoc[old_sel]]
                z_e2 = np.asarray(se3.pose_apply(
                    pose[None], jnp.asarray(mp_old)))[:, 2]
                uv = np.asarray(m.kf_uv[a])[old_sel]
                zt2 = depth[np.clip(uv[:, 1].round().astype(int), 0,
                                    cal.height - 1),
                            np.clip(uv[:, 0].round().astype(int), 0,
                                    cal.width - 1)]
                ok2 = (zt2 > 0.1) & (z_e2 > 0.01)
                map_scale = np.median(z_e2[ok2] / zt2[ok2]) \
                    if ok2.sum() > 3 else np.nan
            else:
                map_scale = np.nan
            print(f"frame {i:3d} anchor_kf {a:2d} (f{fid:3d}): "
                  f"n_new={ok.sum():3d} new_scale="
                  f"{np.median(ratios):.3f} map_scale={map_scale:.3f} "
                  f"rel={np.median(ratios)/map_scale:.3f}"
                  if np.isfinite(map_scale) else
                  f"frame {i:3d} anchor_kf {a:2d}: n_new={ok.sum():3d} "
                  f"new={np.median(ratios):.3f} (no old pts)")


if __name__ == "__main__":
    main()
