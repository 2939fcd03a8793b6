"""Scale forensics: per-keyframe local map scale vs ground truth.

For every valid keyframe k of a finished loop run:
  depth_scale(k)  = median( z_est(point) / z_true(pixel) ) over its
                    associated points — the local MAP scale at k's time
  step_scale(k)   = |c_est(k) - c_est(k-1)| / |c_gt(k) - c_gt(k-1)| —
                    the local POSE scale
If depth_scale leads the collapse, triangulation biases points close; if
step_scale leads, tracking under-estimates translation.
"""

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
    for i in range(N):
        img = world.render(cal, poses_gt[i], seed=100 + i)
        eng.process_frame(img, timestamp=i / 30.0)
    eng.flush()
    eng._settle()
    st = eng._state
    m = st.map
    kf_valid = np.asarray(m.kf_valid)
    kf_fid = np.asarray(m.kf_frame_id)
    order = sorted(np.where(kf_valid)[0], key=lambda k: kf_fid[k])

    fx, fy = float(cal.fx), float(cal.fy)
    cx, cy = float(cal.cx), float(cal.cy)
    prev_c_est, prev_c_gt = None, None
    print(" kf  frame  depth_scale  step_scale  n_assoc")
    for k in order:
        fid = int(kf_fid[k])
        _, depth = world.render(cal, poses_gt[fid], seed=100 + fid,
                                return_depth=True)
        assoc = np.asarray(m.kf_assoc[k])
        fv = np.asarray(m.kf_feat_valid[k])
        uv = np.asarray(m.kf_uv[k])
        sel = (assoc >= 0) & fv
        mp = np.asarray(m.mp_pos)[assoc[sel]]
        pose = m.kf_pose[k]
        z_est = np.asarray(se3.pose_apply(pose[None], jnp.asarray(mp)))[:, 2]
        u = np.clip(uv[sel, 0].round().astype(int), 0, cal.width - 1)
        v = np.clip(uv[sel, 1].round().astype(int), 0, cal.height - 1)
        z_true = depth[v, u]
        ok = (z_true > 0.1) & (z_est > 0.01)
        dscale = np.median(z_est[ok] / z_true[ok]) if ok.sum() > 3 else np.nan

        c_est = np.asarray(se3.camera_center(pose))
        c_gt = np.asarray(se3.camera_center(jnp.asarray(poses_gt[fid])))
        if prev_c_est is not None:
            step = (np.linalg.norm(c_est - prev_c_est)
                    / max(np.linalg.norm(c_gt - prev_c_gt), 1e-9))
        else:
            step = np.nan
        prev_c_est, prev_c_gt = c_est, c_gt
        print(f"{k:3d}  {fid:5d}  {dscale:11.3f}  {step:10.3f}  {sel.sum():7d}")


if __name__ == "__main__":
    main()
