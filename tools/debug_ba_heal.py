"""Controlled test of the BA self-heal assumption.

Build a window-shaped problem that mimics one mapping commit on the ring:
  - 6 'old' keyframes on an arc with EXACT poses; 300 'old' points with
    exact positions; observations = exact projections + noise.
  - 1 'new' keyframe whose pose has a 10% SHORT last baseline step, plus
    120 'new' points triangulated consistently with that short baseline
    (i.e., scaled toward the new camera), each observed ONLY by the new
    keyframe and its predecessor.
  - gauge: oldest fixed (like build_local_window).
Run bundle_adjust and report: recovered step ratio of the new keyframe and
median depth ratio of the new points.  If BA is healthy, both -> ~1.0.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

from mageslam_tpu.geometry import se3  # noqa: E402
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, bundle_adjust,  # noqa: E402
                                                empty_tethers)


def ring_pose(theta, radius=3.0, look_ahead=0.55):
    c = np.array([radius * np.cos(theta), 0.0, radius * np.sin(theta)])
    tangent = np.array([-np.sin(theta), 0.0, np.cos(theta)])
    outward = np.array([np.cos(theta), 0.0, np.sin(theta)])
    fwd = tangent + look_ahead * outward
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    upv = np.cross(fwd, right)
    Rcw = np.stack([right, upv, fwd])
    t = -Rcw @ c
    return np.asarray(se3.make_pose(se3.mat_to_quat(jnp.asarray(
        Rcw.astype(np.float32))), jnp.asarray(t.astype(np.float32))))


def main():
    rng = np.random.default_rng(3)
    fx = 272.0
    noise_px = 1.4
    K = 7            # 6 old + 1 new
    dth = 0.085      # ~ KF spacing on the ring (radians)
    thetas = np.array([k * dth for k in range(K)])
    poses_gt = np.stack([ring_pose(th) for th in thetas])

    # wall points over a wide sector; classify old/new by visibility
    ang = rng.uniform(-0.5, 2.5, 2000)
    rad = rng.uniform(6.0, 9.0, 2000)
    cand = np.stack([rad * np.cos(ang),
                     rng.uniform(-2.0, 2.0, 2000),
                     rad * np.sin(ang)], -1).astype(np.float32)
    vis = np.zeros((2000, K), bool)
    for k in range(K):
        y = np.asarray(se3.pose_apply(jnp.asarray(poses_gt[k])[None],
                                      jnp.asarray(cand)))
        z = y[:, 2]
        uvn = y[:, :2] / np.maximum(z[:, None], 1e-6)
        vis[:, k] = (z > 0.5) & (np.abs(uvn[:, 0]) < 160 / fx) \
            & (np.abs(uvn[:, 1]) < 90 / fx)
    # old: visible in >=2 of the first K-1 cameras; new: visible in the
    # last camera and its predecessor but few older views (the frontier)
    oldsel = np.where(vis[:, :K - 1].sum(1) >= 2)[0][:330]
    newsel = np.where(vis[:, K - 1] & vis[:, K - 2]
                      & (vis[:, :K - 2].sum(1) <= 1))[0][:120]
    old_pts = cand[oldsel]
    new_pts = cand[newsel]

    # corrupt: new keyframe's step 10% short
    c_prev = np.asarray(se3.camera_center(jnp.asarray(poses_gt[K - 2])))
    c_new = np.asarray(se3.camera_center(jnp.asarray(poses_gt[K - 1])))
    c_short = c_prev + 0.9 * (c_new - c_prev)
    q = poses_gt[K - 1][:4]
    R = np.asarray(se3.quat_to_mat(jnp.asarray(q)))
    pose_new_short = np.concatenate([q, -R @ c_short]).astype(np.float32)
    poses_init = poses_gt.copy()
    poses_init[K - 1] = pose_new_short

    # new points: consistent with the short baseline — scale them toward
    # the predecessor camera center by 0.9 (depth from Kc roughly scales)
    c_anchor = c_prev
    new_pts_short = (c_anchor + 0.9 * (new_pts - c_anchor)).astype(
        np.float32)
    pts_init = np.concatenate([old_pts, new_pts_short])
    pts_true = np.concatenate([old_pts, new_pts])

    L = pts_init.shape[0]
    # observations: old points seen by all KFs whose projection is in FOV;
    # new points seen ONLY by the last two KFs
    obs_kf = np.tile(np.arange(K, dtype=np.int32)[None, :], (L, 1))
    xn = np.zeros((L, K, 2), np.float32)
    valid = np.zeros((L, K), bool)
    for k in range(K):
        y = np.asarray(se3.pose_apply(jnp.asarray(poses_gt[k])[None],
                                      jnp.asarray(pts_true)))
        z = y[:, 2]
        uvn = y[:, :2] / np.maximum(z[:, None], 1e-6)
        inview = (z > 0.5) & (np.abs(uvn[:, 0]) < 160 / fx) \
            & (np.abs(uvn[:, 1]) < 90 / fx)
        xn[:, k, :] = uvn + rng.normal(0, noise_px / fx, (L, 2))
        valid[:, k] = inview
    is_new = np.arange(L) >= old_pts.shape[0]
    valid[is_new, : K - 2] = False  # new points only in last two KFs
    print("old points visible in new KF:",
          int(valid[~is_new, K - 1].sum()),
          "| new points visible:", int(valid[is_new, K - 1].sum()))

    kf_fixed = np.zeros(K, bool)
    kf_fixed[0] = True  # oldest anchored, like build_local_window

    problem = BAProblem(
        kf_poses=jnp.asarray(poses_init),
        kf_fixed=jnp.asarray(kf_fixed),
        points=jnp.asarray(pts_init),
        point_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_xn=jnp.asarray(xn),
        obs_valid=jnp.asarray(valid),
        **empty_tethers(0))

    for steps in (8, 24, 80):
        res = bundle_adjust(problem,
                            huber_delta=jnp.float32(1.8 / fx),
                            max_outlier_error=jnp.float32(7.25 / fx),
                            num_steps=steps, lam0=1e-3)
        c_out = np.asarray(se3.camera_center(res.kf_poses[K - 1]))
        step_ratio = (np.linalg.norm(c_out - c_prev)
                      / np.linalg.norm(c_new - c_prev))
        zr = []
        pout = np.asarray(res.points)
        for i in np.where(is_new)[0]:
            zt = np.linalg.norm(pts_true[i] - c_new)
            ze = np.linalg.norm(pout[i] - c_out)
            zr.append(ze / zt)
        print(f"steps={steps:3d}: new-KF step ratio {step_ratio:.4f} "
              f"(init 0.90, want 1.0), new-point depth ratio "
              f"{np.median(zr):.4f}, mse={float(res.mean_sq_error)*fx*fx:.3f}px^2")


if __name__ == "__main__":
    main()
