"""Measure brute-force match precision vs ratio-test strength at the
separations relocalization must handle (8-14 frames on the ring)."""

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
from mageslam_tpu.ops import matching, pyramid  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402


def main():
    cal = default_calibration()
    world = SyntheticWorld.create_ring(900, seed=5)
    poses_gt = loop_trajectory(150, radius=3.0)
    s = loop_settings()
    fx, fy = float(cal.fx), float(cal.fy)
    cx, cy = float(cal.cx), float(cal.cy)

    fa = 52
    img_a, dep_a = world.render(cal, poses_gt[fa], seed=100 + fa,
                                return_depth=True)
    feats_a = extract_for_settings(pyramid.to_gray_f32(img_a), cal,
                                   s.mono.camera, s.capacity.max_features)
    uv_a = np.asarray(feats_a.uv)
    qa = jnp.asarray(poses_gt[fa])

    for fb in [44, 40, 38]:
        img_b = world.render(cal, poses_gt[fb], seed=100 + fb)
        feats_b = extract_for_settings(pyramid.to_gray_f32(img_b), cal,
                                       s.mono.camera,
                                       s.capacity.max_features)
        uv_b = np.asarray(feats_b.uv)
        qb = jnp.asarray(poses_gt[fb])
        for md, maxd in [(1, 50), (8, 50), (16, 50), (24, 50), (16, 40),
                         (24, 40), (32, 60)]:
            idx, dist = matching.match(
                feats_a.desc, feats_b.desc, feats_a.valid, feats_b.valid,
                max_distance=maxd, min_difference=md)
            idx = np.asarray(idx)
            matched = np.where(idx >= 0)[0]
            nerr = 0
            for f in matched:
                u, v = uv_a[f]
                zi = dep_a[int(round(v)), int(round(u))]
                xc = np.array([(u - cx) / fx * zi, (v - cy) / fy * zi, zi])
                Xw = np.asarray(se3.pose_apply(se3.pose_inverse(qa), xc))
                yb = np.asarray(se3.pose_apply(qb, Xw))
                if yb[2] <= 0:
                    continue
                ub = fx * yb[0] / yb[2] + cx
                vb = fy * yb[1] / yb[2] + cy
                if np.hypot(ub - uv_b[idx[f]][0],
                            vb - uv_b[idx[f]][1]) < 3.0:
                    nerr += 1
            n = len(matched)
            print(f"sep={fa-fb:2d} min_diff={md:2d} max_d={maxd}: "
                  f"matches={n:3d} good={nerr:3d} "
                  f"precision={100.0*nerr/max(n,1):3.0f}%")
        print()


if __name__ == "__main__":
    main()
