"""Verify brute-force reloc matches against ground-truth geometry.

For the post-occlusion frame F and a candidate keyframe KF (frame id fk):
render gt depth for both, back-project each matched frame feature to 3D via
gt depth, transform into the KF camera via gt poses, project, and measure
pixel error vs the matched KF feature.  Distinguishes "descriptors match
wrong features" from "PnP/map geometry broken".
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
from mageslam_tpu.ops import matching, pyramid  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402


def main():
    cal = default_calibration()
    world = SyntheticWorld.create_ring(900, seed=5)
    poses_gt = loop_trajectory(150, radius=3.0)
    s = loop_settings()

    fa = 52   # post-occlusion frame
    img_a, dep_a = world.render(cal, poses_gt[fa], seed=100 + fa,
                                return_depth=True)
    feats_a = extract_for_settings(pyramid.to_gray_f32(img_a), cal,
                                   s.mono.camera, s.capacity.max_features)

    for fb in [51, 50, 48, 44, 40, 36]:
        img_b = world.render(cal, poses_gt[fb], seed=100 + fb)
        feats_b = extract_for_settings(pyramid.to_gray_f32(img_b), cal,
                                       s.mono.camera,
                                       s.capacity.max_features)
        tag = f"sep={fa-fb}"
        matcher = s.relocalization.matcher
        idx, dist = matching.match(
            feats_a.desc, feats_b.desc, feats_a.valid, feats_b.valid,
            max_distance=matcher.max_hamming_distance,
            min_difference=matcher.min_hamming_difference)
        idx = np.asarray(idx)
        matched = idx >= 0
        n = matched.sum()

        # gt check: back-project frame-a features via depth, into frame b
        uv_a = np.asarray(feats_a.uv)
        uv_b = np.asarray(feats_b.uv)
        fx, fy = float(cal.fx), float(cal.fy)
        cx, cy = float(cal.cx), float(cal.cy)
        errs = []
        for f in np.where(matched)[0]:
            u, v = uv_a[f]
            zi = dep_a[int(round(v)), int(round(u))]
            xc = np.array([(u - cx) / fx * zi, (v - cy) / fy * zi, zi])
            qa = jnp.asarray(poses_gt[fa])
            qb = jnp.asarray(poses_gt[fb])
            Xw = np.asarray(se3.pose_apply(se3.pose_inverse(qa), xc))
            yb = np.asarray(se3.pose_apply(qb, Xw))
            if yb[2] <= 0:
                errs.append(1e9)
                continue
            ub = fx * yb[0] / yb[2] + cx
            vb = fy * yb[1] / yb[2] + cy
            e = np.hypot(ub - uv_b[idx[f]][0], vb - uv_b[idx[f]][1])
            errs.append(e)
        errs = np.asarray(errs)
        good = (errs < 3.0).sum()

        # visibility + repeatability: project ALL frame-a features into b
        # via gt depth; how many are in-bounds, and how many have a
        # detected b-feature within 3px?
        valid_a = np.asarray(feats_a.valid)
        valid_b = np.asarray(feats_b.valid)
        qa = jnp.asarray(poses_gt[fa])
        qb = jnp.asarray(poses_gt[fb])
        n_vis = 0
        n_rep = 0
        da_np = np.asarray(feats_a.desc)
        db_np = np.asarray(feats_b.desc)
        n_desc_ok = 0
        for f in np.where(valid_a)[0]:
            u, v = uv_a[f]
            zi = dep_a[int(round(v)), int(round(u))]
            xc = np.array([(u - cx) / fx * zi, (v - cy) / fy * zi, zi])
            Xw = np.asarray(se3.pose_apply(se3.pose_inverse(qa), xc))
            yb = np.asarray(se3.pose_apply(qb, Xw))
            if yb[2] <= 0.2:
                continue
            ub = fx * yb[0] / yb[2] + cx
            vb = fy * yb[1] / yb[2] + cy
            if not (0 <= ub < cal.width and 0 <= vb < cal.height):
                continue
            n_vis += 1
            d2 = (uv_b[valid_b, 0] - ub) ** 2 + (uv_b[valid_b, 1] - vb) ** 2
            near = np.where(valid_b)[0][d2 < 9.0]
            if len(near):
                n_rep += 1
                # oracle descriptor test: is the gt counterpart the
                # global Hamming argmin?
                hd = np.unpackbits(
                    (da_np[f][None] ^ db_np[valid_b]).view(np.uint8),
                    axis=1).sum(1)
                bidx = np.where(valid_b)[0][np.argmin(hd)]
                if bidx in near:
                    n_desc_ok += 1
        print(f"[{tag}] matches={n}, gt<3px={good} "
              f"({100.0*good/max(n,1):.0f}%), med={np.median(errs):.1f}px | "
              f"vis={n_vis} rep={n_rep} desc_argmin_ok={n_desc_ok} "
              f"({100.0*n_desc_ok/max(n_rep,1):.0f}% of repeatable)")


if __name__ == "__main__":
    main()
