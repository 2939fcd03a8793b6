"""Prototype the strengthened reloc: cluster-wide 2D-3D pool + minimal-4
GN-from-candidate-pose RANSAC hypotheses."""

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

from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       loop_trajectory, occlusion_frame)
from mageslam_tpu.mapstore import map_state as ms  # noqa: E402
from mageslam_tpu.ops import matching, pyramid  # noqa: E402
from mageslam_tpu.runtime.fused import MageSlamTPUFused  # noqa: E402
from mageslam_tpu.solvers import pnp  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402


def main():
    cal = default_calibration()
    world = SyntheticWorld.create_ring(900, seed=5)
    poses_gt = loop_trajectory(150, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt[:70])]
    n, occ0, occ1 = 70, 42, 50
    seq = list(imgs[:occ0]) \
        + [occlusion_frame(cal, seed=i) for i in range(occ1 - occ0)] \
        + list(imgs[occ1:n])

    s = loop_settings()
    eng = MageSlamTPUFused(s, cal, seed=1)
    # drive only to the end of the occlusion: frame 50 is the first chance
    for i in range(occ1):
        eng.process_frame(seq[i], timestamp=i / 30.0)
    st = eng._state
    px = 1.0 / float(cal.fx)
    K, F, L = ms.capacities(st.map)

    for fidx in [occ1, occ1 + 1, occ1 + 2]:
        feats = extract_for_settings(pyramid.to_gray_f32(seq[fidx]), cal,
                                     s.mono.camera, s.capacity.max_features)
        for kf in [10, 9]:
            # cluster pool: map points of the candidate's local map
            kf_idx, kf_ok = ms.connected_keyframes(
                st.map, jnp.int32(kf), min_shared=1, max_connected=7)
            kf_list = jnp.concatenate([jnp.asarray(kf, jnp.int32)[None],
                                       kf_idx])
            kf_okl = jnp.concatenate([jnp.array([True]), kf_ok])
            pool = ms.local_map_points(st.map, kf_list, kf_okl)
            idx, dist = matching.match(
                feats.desc, st.map.mp_desc, feats.valid,
                pool & st.map.mp_valid,
                max_distance=s.relocalization.matcher.max_hamming_distance,
                min_difference=s.relocalization
                .matcher.min_hamming_difference)
            good = idx >= 0
            pts = st.map.mp_pos[jnp.clip(idx, 0, L - 1)]
            quality = jnp.exp(-dist.astype(jnp.float32) / 12.0)

            # minimal-4 GN-from-kf-pose hypotheses
            key = jax.random.key(fidx * 10 + kf)
            nq = jnp.asarray(good, jnp.float32) * quality
            p = nq / jnp.maximum(jnp.sum(nq), 1e-9)
            init_pose = st.map.kf_pose[kf]
            thr = jnp.float32(
                s.relocalization.max_pnp_reprojection_error * px)

            def hyp(k):
                sel = jax.random.choice(k, F, shape=(4,), replace=False,
                                        p=p)
                mask = jnp.zeros(F, bool).at[sel].set(True) & good
                r = pnp.refine_pose(init_pose, pts, feats.xn_undist, mask,
                                    huber_delta=thr, outlier_thresh=thr,
                                    iters=10)
                rr, z = pnp.reprojection_residuals(r.pose, pts,
                                                   feats.xn_undist)
                err = jnp.sum(rr * rr, -1)
                inl = good & (z > 0) & (err < thr ** 2)
                return r.pose, jnp.sum(inl)

            keys = jax.random.split(key, 128)
            poses, scores = jax.vmap(hyp)(keys)
            best = int(jnp.argmax(scores))
            # polish
            res = pnp.refine_pose(poses[best], pts, feats.xn_undist, good,
                                  huber_delta=thr, outlier_thresh=thr,
                                  iters=8)
            print(f"frame {fidx} kf={kf}: pool={int(jnp.sum(pool))} "
                  f"corr={int(jnp.sum(good))} best_hyp_inl="
                  f"{int(scores[best])} polished_inl={int(res.num_inliers)}")
            if int(res.num_inliers) >= 10:
                from mageslam_tpu.tracking import track
                t2 = track.track_frame(st.map, feats, res.pose,
                                       jnp.int32(kf), cal, s,
                                       max_local_kf=s.capacity
                                       .local_ba_keyframes)
                print(f"   re-track: success={bool(t2.success)} "
                      f"inl={int(t2.num_inliers)}")


if __name__ == "__main__":
    main()
