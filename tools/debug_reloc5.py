"""Dissect the CURRENT relocalize path per candidate at frames 50-51."""

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

from mageslam_tpu.bow import database as bdb  # noqa: E402
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       loop_trajectory, occlusion_frame)
from mageslam_tpu.mapstore import map_state as ms  # noqa: E402
from mageslam_tpu.ops import matching, pyramid  # noqa: E402
from mageslam_tpu.runtime.fused import MageSlamTPUFused  # noqa: E402
from mageslam_tpu.solvers import pnp  # noqa: E402
from mageslam_tpu.tracking import relocalization  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402
import dataclasses  # noqa: E402


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
    s = s.replace(loop_closure=s.loop_closure.__class__(
        enable_loop_closure=False,
        bundle_adjust=s.loop_closure.bundle_adjust))
    eng = MageSlamTPUFused(s, cal, seed=1)
    for i in range(occ1):
        eng.process_frame(seq[i], timestamp=i / 30.0)
    st = eng._state
    px = 1.0 / float(cal.fx)
    K, F, L = ms.capacities(st.map)
    print("last_kf:", int(st.last_kf), "kf_fids:",
          [int(f) for f in np.asarray(st.map.kf_frame_id)
           [np.asarray(st.map.kf_valid)]])

    for fidx in [occ1, occ1 + 1]:
        feats = extract_for_settings(pyramid.to_gray_f32(seq[fidx]), cal,
                                     s.mono.camera, s.capacity.max_features)
        db = bdb.BowDatabase(st.vocab, st.kf_sig, st.kf_sig_valid)
        cand_idx, _, cand_ok = bdb.query(
            db, feats.desc, feats.valid, jnp.zeros_like(st.map.kf_valid),
            qualifying_score=s.bag_of_words.qualifying_candidate_score,
            max_results=s.mapping.max_reloc_query_results)
        cand_idx = jnp.concatenate(
            [st.last_kf[None].astype(jnp.int32), cand_idx])
        cand_ok = jnp.concatenate(
            [st.map.kf_valid[st.last_kf][None], cand_ok])
        print(f"\nframe {fidx}: cands={np.asarray(cand_idx)}")
        rres = relocalization.relocalize(
            jax.random.key(50 + fidx), st.map, feats, cand_idx,
            cand_ok & st.bow_trained, s.relocalization, float(cal.fx))
        print(f"relocalize: success={bool(rres.success)} "
              f"n_inl={int(rres.num_inliers)} kf={int(rres.candidate_kf)}")

        # replicate one_candidate for each, printing gates
        for r in range(len(np.asarray(cand_idx))):
            kf = jnp.int32(int(cand_idx[r]))
            kf_idx, kf_ok = ms.connected_keyframes(st.map, kf, min_shared=1,
                                                   max_connected=7)
            kf_list = jnp.concatenate([kf[None], kf_idx])
            kf_okl = jnp.concatenate([jnp.array([True]), kf_ok])
            pool = ms.local_map_points(st.map, kf_list, kf_okl) \
                & st.map.mp_valid
            idx, dist = matching.match(
                feats.desc, st.map.mp_desc, feats.valid, pool,
                max_distance=s.relocalization.matcher.max_hamming_distance,
                min_difference=s.relocalization
                .matcher.min_hamming_difference)
            good = idx >= 0
            pts = st.map.mp_pos[jnp.clip(idx, 0, L - 1)]
            quality = jnp.exp(-dist.astype(jnp.float32) / 12.0)
            res = pnp.pnp_ransac(
                jax.random.key(7), pts, feats.xn_undist, good,
                inlier_thresh=jnp.float32(
                    s.relocalization.max_pnp_reprojection_error * px),
                huber_delta=jnp.float32(
                    s.relocalization.max_pnp_reprojection_error * px * .5),
                num_hypotheses=256, quality=quality,
                init_pose=st.map.kf_pose[kf])
            ncorr = int(jnp.sum(good))
            pct = s.relocalization.ransac_inliers_pct_required
            print(f"  cand kf={int(kf)} pool={int(jnp.sum(pool))} "
                  f"corr={ncorr} inl={int(res.num_inliers)} "
                  f"need_pct={pct*ncorr:.1f} "
                  f"min_corr_ok={ncorr >= s.relocalization.min_brute_force_correspondences}")


if __name__ == "__main__":
    main()
