"""Dissect the occlusion-recovery failure: drive the fused engine into the
occluded segment, then manually replay the relocalization path (BoW query ->
relocalize -> accept re-track) on the first post-occlusion frames with full
visibility into each gate.
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

from mageslam_tpu.bow import database as bdb  # noqa: E402
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,  # noqa: E402
                                       loop_trajectory, occlusion_frame)
from mageslam_tpu.ops import pyramid  # noqa: E402
from mageslam_tpu.runtime.fused import MageSlamTPUFused  # noqa: E402
from mageslam_tpu.tracking import relocalization, track  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402


def main():
    cal = default_calibration()
    world = SyntheticWorld.create_ring(900, seed=5)
    N = 150
    poses_gt = loop_trajectory(N, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt[:70])]
    n, occ0, occ1 = 70, 42, 50
    seq = list(imgs[:occ0]) \
        + [occlusion_frame(cal, seed=i) for i in range(occ1 - occ0)] \
        + list(imgs[occ1:n])

    s = loop_settings()
    eng = MageSlamTPUFused(s, cal, seed=1)
    for i, img in enumerate(seq):
        eng.process_frame(img, timestamp=i / 30.0)
        st = eng._state
        if i >= occ0 - 2:
            print(f"frame {i}: lost={int(st.lost_count)} "
                  f"init={bool(st.initialized)} "
                  f"nkf={int(np.sum(np.asarray(st.map.kf_valid)))} "
                  f"bow_trained={bool(st.bow_trained)} "
                  f"fs_reloc={int(st.frames_since_reloc)}")
        if i == occ1 + 1:
            break

    st = eng._state
    from mageslam_tpu.ops import matching
    from mageslam_tpu.solvers import pnp
    px = 1.0 / float(cal.fx)
    for fidx in [occ1 + 1, occ1 + 2, occ1 + 3]:
        gray = pyramid.to_gray_f32(seq[fidx])
        feats = extract_for_settings(gray, cal, s.mono.camera,
                                     s.capacity.max_features)
        print(f"\nframe {fidx}: n_feats={int(jnp.sum(feats.valid))}")
        db = bdb.BowDatabase(st.vocab, st.kf_sig, st.kf_sig_valid)
        cand_idx, cand_score, cand_ok = bdb.query(
            db, feats.desc, feats.valid, jnp.zeros_like(st.map.kf_valid),
            qualifying_score=s.bag_of_words.qualifying_candidate_score,
            max_results=s.mapping.max_reloc_query_results)
        cand_idx = jnp.concatenate(
            [st.last_kf[None].astype(jnp.int32), cand_idx])
        cand_ok = jnp.concatenate(
            [st.map.kf_valid[st.last_kf][None], cand_ok])
        print("cand_idx:", np.asarray(cand_idx), "ok:", np.asarray(cand_ok))

        key = jax.random.key(123)
        rres = relocalization.relocalize(
            key, st.map, feats, cand_idx, cand_ok & st.bow_trained,
            s.relocalization, float(cal.fx))
        print(f"reloc: success={bool(rres.success)} "
              f"n_inl={int(rres.num_inliers)} kf={int(rres.candidate_kf)}")
        if bool(rres.success):
            t2 = track.track_frame(st.map, feats, rres.pose,
                                   jnp.clip(rres.candidate_kf, 0), cal, s,
                                   max_local_kf=s.capacity
                                   .local_ba_keyframes)
            print(f"accept re-track: success={bool(t2.success)} "
                  f"inl={int(t2.num_inliers)} matched={int(t2.num_matched)}")

        for r in range(len(np.asarray(cand_idx))):
            kf = int(cand_idx[r])
            ok = bool(cand_ok[r])
            kf_has_mp = st.map.kf_feat_valid[kf] & (st.map.kf_assoc[kf] >= 0)
            idx, dist = matching.match(
                feats.desc, st.map.kf_desc[kf], feats.valid, kf_has_mp,
                max_distance=s.relocalization.matcher.max_hamming_distance,
                min_difference=s.relocalization
                .matcher.min_hamming_difference)
            matched = idx >= 0
            L = st.map.mp_valid.shape[0]
            mp_ids = st.map.kf_assoc[kf][jnp.clip(idx, 0)]
            good = matched & (mp_ids >= 0)
            quality = jnp.exp(-dist.astype(jnp.float32) / 12.0)
            res = pnp.pnp_ransac(
                jax.random.key(7), st.map.mp_pos[jnp.clip(mp_ids, 0, L - 1)],
                feats.xn_undist, good,
                inlier_thresh=jnp.float32(
                    s.relocalization.max_pnp_reprojection_error * px),
                huber_delta=jnp.float32(
                    s.relocalization.max_pnp_reprojection_error * px * 0.5),
                num_hypotheses=256, quality=quality)
            print(f"cand {r}: kf={kf} ok={ok} "
                  f"n_mp_feats={int(jnp.sum(kf_has_mp))} "
                  f"n_corr={int(jnp.sum(good))} "
                  f"pnp_inl={int(res.num_inliers)}")


if __name__ == "__main__":
    main()
