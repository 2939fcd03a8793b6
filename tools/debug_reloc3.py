"""Test candidate-pose-prior re-track as the relocalization fallback
(reference TryEstimatePoseFromKeyframe, PoseEstimator.cpp:439+): drive to
the end of the occlusion, then for each post-occlusion frame try
track_frame with each valid keyframe's pose as the prior.
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
from mageslam_tpu.tracking import track  # noqa: E402
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
    for i in range(occ1 + 1):
        eng.process_frame(seq[i], timestamp=i / 30.0)
    st = eng._state
    kf_valid = np.asarray(st.map.kf_valid)
    kf_fids = np.asarray(st.map.kf_frame_id)
    print("valid KFs:", [(k, int(kf_fids[k]))
                         for k in np.where(kf_valid)[0]])

    import dataclasses
    wide = s.replace(pose_estimation=dataclasses.replace(
        s.pose_estimation, search_radius=40.0, wider_search_radius=70.0))

    for fidx in [occ1 + 1, occ1 + 3]:
        feats = extract_for_settings(pyramid.to_gray_f32(seq[fidx]), cal,
                                     s.mono.camera, s.capacity.max_features)
        # BoW candidates for reference
        db = bdb.BowDatabase(st.vocab, st.kf_sig, st.kf_sig_valid)
        cand_idx, cand_score, cand_ok = bdb.query(
            db, feats.desc, feats.valid, jnp.zeros_like(st.map.kf_valid),
            qualifying_score=s.bag_of_words.qualifying_candidate_score,
            max_results=s.mapping.max_reloc_query_results)
        print(f"\nframe {fidx}: bow cands "
              f"{[(int(c), float(sc)) for c, sc in zip(np.asarray(cand_idx), np.asarray(cand_score))]}")
        for k in np.where(kf_valid)[0]:
            for tag, use_s in [("narrow", s), ("wide", wide)]:
                t = track.track_frame(st.map, feats, st.map.kf_pose[k],
                                      jnp.int32(k), cal, use_s,
                                      max_local_kf=s.capacity
                                      .local_ba_keyframes)
                if tag == "wide" or bool(t.success):
                    print(f"  kf={k} (f{int(kf_fids[k])}) {tag}: "
                          f"success={bool(t.success)} "
                          f"inl={int(t.num_inliers)}")


if __name__ == "__main__":
    main()
