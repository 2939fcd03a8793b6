"""Relocalization: recover a lost frame's pose from BoW candidates.

Equivalent of the reference's lost-mode path (Tasks/PoseEstimationWorker
.cpp:74-97: Map.FindSimilarKeyframes -> TryEstimatePoseFromCandidates;
Tracking/PoseEstimator.cpp:219-437: per-candidate brute-force descriptor
matching against the keyframe's map-point-associated features, then
round-robin RANSAC PnP over the candidates, RelocalizationSettings gates).

TPU shape: the candidate loop is a lax.scan over R fixed candidate slots;
each iteration runs one batched match + one vmapped PnP-RANSAC; the best
candidate by inlier count wins.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import RelocalizationSettings
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.ops import matching
from mageslam_tpu.solvers import pnp
from mageslam_tpu.tracking.frontend import FrameFeatures


class RelocResult(NamedTuple):
    success: jnp.ndarray
    pose: jnp.ndarray
    num_inliers: jnp.ndarray
    candidate_kf: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("settings", "fx"))
def relocalize(key: jax.Array, m: ms.MapState, feats: FrameFeatures,
               cand_idx: jnp.ndarray, cand_ok: jnp.ndarray,
               settings: RelocalizationSettings, fx: float) -> RelocResult:
    """Try each BoW candidate keyframe; return the best PnP pose."""
    s = settings
    px = 1.0 / fx
    K, F, L = ms.capacities(m)
    R = cand_idx.shape[0]
    keys = jax.random.split(key, R)

    def one_candidate(carry, inp):
        kf, ok, kk = inp
        # 2D-3D pool: map points of the candidate's covisible CLUSTER (the
        # reference relocalizes against candidate clusters too,
        # LoopClosureWorker.cpp:215-250; per-keyframe pools lose ~60% of
        # the true correspondences to association sparsity, which is fatal
        # at wide-baseline match precision)
        kf_idx, kf_ok = ms.connected_keyframes(m, kf, min_shared=1,
                                               max_connected=7)
        kf_list = jnp.concatenate([jnp.asarray(kf, jnp.int32)[None],
                                   kf_idx])
        kf_okl = jnp.concatenate([jnp.array([True]), kf_ok])
        pool = ms.local_map_points(m, kf_list, kf_okl) & m.mp_valid & ok
        idx_mp, dist_mp = matching.match(
            feats.desc, m.mp_desc, feats.valid, pool,
            max_distance=s.matcher.max_hamming_distance,
            min_difference=s.matcher.min_hamming_difference)
        # dual pool: ALSO match the candidate keyframe's own feature
        # descriptors (sampled at ITS viewpoint — fresher than the medoid
        # representatives when the candidate is recent, e.g. a
        # just-recovered frontier keyframe), preferring those hits
        # (reference TryEstimatePoseFromCandidates matches
        # candidate-keyframe features, PoseEstimator.cpp:219-437)
        kf_has_mp = m.kf_feat_valid[kf] & (m.kf_assoc[kf] >= 0) & ok
        idx_kf, dist_kf = matching.match(
            feats.desc, m.kf_desc[kf], feats.valid, kf_has_mp,
            max_distance=s.matcher.max_hamming_distance,
            min_difference=s.matcher.min_hamming_difference)
        mp_from_kf = m.kf_assoc[kf][jnp.clip(idx_kf, 0)]
        use_kf = (idx_kf >= 0) & (mp_from_kf >= 0)
        idx = jnp.where(use_kf, mp_from_kf, idx_mp)
        dist = jnp.where(use_kf, dist_kf, dist_mp)
        good = use_kf | (idx_mp >= 0)
        idx = jnp.where(good, idx, -1)
        pts = m.mp_pos[jnp.clip(idx, 0, L - 1)]
        n_corr = jnp.sum(good)

        # PROSAC-style quality from Hamming distance: at wide baselines
        # (10+ frames of viewpoint change) brute-force precision is only
        # ~40-60%, but true matches concentrate at low distance — biasing
        # the minimal-set sampling by exp(-d/12) lifts the all-inlier set
        # probability enough for the hypothesis budget to succeed
        quality = jnp.exp(-dist.astype(jnp.float32) / 12.0)
        res = pnp.pnp_ransac(
            kk, pts, feats.xn_undist, good,
            inlier_thresh=jnp.float32(s.max_pnp_reprojection_error * px),
            huber_delta=jnp.float32(s.max_pnp_reprojection_error * px * 0.5),
            num_hypotheses=256, quality=quality,
            init_pose=m.kf_pose[kf])
        enough = (n_corr >= s.min_brute_force_correspondences) & ok
        n_inl = jnp.where(enough, res.num_inliers, -1)
        pct_ok = res.num_inliers >= s.ransac_inliers_pct_required * \
            jnp.maximum(n_corr, 1)
        n_inl = jnp.where(pct_ok, n_inl, -1)

        best_n, best_pose, best_kf = carry
        better = n_inl > best_n
        carry = (jnp.where(better, n_inl, best_n),
                 jnp.where(better, res.pose, best_pose),
                 jnp.where(better, kf, best_kf))
        return carry, None

    init = (jnp.int32(-1),
            jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
            jnp.int32(-1))
    (n, pose, kf), _ = jax.lax.scan(one_candidate, init,
                                    (cand_idx, cand_ok, keys))
    # soft PnP gate (RelocalizationSettings.min_pnp_hypothesis_inliers).
    # A candidate pose is only a HYPOTHESIS here — both engines (and the
    # reference pipeline, PoseEstimationWorker.cpp:90-97 ->
    # TrackLocalMapWorker) re-track the frame against the full local map
    # before accepting, and that verification applies the full
    # MinMapPoints-strength inlier bar, so a borderline PnP consensus
    # costs nothing when wrong and recovers the genuinely-lost frames a
    # hard gate rejects.
    return RelocResult(
        success=n >= jnp.int32(s.min_pnp_hypothesis_inliers),
        pose=pose, num_inliers=n, candidate_kf=kf)
