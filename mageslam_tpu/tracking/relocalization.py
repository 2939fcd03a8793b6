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
        # brute-force match: frame features vs candidate keyframe features
        # that are associated to map points (the 2D-3D correspondences)
        kf_has_mp = m.kf_feat_valid[kf] & (m.kf_assoc[kf] >= 0)
        idx, dist = matching.match(
            feats.desc, m.kf_desc[kf], feats.valid, kf_has_mp & ok,
            max_distance=s.matcher.max_hamming_distance,
            min_difference=s.matcher.min_hamming_difference)
        matched = idx >= 0
        mp_ids = m.kf_assoc[kf][jnp.clip(idx, 0)]
        pts = m.mp_pos[jnp.clip(mp_ids, 0, L - 1)]
        good = matched & (mp_ids >= 0)
        n_corr = jnp.sum(good)

        res = pnp.pnp_ransac(
            kk, pts, feats.xn_undist, good,
            inlier_thresh=jnp.float32(s.max_pnp_reprojection_error * px),
            huber_delta=jnp.float32(s.max_pnp_reprojection_error * px * 0.5),
            num_hypotheses=64)
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
    return RelocResult(
        success=n >= jnp.int32(s.min_map_points),
        pose=pose, num_inliers=n, candidate_kf=kf)
