"""Per-frame tracking: prior -> project -> match -> optimize, one jit.

Fuses the reference's PoseEstimationWorker + TrackLocalMapWorker hot path
(Tracking/PoseEstimator.cpp:143-217 TryEstimatePoseWithPrior: project last
frames' map points, radius-match, PnP;  Tracking/TrackLocalMap.cpp:43-300
RunTrackLocalMap: candidate visibility gates, two-stage OptimizeCameraPose
with outlier unassociation between, recent-point found/predicted scoring)
into a single compiled program per frame — the "tracking step as one fused
jit with minimal host sync" design (SURVEY.md §7 hard parts).

Inputs are the full MapState plus the frame's features; the local map is
selected inside the jit from the reference keyframe's covisibility.
Output is the refined pose + the per-feature association vector (used
directly as the keyframe association row if this frame is promoted).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration, project
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.mapstore import pose_history as ph
from mageslam_tpu.ops import matching
from mageslam_tpu.solvers import pnp
from mageslam_tpu.tracking.frontend import FrameFeatures


class TrackResult(NamedTuple):
    pose: jnp.ndarray          # (7,) refined view pose
    success: jnp.ndarray       # bool — enough inliers
    assoc: jnp.ndarray         # (F,) int32 map-point id per feature or -1
    num_matched: jnp.ndarray   # features matched to map points
    num_inliers: jnp.ndarray   # surviving optimization
    mean_sq_error: jnp.ndarray
    local_mp_mask: jnp.ndarray  # (L,) map points considered (predicted)
    found_mp_mask: jnp.ndarray  # (L,) map points actually found
    ref_kf: jnp.ndarray        # chosen reference keyframe (max shared)
    anchor_kf: jnp.ndarray     # (N_ANCHORS,) top covisible keyframes
    anchor_ok: jnp.ndarray     # (N_ANCHORS,) anchor has shared points


@functools.partial(jax.jit, static_argnames=("settings", "max_local_kf"))
def track_frame(m: ms.MapState, feats: FrameFeatures,
                prior_pose: jnp.ndarray, last_kf,
                cal: CameraCalibration,
                settings: MageSlamSettings,
                max_local_kf: int = 16) -> TrackResult:
    s = settings
    K, F, L = ms.capacities(m)
    fx = cal.fx
    px = 1.0 / fx

    # ---- local map: keyframes covisible with the reference keyframe
    kf_idx, kf_ok = ms.connected_keyframes(
        m, last_kf, min_shared=1, max_connected=max_local_kf - 1)
    kf_list = jnp.concatenate([jnp.asarray(last_kf, jnp.int32)[None],
                               kf_idx])
    kf_ok = jnp.concatenate([jnp.array([True]), kf_ok])
    local_mp = ms.local_map_points(m, kf_list, kf_ok)     # (L,) bool

    # ---- stage 1: match against map points via projection at the prior
    uv_pred, z_pred = project(cal, se3.pose_apply(prior_pose[None], m.mp_pos))
    in_img = ((uv_pred[:, 0] >= 0) & (uv_pred[:, 0] <= cal.width - 1)
              & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] <= cal.height - 1))
    # viewing-angle gate (MinDegreesBetweenCurrentViewAndMapPointView)
    cam_center = se3.camera_center(prior_pose)
    view_dir = m.mp_pos - cam_center
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)
    cos_view = jnp.sum(view_dir * m.mp_normal, axis=-1)
    has_normal = jnp.linalg.norm(m.mp_normal, axis=-1) > 0.5
    angle_ok = ~has_normal | (cos_view > jnp.cos(jnp.deg2rad(
        s.track_local_map.min_degrees_between_current_view_and_map_point_view)))
    candidates = local_mp & (z_pred > 0) & in_img & angle_ok

    # scale-invariance distance gate (IsGoodCandidate,
    # TrackLocalMap.h:51-65): a point created at octave o and distance d
    # is expected visible in [d_max/scale^(levels-1), d_max] with
    # d_max = d * scale^o.  Compiled in only for multi-level pyramids —
    # the single-level golden path has no scale band to test (and points
    # without scale info, mp_max_dist <= 0, always pass).
    fe = s.mono.camera.features
    num_levels = int(fe.num_levels)
    sf = float(fe.scale_factor)
    if num_levels > 1:
        dist_all = jnp.linalg.norm(m.mp_pos - cam_center, axis=-1)
        dmax = m.mp_max_dist * 1.25
        dmin = m.mp_max_dist / (sf ** (num_levels - 1)) * 0.8
        scale_ok = (m.mp_max_dist <= 0) \
            | ((dist_all >= dmin) & (dist_all <= dmax))
        candidates &= scale_ok

    # ---- candidate COMPACTION: every downstream op (matching matrices,
    # pose Jacobians) runs on C compact rows instead of all L landmark
    # slots.  The visible local map is a few hundred points; C slots
    # (CapacitySettings.track_candidates) lose nothing while cutting the
    # kernel's footprint ~L/C (measured 6.5 -> ~2 ms at L=8192 on v5e).
    # When over capacity, selection is by local-keyframe observation
    # count (slot index is only the deterministic tie-break) — with slot
    # recycling, raw index order is neither recency nor quality, so an
    # index-only rule could drop the best-covisible points in dense maps.
    C = min(s.capacity.track_candidates, L)
    mem = ms.member_matrix(m)
    obs_count = jnp.sum(mem[kf_list] & kf_ok[:, None], axis=0)  # (L,)
    sel_score = jnp.where(
        candidates,
        obs_count.astype(jnp.int32) * (L + 1)
        + (L - jnp.arange(L, dtype=jnp.int32)),
        0)
    svals, cidx = jax.lax.top_k(sel_score, C)
    c_valid = svals > 0                         # (C,)
    # the quality score decides WHICH slots survive the cap; compact rows
    # then go back to ascending slot order so downstream tie-breaks
    # (assign_unique, refine ordering) are identical to the uncapped case
    cidx = jnp.sort(jnp.where(c_valid, cidx, L))
    c_valid = cidx < L
    cidx = jnp.clip(cidx, 0, L - 1)
    pos_c = m.mp_pos[cidx]                      # (C, 3)
    desc_c = m.mp_desc[cidx]
    uv_pred_c = uv_pred[cidx]

    # octave-scaled search radii (multi-level only): predict the pyramid
    # level this point would be detected at from its viewing distance
    # (OpenCVModified.cpp pyramid scaling; ORB-SLAM PredictScale) and
    # widen the pixel search radius by scale^level — a coarse-level
    # keypoint localizes scale^level worse in level-0 pixels
    if num_levels > 1:
        dist_c = jnp.linalg.norm(m.mp_pos[cidx] - cam_center, axis=-1)
        ratio = m.mp_max_dist[cidx] / jnp.maximum(dist_c, 1e-6)
        oct_pred = jnp.clip(
            jnp.round(jnp.log(jnp.maximum(ratio, 1e-6)) / jnp.log(sf)),
            0.0, float(num_levels - 1))
        rad_scale = jnp.where(m.mp_max_dist[cidx] > 0,
                              sf ** oct_pred, 1.0)
    else:
        rad_scale = jnp.float32(1.0)

    def match_round(radius_px, max_ham):
        idx, dist = matching.radius_match(
            uv_pred_c, desc_c, c_valid,
            feats.uv, feats.desc, feats.valid,
            radius=jnp.asarray(radius_px, jnp.float32) * rad_scale,
            max_distance=max_ham,
            min_difference=s.track_local_map.matcher.min_hamming_difference)
        return matching.assign_unique(idx, dist)

    ham = s.track_local_map.matcher.max_hamming_distance
    mp2feat = match_round(s.pose_estimation.search_radius, ham)
    # widen if too few (PoseEstimationSettings wider radii, all three
    # rounds: SearchRadius -> WiderSearchRadius -> ExtraWiderSearchRadius,
    # MageSettings.h:194-196 — the third round is what keeps tracking
    # alive when the prior is stale, e.g. right after relocalization)
    n1 = jnp.sum(mp2feat >= 0)
    mp2feat_wide = match_round(s.pose_estimation.wider_search_radius, ham)
    mp2feat = jnp.where(
        n1 < s.pose_estimation.feature_match_threshold, mp2feat_wide,
        mp2feat)
    # the extra-wide round is a RESCUE, not a routine: at radius 36 the
    # synthetic-world descriptor aliasing admits enough wrong matches to
    # drag the pose, so it fires only when the narrower rounds leave
    # tracking below its survival count (stale prior after recovery)
    n2 = jnp.sum(mp2feat >= 0)
    mp2feat_xwide = match_round(
        s.pose_estimation.extra_wider_search_radius, ham)
    mp2feat = jnp.where(
        n2 < s.track_local_map.min_tracked_feature_count, mp2feat_xwide,
        mp2feat)

    # ---- optimize pose on matches (stage-1 BA:
    # InitialPoseEstimateBundleAdjustmentSteps)
    matched = mp2feat >= 0
    obs_xn = feats.xn_undist[jnp.clip(mp2feat, 0)]
    res1 = pnp.refine_pose(
        prior_pose, pos_c, obs_xn, matched,
        huber_delta=jnp.float32(
            s.track_local_map.initial_pose_ba_huber_width * px),
        outlier_thresh=jnp.float32(
            s.track_local_map.max_outlier_error_pose_estimation * px),
        iters=6)

    # ---- stage 2: re-project at refined pose, associate more, re-optimize
    uv_pred2, z_pred2 = project(cal, se3.pose_apply(res1.pose[None], pos_c))
    in_img2 = ((uv_pred2[:, 0] >= 0) & (uv_pred2[:, 0] <= cal.width - 1)
               & (uv_pred2[:, 1] >= 0) & (uv_pred2[:, 1] <= cal.height - 1))
    candidates2 = c_valid & (z_pred2 > 0) & in_img2
    idx2, dist2 = matching.radius_match(
        uv_pred2, desc_c, candidates2,
        feats.uv, feats.desc, feats.valid,
        radius=jnp.asarray(s.track_local_map.match_search_radius,
                           jnp.float32) * rad_scale,
        max_distance=ham,
        min_difference=s.track_local_map.matcher.min_hamming_difference)
    idx2 = matching.assign_unique(idx2, dist2)
    # keep stage-1 inlier matches, add new ones
    keep1 = matched & res1.inliers
    mp2feat = jnp.where(keep1, mp2feat, jnp.where(idx2 >= 0, idx2, -1))
    matched = mp2feat >= 0
    obs_xn = feats.xn_undist[jnp.clip(mp2feat, 0)]
    res2 = pnp.refine_pose(
        res1.pose, pos_c, obs_xn, matched,
        huber_delta=jnp.float32(s.track_local_map.ba_huber_width * px),
        outlier_thresh=jnp.float32(s.track_local_map.max_outlier_error * px),
        iters=6)

    inlier_c = matched & res2.inliers           # (C,) compact inliers
    # scatter compact results back to global landmark ids
    cidx_safe = jnp.where(c_valid, cidx, L)
    inlier_mp = jnp.zeros(L + 1, bool).at[
        jnp.where(inlier_c, cidx_safe, L)].set(True)[:L]

    # ---- per-feature association vector (invert mp->feat)
    feat_safe = jnp.where(inlier_c, mp2feat, F)
    assoc = jnp.full(F + 1, -1, jnp.int32).at[feat_safe].set(
        jnp.where(inlier_c, cidx, -1))[:F]

    # ---- reference keyframe = most shared points among local kfs
    shared = jnp.sum(mem & inlier_mp[None, :], axis=1)
    shared = jnp.where(m.kf_valid, shared, -1)
    ref_kf = jnp.argmax(shared).astype(jnp.int32)
    # top-N most-covisible keyframes — the pose-history anchor candidates
    # (the reference connects each tracked frame to its most-connected
    # keyframes, PoseHistory.cpp:34-52)
    top_shared, top_kf = jax.lax.top_k(shared, ph.N_ANCHORS)

    n_inl = jnp.sum(inlier_mp)
    return TrackResult(
        pose=res2.pose,
        success=n_inl >= s.track_local_map.min_tracked_feature_count,
        assoc=assoc,
        num_matched=jnp.sum(matched),
        num_inliers=n_inl,
        mean_sq_error=res2.mean_sq_error,
        local_mp_mask=candidates,
        found_mp_mask=inlier_mp,
        ref_kf=ref_kf,
        anchor_kf=top_kf.astype(jnp.int32),
        anchor_ok=top_shared > 0,
    )
