"""Loop closure: detection, Sim(3) correction, map-point merging.

Equivalent of the reference's LoopClosureWorker (Tasks/LoopClosureWorker.cpp):
  DetectLoop (:108-162) — non-covisible similar keyframe clusters (BoW) ->
    per-cluster relocalization -> survival test -> scale from shared-point
    depth ratios (:300-320)
  CloseLoop (:164-210) — move the covisible set by the similarity
    transform (CloseDetectedLoop :332-375), merge duplicate map points
    (Map.UpdateKeyframesFromProxies), then a global BA.

This build additionally offers the Sim3 pose-graph relaxation
(solvers/pose_graph.py) before the global BA — the essential-graph
optimization the reference ships unused (PoseGraphOptimizer.h:18-65).

Correction math follows the standard monocular loop correction: with
g_old = Sim3(T_current_kf, 1) and g_new = Sim3(T_reloc, s) (s = old/new map
scale from depth ratios), corrected points are X' = (g_new^-1 ∘ g_old)(X)
and corrected keyframe views are S' = S ∘ g_old^-1 ∘ g_new, converted back
to SE3 as [R', t'/s'].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import LoopClosureSettings, RelocalizationSettings
from mageslam_tpu.bow import database as bdb
from mageslam_tpu.geometry import se3, sim3
from mageslam_tpu.geometry.camera import CameraCalibration, project
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.ops import matching
from mageslam_tpu.tracking import relocalization
from mageslam_tpu.tracking.frontend import FrameFeatures


class LoopDetection(NamedTuple):
    found: jnp.ndarray         # bool
    loop_kf: jnp.ndarray       # candidate keyframe in the old cluster
    reloc_pose: jnp.ndarray    # (7,) current kf pose in old-map frame
    scale: jnp.ndarray         # old/current map scale
    num_inliers: jnp.ndarray
    cluster_mask: jnp.ndarray  # (K,) the old cluster's keyframes


@functools.partial(jax.jit, static_argnames=("reloc_settings", "settings",
                                             "fx"))
def detect_loop(key: jax.Array, m: ms.MapState, db: bdb.BowDatabase,
                kf_slot, settings: LoopClosureSettings,
                reloc_settings: RelocalizationSettings,
                fx: float) -> LoopDetection:
    """DetectLoop: BoW clusters -> relocalization -> scale estimation."""
    K, F, L = ms.capacities(m)
    desc = m.kf_desc[kf_slot]
    fvalid = m.kf_feat_valid[kf_slot]

    cand_idx, scores, cand_ok, clusters = bdb.query_clusters(
        db, m, kf_slot, desc, fvalid,
        covis_threshold=settings.min_cluster_size,
        max_results=int(settings.query_results))
    # cluster-size gate (MinClusterSize)
    cand_ok &= jnp.sum(clusters, axis=1) >= settings.min_cluster_size
    # temporal gate: candidates must be genuinely old (config
    # LoopClosureSettings.min_frame_gap) — non-covisibility alone admits
    # recent clusters whose physical points were re-triangulated as
    # duplicates, and "closing" against those corrupts the map
    gap = m.kf_frame_id[kf_slot] - m.kf_frame_id[cand_idx]
    cand_ok &= gap > settings.min_frame_gap

    feats = FrameFeatures(
        uv=m.kf_uv[kf_slot], xn_undist=m.kf_xn[kf_slot],
        response=jnp.ones(F), angle=jnp.zeros(F),
        octave=m.kf_octave[kf_slot], desc=desc, valid=fvalid)
    rres = relocalization.relocalize(key, m, feats, cand_idx, cand_ok,
                                     reloc_settings, fx)

    # scale from shared-point depths (LoopClosureWorker.cpp:300-320): for
    # features of this keyframe matched BOTH to a current-map point (own
    # association) and to an old-cluster point (descriptor match against
    # the winning loop keyframe), compare the OLD point's depth under the
    # reloc pose with the CURRENT point's depth under the current pose
    loop_kf = jnp.clip(rres.candidate_kf, 0)
    old_has_mp = m.kf_feat_valid[loop_kf] & (m.kf_assoc[loop_kf] >= 0)
    midx, _ = matching.match(
        desc, m.kf_desc[loop_kf], fvalid, old_has_mp,
        max_distance=reloc_settings.matcher.max_hamming_distance,
        min_difference=reloc_settings.matcher.min_hamming_difference)
    old_mp = m.kf_assoc[loop_kf][jnp.clip(midx, 0)]
    own_assoc = m.kf_assoc[kf_slot]
    shared = fvalid & (midx >= 0) & (old_mp >= 0) & (own_assoc >= 0)
    old_pts = m.mp_pos[jnp.clip(old_mp, 0, L - 1)]
    cur_pts = m.mp_pos[jnp.clip(own_assoc, 0, L - 1)]
    y_old = se3.pose_apply(rres.pose[None], old_pts)
    z_old = y_old[:, 2]
    z_cur = se3.pose_apply(m.kf_pose[kf_slot][None], cur_pts)[:, 2]
    # GEOMETRIC verification of the descriptor matches (r5): a Hamming-50
    # match across the seam's appearance change is frequently wrong, and
    # junk pairs poison the depth-ratio median (measured: injected-drift
    # scale estimated 1.36 where truth was 0.8).  Keep only matches whose
    # OLD point, projected through the reloc pose, lands on its matched
    # feature (<= 4 px) — the same reprojection consistency the reloc
    # PnP inliers satisfy.
    xn_pred = y_old[:, :2] / jnp.maximum(z_old, 1e-6)[:, None]
    reproj = jnp.linalg.norm(xn_pred - m.kf_xn[kf_slot], axis=-1)
    wsum = shared & (z_cur > 0.1) & (z_old > 0.1) \
        & (reproj < 4.0 / fx)
    # MEDIAN of per-point depth ratios (robust; the r1-r3 sum-ratio let a
    # single mismatched far point bias the whole map's scale correction);
    # an estimate with fewer than 5 verified pairs has no support — fall
    # back to 1.0 (rigid correction) rather than apply a junk rescale
    ratios = jnp.where(wsum, z_old / jnp.maximum(z_cur, 1e-6), jnp.nan)
    scale = jnp.clip(jnp.nan_to_num(jnp.nanmedian(ratios), nan=1.0),
                     0.1, 10.0)
    scale = jnp.where(jnp.sum(wsum) >= 5, scale, 1.0)

    # which cluster won
    ci = jnp.argmax(jnp.where(cand_idx == rres.candidate_kf,
                              jnp.arange(cand_idx.shape[0]) + 1, 0))
    cluster = clusters[ci]

    found = rres.success & (rres.num_inliers
                            >= jnp.int32(settings.min_feature_matches))
    # near-identity skip: when the reloc pose agrees with the current
    # (drifted) pose to within a fraction of the keyframe spacing and the
    # scale ratio is ~1, the loop is ALREADY closed (tracking or cheap
    # loop closure stitched it) and a "correction" would only inject the
    # reloc pose's noise into a consistent map (measured: repeated
    # near-identity closures on the stitched real-texture ring tripled
    # ATE).  The reference reaches the same end through its non-covisible
    # precondition — once stitched, clusters go covisible and DetectLoop
    # stops seeing them (LoopClosureWorker.cpp:108-162).
    dt = jnp.linalg.norm(se3.camera_center(rres.pose)
                         - se3.camera_center(m.kf_pose[kf_slot]))
    spacing = jnp.nan_to_num(ms.map_scale(m), nan=1.0)
    meaningful = (dt > settings.min_correction_baseline_ratio
                  * jnp.maximum(spacing, 1e-6)) \
        | (jnp.abs(jnp.log(scale))
           > settings.min_correction_log_scale)
    found &= meaningful
    return LoopDetection(found, rres.candidate_kf, rres.pose, scale,
                         rres.num_inliers, cluster)


@jax.jit
def apply_similarity_correction(m: ms.MapState, kf_slot,
                                det: LoopDetection) -> ms.MapState:
    """CloseDetectedLoop: move the current covisible set (keyframes +
    their points) by the loop similarity."""
    K, F, L = ms.capacities(m)
    # Derivation: with T_c the current (drifted) view, T_r the reloc view
    # (old-map frame), and s = z_old/z_cur, the same physical point seen at
    # camera coords y by T_c sits at s*y in old-map camera units, so
    #   X_old = T_r^-1( s * T_c(X_drifted) )  =>  M = T_r^-1 ∘ S_s ∘ T_c.
    # Keyframe views correct as S_i' = S_i ∘ M^-1 (Sim3), converted to SE3
    # by [R', t'/s'] which lands their depths in old-map units.
    T_c = m.kf_pose[kf_slot]
    g_c_scaled = sim3.make_sim3(se3.pose_q(T_c),
                                det.scale * se3.pose_t(T_c), det.scale)
    point_map = sim3.sim3_compose(
        sim3.sim3_from_se3(se3.pose_inverse(det.reloc_pose)), g_c_scaled)
    kf_right = sim3.sim3_inverse(point_map)

    # covisible set of the current keyframe (the drifted side)
    cov = ms.covisibility(m)
    covisible = ((cov[kf_slot] > 0) | (jnp.arange(K) == kf_slot)) \
        & m.kf_valid
    # points owned by the covisible set
    mem = ms.member_matrix(m)
    pts_move = jnp.any(mem & covisible[:, None], axis=0) & m.mp_valid

    new_pts = sim3.sim3_apply(point_map, m.mp_pos)
    mp_pos = jnp.where(pts_move[:, None], new_pts, m.mp_pos)

    def correct_pose(pose):
        s = sim3.sim3_compose(sim3.sim3_from_se3(pose, 1.0), kf_right)
        t = sim3.sim3_t(s) / sim3.sim3_s(s)
        return se3.make_pose(sim3.sim3_q(s), t)

    new_poses = jax.vmap(correct_pose)(m.kf_pose)
    kf_pose = jnp.where(covisible[:, None], new_poses, m.kf_pose)
    return m._replace(kf_pose=kf_pose, mp_pos=mp_pos)


@functools.partial(jax.jit, static_argnames=("num_steps", "min_covis"))
def pose_graph_loop_correction(m: ms.MapState, kf_slot, det: LoopDetection,
                               num_steps: int = 15,
                               min_covis: int = 30) -> ms.MapState:
    """Essential-graph Sim3 relaxation after the rigid similarity move.

    The reference corrects only the covisible set and then global-BAs
    (LoopClosureWorker.cpp:164-210); its PoseGraphOptimizer ships unused.
    Here the correction is *propagated* through the whole trajectory: fix
    the old-loop cluster and the moved covisible set, keep essential-graph
    edge measurements at their pre-correction relative poses (the odometry
    constraints), and relax every other keyframe in Sim(3)
    (spanning-tree + strong-covisibility edges, mapstore/spanning_tree.py).
    Map points follow their anchor keyframe's correction
    (X' = S_new^-1 ∘ S_old applied in world frame).
    """
    from mageslam_tpu.mapstore import spanning_tree as stree
    from mageslam_tpu.solvers import pose_graph as pg

    K, F, L = ms.capacities(m)
    states0 = jax.vmap(lambda p: sim3.sim3_from_se3(p, 1.0))(m.kf_pose)

    eg = stree.essential_graph_edges(m, min_covis=min_covis,
                                     max_covis_edges=4 * K)
    rel = jax.vmap(lambda i, j: sim3.sim3_compose(
        states0[i], sim3.sim3_inverse(states0[j])))(eg.edge_i, eg.edge_j)

    m_corr = apply_similarity_correction(m, kf_slot, det)
    states_init = jax.vmap(lambda p: sim3.sim3_from_se3(p, 1.0))(
        m_corr.kf_pose)

    cov = ms.covisibility(m)
    covisible = ((cov[kf_slot] > 0) | (jnp.arange(K) == kf_slot)) \
        & m.kf_valid
    fixed = covisible | (det.cluster_mask & m.kf_valid) | ~m.kf_valid

    problem = pg.PoseGraphProblem(
        states=states_init, fixed=fixed,
        edge_i=eg.edge_i, edge_j=eg.edge_j, edge_rel=rel,
        edge_weight=jnp.where(det.found, eg.edge_weight, 0.0))
    res = pg.optimize_pose_graph(problem, num_steps=num_steps)

    def to_se3(s):
        return se3.make_pose(sim3.sim3_q(s), sim3.sim3_t(s) / sim3.sim3_s(s))

    new_poses = jax.vmap(to_se3)(res.states)
    kf_pose = jnp.where(m.kf_valid[:, None], new_poses, m_corr.kf_pose)

    # move each point by its anchor keyframe's correction delta (world
    # frame): X' = (S_new^-1 ∘ S_old)(X); fixed anchors give the identity.
    # A point whose anchor keyframe was CULLED (slot dead or recycled)
    # must NOT be moved — its clipped slot index would select an
    # arbitrary keyframe's delta and scatter the point (this corrupted
    # whole maps on long runs before the kf_valid guard).
    anchor = jnp.clip(m.mp_anchor_kf, 0, K - 1)
    deltas = jax.vmap(lambda new, old: sim3.sim3_compose(
        sim3.sim3_inverse(new), old))(res.states, states_init)
    moved = jax.vmap(sim3.sim3_apply)(deltas[anchor],
                                      m_corr.mp_pos[:, None, :])[:, 0, :]
    move_ok = (m.mp_valid & ~fixed[anchor] & m.kf_valid[anchor]
               & (m.mp_anchor_kf >= 0))[:, None]
    mp_pos = jnp.where(move_ok, moved, m_corr.mp_pos)
    corrected = m_corr._replace(kf_pose=kf_pose, mp_pos=mp_pos)
    # no detected loop -> the whole correction is a no-op
    return jax.tree.map(lambda a, b: jnp.where(det.found, a, b),
                        corrected, m)


@functools.partial(jax.jit, static_argnames=("settings",))
def merge_loop_points(m: ms.MapState, kf_slot, det: LoopDetection,
                      cal: CameraCalibration,
                      settings: LoopClosureSettings) -> ms.MapState:
    """Merge duplicated landmarks: project old-cluster points into the
    corrected current keyframe, radius-match its associated features, and
    merge the current (new) points into the old ones
    (Map-point merge under StartLoopClosureState)."""
    K, F, L = ms.capacities(m)
    s = settings
    pose = m.kf_pose[kf_slot]

    old_pts = ms.local_map_points(
        m, jnp.arange(K, dtype=jnp.int32), det.cluster_mask)
    uv_pred, z = project(cal, se3.pose_apply(pose[None], m.mp_pos))
    cand = old_pts & (z > 0)

    # match old points against the current keyframe's features
    idx, dist = matching.radius_match(
        uv_pred, m.mp_desc, cand,
        m.kf_uv[kf_slot], m.kf_desc[kf_slot], m.kf_feat_valid[kf_slot],
        radius=jnp.asarray(s.match_search_radius, jnp.float32),
        max_distance=s.map_merge_matching.max_hamming_distance,
        min_difference=s.map_merge_matching.min_hamming_difference)
    idx = matching.assign_unique(idx, dist)
    # where the matched feature already has a (new-map) association,
    # merge that new point into the old point
    feat_assoc = m.kf_assoc[kf_slot][jnp.clip(idx, 0)]
    mergeable = (idx >= 0) & (feat_assoc >= 0) & det.found
    src = jnp.where(mergeable, feat_assoc, 0)      # new points
    dst = jnp.arange(L, dtype=jnp.int32)           # old points
    # avoid self-merge
    mergeable &= src != dst
    return ms.merge_map_points(m, src, dst, mergeable)
