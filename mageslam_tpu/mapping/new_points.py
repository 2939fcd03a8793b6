"""New map-point creation: triangulate fresh landmarks around a keyframe.

Equivalent of the reference's NewMapPointsCreation
(Mapping/NewMapPointsCreation.h:17-105, .cpp:426+: for new keyframe Ki and
its covisible keyframes Kc — match *unassociated* descriptors, gate by
epipolar distance + parallax + distance ratio, triangulate, then widen the
new points' associations across the covisible set).

TPU shape: a fixed set of NC candidate keyframes; each (Ki, Kc) pair
produces up to F candidate points in one batched match+triangulate; all
candidates are gated and allocated in one allocate_map_points call, and one
batched projection pass widens associations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import NewMapPointsCreationSettings
from mageslam_tpu.geometry import se3, triangulation
from mageslam_tpu.geometry.camera import CameraCalibration, project
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.ops import matching


class NewPointsResult(NamedTuple):
    map: ms.MapState
    num_created: jnp.ndarray
    num_widened: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("settings", "num_candidates",
                                             "fx", "scale_factor"))
def create_new_map_points(m: ms.MapState, new_kf,
                          cal: CameraCalibration,
                          settings: NewMapPointsCreationSettings,
                          fx: float,
                          num_candidates: int = 5,
                          scale_factor: float = 1.5) -> NewPointsResult:
    s = settings
    K, F, L = ms.capacities(m)
    px = 1.0 / fx

    kf_idx, kf_ok = ms.connected_keyframes(m, new_kf, min_shared=1,
                                           max_connected=num_candidates)
    pose_i = m.kf_pose[new_kf]
    unassoc_i = m.kf_feat_valid[new_kf] & (m.kf_assoc[new_kf] < 0)

    def pair_candidates(kc, ok):
        """Candidates from matching Ki's unassociated vs Kc's unassociated."""
        pose_c = m.kf_pose[kc]
        unassoc_c = m.kf_feat_valid[kc] & (m.kf_assoc[kc] < 0) & ok
        idx, _ = matching.match(
            m.kf_desc[new_kf], m.kf_desc[kc],
            unassoc_i & ok, unassoc_c,
            max_distance=s.initial_matcher.max_hamming_distance,
            min_difference=s.initial_matcher.min_hamming_difference)
        matched = idx >= 0
        xn_i = m.kf_xn[new_kf]
        xn_c = m.kf_xn[kc][jnp.clip(idx, 0)]
        r_i = jnp.concatenate([xn_i, jnp.ones((F, 1))], -1)
        r_c = jnp.concatenate([xn_c, jnp.ones((F, 1))], -1)
        X, tri_ok = triangulation.triangulate_midpoint(pose_i, pose_c,
                                                      r_i, r_c)
        y_i = se3.pose_apply(pose_i, X)
        y_c = se3.pose_apply(pose_c, X)
        z_i, z_c = y_i[:, 2], y_c[:, 2]
        # reprojection gates both views (MaxEpipolarError)
        pr_i = y_i[:, :2] / jnp.where(jnp.abs(z_i) < 1e-9, 1e-9, z_i)[:, None]
        pr_c = y_c[:, :2] / jnp.where(jnp.abs(z_c) < 1e-9, 1e-9, z_c)[:, None]
        thr = (s.max_epipolar_error * px) ** 2
        reproj_ok = (jnp.sum((pr_i - xn_i) ** 2, -1) < thr) \
            & (jnp.sum((pr_c - xn_c) ** 2, -1) < thr)
        # parallax gate (MinParallaxDegrees)
        cospar = triangulation.parallax_cos(pose_i, pose_c, X)
        par_ok = cospar < jnp.cos(jnp.deg2rad(s.min_parallax_degrees))
        # distance-ratio gate (MinAcceptedDistanceRatio = 2.0): point
        # distance must exceed ratio x keyframe baseline — rejects points
        # triangulated implausibly close relative to the motion
        baseline = jnp.linalg.norm(se3.camera_center(pose_i)
                                   - se3.camera_center(pose_c)) + 1e-9
        d_i = jnp.linalg.norm(X - se3.camera_center(pose_i), axis=-1)
        ratio_ok = (d_i / baseline) > s.min_accepted_distance_ratio
        # scale-consistency gate (NewMapPointsCreation.h:17-105 /
        # MageSettings.h:153-155): the two observations of one 3D point
        # must come from neighboring pyramid levels — a level-0 / level-2
        # "match" across a 2.25x scale gap is a descriptor alias.
        # Vacuous at 1 level (all octaves 0).
        oct_i = m.kf_octave[new_kf]
        oct_c = m.kf_octave[kc][jnp.clip(idx, 0)]
        scale_ok = jnp.abs(oct_i - oct_c) <= 1
        ok_all = (matched & ok & tri_ok & (z_i > 0) & (z_c > 0)
                  & reproj_ok & par_ok & ratio_ok & scale_ok)
        return X, ok_all, idx, kc

    Xs, oks, idxs, kcs = jax.vmap(pair_candidates)(kf_idx, kf_ok)
    # resolve duplicates: a feature of Ki may triangulate in several pairs —
    # keep the first pair's candidate (pairs ordered by covisibility)
    prev_any = jnp.cumsum(oks.astype(jnp.int32), axis=0) - oks.astype(
        jnp.int32)
    first = oks & (prev_any == 0)

    # flatten candidates
    NC = kf_idx.shape[0]
    Xf = Xs.reshape(NC * F, 3)
    okf = first.reshape(NC * F)
    feat_i = jnp.tile(jnp.arange(F, dtype=jnp.int32), NC)
    feat_c = idxs.reshape(NC * F)
    kc_f = jnp.repeat(kf_idx, F)

    # descriptors + normals from the creating keyframe
    desc = m.kf_desc[new_kf][feat_i]
    ctr_i = se3.camera_center(pose_i)
    normal = Xf - ctr_i
    dist_i = jnp.linalg.norm(normal, axis=-1)
    normal = normal / jnp.maximum(dist_i, 1e-9)[:, None]
    # scale-invariance info for the distance gates (mp_max_dist =
    # d_create * scale^octave, ORB-SLAM mfMaxDistance convention)
    oct_new = m.kf_octave[new_kf][feat_i]
    max_dist = dist_i * scale_factor ** oct_new.astype(jnp.float32)

    m2, mp_ids = ms.allocate_map_points(m, Xf, desc, normal, new_kf, okf,
                                        octave=oct_new, max_dist=max_dist)
    created = mp_ids >= 0

    # associations in Ki and the pair keyframe
    m2 = ms.set_associations(m2, new_kf, feat_i, mp_ids, created)

    def assoc_pair(mm, kc):
        sel = created & (kc_f == kc)
        return ms.set_associations(mm, kc, feat_c, mp_ids, sel), None

    m2, _ = jax.lax.scan(lambda mm, kc: assoc_pair(mm, kc), m2, kf_idx)

    # --- widening: project new points into the other covisible keyframes
    # and associate unmatched features (LocallyAssociateNewAssociations)
    def widen(mm, kc):
        pose_c = mm.kf_pose[kc]
        uv_pred, z = project(cal, se3.pose_apply(pose_c[None], mm.mp_pos))
        is_new = jnp.zeros(L + 1, bool).at[
            jnp.where(created, mp_ids, L)].set(True)[:L]
        cand = is_new & (z > 0)
        unassoc_c = mm.kf_feat_valid[kc] & (mm.kf_assoc[kc] < 0)
        idx2, dist2 = matching.radius_match(
            uv_pred, mm.mp_desc, cand,
            mm.kf_uv[kc], mm.kf_desc[kc], unassoc_c,
            radius=jnp.asarray(s.new_map_points_search_radius, jnp.float32),
            max_distance=s.associate_matcher.max_hamming_distance,
            min_difference=s.associate_matcher.min_hamming_difference)
        idx2 = matching.assign_unique(idx2, dist2)
        sel = idx2 >= 0
        n = jnp.sum(sel)
        mm = ms.set_associations(
            mm, kc, jnp.clip(idx2, 0),
            jnp.arange(L, dtype=jnp.int32), sel)
        return mm, n

    m2, widened = jax.lax.scan(widen, m2, kf_idx)
    return NewPointsResult(m2, jnp.sum(created), jnp.sum(widened))
