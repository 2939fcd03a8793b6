"""Cheap loop closure: re-associate distant map points into a new keyframe.

Equivalent of the reference's CheapLoopClosure (Tasks/MappingWorker.cpp:
30-75, run at :160-165 as the first mapping stage per keyframe): sample map
points OUTSIDE the new keyframe's covisible neighborhood, project them into
the keyframe, descriptor-match against its *unassociated* keypoints, and
install the matches as associations. This stitches small trajectory loops
closed through the local BA without invoking full BoW loop detection.

TPU shape: no sampling loop — ALL distant points are projected and matched
in one batched radius match (L is fixed capacity); "sampling" is the
validity mask. The whole routine is one jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.config import LoopClosureSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration, project
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.ops import matching


class CheapLoopResult(NamedTuple):
    map: ms.MapState
    num_connected: jnp.ndarray   # new associations installed
    applied: jnp.ndarray         # bool: threshold met


@functools.partial(jax.jit, static_argnames=("settings", "min_matches"))
def cheap_loop_closure(m: ms.MapState, kf_slot,
                       cal: CameraCalibration,
                       settings: LoopClosureSettings,
                       min_matches: int = 10) -> CheapLoopResult:
    """Connect kf_slot to distant map structure (MappingWorker.cpp:30-75).

    min_matches: associations are only installed when at least this many
    distant points matched (a handful of hits is noise, not a revisit).
    """
    K, F, L = ms.capacities(m)
    s = settings
    pose = m.kf_pose[kf_slot]

    # distant = valid points NOT observed by the covisible neighborhood
    cov = ms.covisibility(m)
    covisible = ((cov[kf_slot] > 0) | (jnp.arange(K) == kf_slot)) \
        & m.kf_valid
    local_pts = jnp.any(ms.member_matrix(m) & covisible[:, None], axis=0)
    distant = m.mp_valid & ~local_pts

    # project into the keyframe; keep points in front and inside the image
    uv_pred, z = project(cal, se3.pose_apply(pose[None], m.mp_pos))
    in_img = ((uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cal.width)
              & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cal.height))
    cand = distant & (z > 0) & in_img

    # match against UNASSOCIATED keypoints only
    unassoc = m.kf_feat_valid[kf_slot] & (m.kf_assoc[kf_slot] < 0)
    idx, dist = matching.radius_match(
        uv_pred, m.mp_desc, cand,
        m.kf_uv[kf_slot], m.kf_desc[kf_slot], unassoc,
        radius=jnp.asarray(s.match_search_radius, jnp.float32),
        max_distance=s.cheap_loop_closure_matching.max_hamming_distance,
        min_difference=s.cheap_loop_closure_matching.min_hamming_difference)
    idx = matching.assign_unique(idx, dist)

    matched = idx >= 0
    n = jnp.sum(matched).astype(jnp.int32)
    applied = n >= jnp.int32(min_matches)

    feat_idx = jnp.clip(idx, 0)
    mp_ids = jnp.arange(L, dtype=jnp.int32)
    m2 = ms.set_associations(m, kf_slot, feat_idx, mp_ids,
                             matched & applied)
    return CheapLoopResult(m2, jnp.where(applied, n, 0), applied)
