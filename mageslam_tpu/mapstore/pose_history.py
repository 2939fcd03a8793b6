"""Full-trajectory pose history with keyframe-relative re-anchoring.

Equivalent of the reference's PoseHistory / ThreadSafePoseHistory
(Map/PoseHistory.*: every tracked frame stores offsets to nearby keyframes,
PoseHistory.cpp:34-52; after BA/loop adjustments non-keyframe poses are
re-interpolated from the updated keyframes, PoseHistory.h:72-83; keyframe
removal re-anchors connections, PoseHistory.cpp:95-110).

TPU design: each history entry stores its anchor keyframe id and the
*relative* pose T_frame * T_anchor^-1 at record time.  Re-anchoring after
optimization is then a single batched compose against the current keyframe
poses — O(history) fused arithmetic, no per-entry graph walking.  Capacity
is fixed (PoseHistorySettings.PoseHistoryInitialSize = 10000 ~ 5.5 min).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3


class PoseHistory(NamedTuple):
    frame_id: jnp.ndarray    # (H,) int32
    timestamp: jnp.ndarray   # (H,) float32
    anchor_kf: jnp.ndarray   # (H,) int32 keyframe slot id
    rel_pose: jnp.ndarray    # (H, 7) T_frame * T_anchor^-1
    valid: jnp.ndarray       # (H,) bool
    cursor: jnp.ndarray      # int32 ring-buffer write position


def empty_history(capacity: int) -> PoseHistory:
    return PoseHistory(
        frame_id=jnp.full(capacity, -1, jnp.int32),
        timestamp=jnp.zeros(capacity, jnp.float32),
        anchor_kf=jnp.full(capacity, -1, jnp.int32),
        rel_pose=jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
                          (capacity, 1)),
        valid=jnp.zeros(capacity, bool),
        cursor=jnp.int32(0),
    )


@jax.jit
def add_pose(h: PoseHistory, frame_id, timestamp, pose: jnp.ndarray,
             anchor_kf, anchor_pose: jnp.ndarray) -> PoseHistory:
    """Record a tracked frame's pose relative to its anchor keyframe
    (History.AddHistoricalPose, TrackLocalMapWorker.cpp:204)."""
    rel = se3.pose_compose(pose, se3.pose_inverse(anchor_pose))
    i = h.cursor
    cap = h.valid.shape[0]
    return h._replace(
        frame_id=h.frame_id.at[i].set(jnp.asarray(frame_id, jnp.int32)),
        timestamp=h.timestamp.at[i].set(jnp.asarray(timestamp, jnp.float32)),
        anchor_kf=h.anchor_kf.at[i].set(jnp.asarray(anchor_kf, jnp.int32)),
        rel_pose=h.rel_pose.at[i].set(rel),
        valid=h.valid.at[i].set(True),
        cursor=(i + 1) % cap,
    )


@jax.jit
def world_poses(h: PoseHistory, kf_pose: jnp.ndarray,
                kf_valid: jnp.ndarray):
    """Current world poses of all history entries given the (possibly
    BA-adjusted) keyframe poses — the re-interpolation step
    (PoseHistory::AdjustPoses).  Returns (poses (H, 7), valid (H,))."""
    K = kf_valid.shape[0]
    safe = jnp.clip(h.anchor_kf, 0, K - 1)
    anchor = kf_pose[safe]
    ok = h.valid & (h.anchor_kf >= 0) & kf_valid[safe]
    return jax.vmap(se3.pose_compose)(h.rel_pose, anchor), ok


@jax.jit
def anchor_frame_to_kf(h: PoseHistory, frame_id, kf_slot) -> PoseHistory:
    """Re-anchor the history entry of a frame PROMOTED to a keyframe onto
    its own keyframe slot (identity offset).  Without this the promoted
    frame's trajectory pose forever rides a stale pre-BA offset to the
    previous reference keyframe — every later BA refinement of the
    keyframe itself is invisible to the exported trajectory (the
    reference keeps keyframe-backed poses exact the same way,
    PoseHistory.cpp:34-52: offsets are relative to the OWN keyframe when
    one exists)."""
    hit = h.valid & (h.frame_id == jnp.asarray(frame_id, jnp.int32))
    ident = jnp.broadcast_to(se3.pose_identity(), h.rel_pose.shape)
    return h._replace(
        anchor_kf=jnp.where(hit, jnp.asarray(kf_slot, jnp.int32),
                            h.anchor_kf),
        rel_pose=jnp.where(hit[:, None], ident, h.rel_pose))


@jax.jit
def reanchor(h: PoseHistory, kf_pose: jnp.ndarray, kf_valid: jnp.ndarray,
             dead_kf_mask: jnp.ndarray, new_anchor: jnp.ndarray
             ) -> PoseHistory:
    """Re-anchor entries whose keyframe is being culled onto a surviving
    keyframe (PoseHistory.cpp:95-110): world pose is preserved by composing
    through the old anchor before switching."""
    K = kf_valid.shape[0]
    safe = jnp.clip(h.anchor_kf, 0, K - 1)
    needs = h.valid & dead_kf_mask[safe]
    world = jax.vmap(se3.pose_compose)(h.rel_pose, kf_pose[safe])
    na = jnp.clip(new_anchor, 0, K - 1)
    new_rel = jax.vmap(se3.pose_compose)(
        world, jax.vmap(se3.pose_inverse)(kf_pose[na]))
    return h._replace(
        anchor_kf=jnp.where(needs, na, h.anchor_kf),
        rel_pose=jnp.where(needs[:, None], new_rel, h.rel_pose),
    )


@jax.jit
def nearest_valid_kf(kf_valid: jnp.ndarray, dead_mask: jnp.ndarray,
                     query_kf: jnp.ndarray,
                     kf_frame_id: jnp.ndarray = None) -> jnp.ndarray:
    """For each query keyframe id, the id of the nearest surviving
    keyframe — used to pick re-anchor targets.

    Nearest by FRAME ID (temporal adjacency) when kf_frame_id is given:
    slot indices are recycled arbitrarily, so slot distance can re-anchor
    a frame onto a keyframe from a different part of the trajectory
    (measured |rel| ~ 3 units).  That preserves the pose AT reanchor
    time, but any later SECTORED correction — a loop closure moving only
    the covisible set — shears the frame about its far-away anchor
    (measured: injected-drift ring, map kf-ATE 0.18 while the fossil
    trajectory read 1.69 from exactly these entries)."""
    K = kf_valid.shape[0]
    alive = kf_valid & ~dead_mask
    if kf_frame_id is None:
        key = jnp.arange(K)
    else:
        key = kf_frame_id
    dist = jnp.abs(key[None, :] - key[query_kf][:, None])
    dist = jnp.where(alive[None, :], dist, jnp.int32(2**30))
    return jnp.argmin(dist, axis=1).astype(jnp.int32)
