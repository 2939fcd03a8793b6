"""Full-trajectory pose history with keyframe-relative re-anchoring.

Equivalent of the reference's PoseHistory / ThreadSafePoseHistory
(Map/PoseHistory.*: every tracked frame stores offsets to NEARBY keyframes,
PoseHistory.cpp:34-52; after BA/loop adjustments non-keyframe poses are
re-interpolated from the updated keyframes, PoseHistory.h:72-83; keyframe
removal re-anchors connections, PoseHistory.cpp:95-110).

TPU design: each history entry stores TWO anchor keyframes with the
*relative* pose T_frame * T_anchor^-1 at record time, plus the record-time
distance between the anchors.  Reconstruction is one batched compose
against the current keyframe poses — O(history) fused arithmetic:

  - the second anchor makes reconstruction SCALE-AWARE: a Sim(3) loop
    correction rescales local distances, and the ratio of the anchors'
    current separation to their record-time separation measures exactly
    that local scale change, so the frame's offset is rescaled with its
    sector (r4; without this a 1.25x scale correction sheared anchored
    frames by |rel| * delta_scale).
  - blending the two anchor predictions (nlerp rotation, mean center)
    averages out independent per-keyframe BA jitter — the re-interpolation
    of the reference's multi-keyframe offsets.

Capacity is fixed (PoseHistorySettings.PoseHistoryInitialSize = 10000
~ 5.5 min).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3


class PoseHistory(NamedTuple):
    frame_id: jnp.ndarray    # (H,) int32
    timestamp: jnp.ndarray   # (H,) float32
    anchor_kf: jnp.ndarray   # (H,) int32 primary anchor keyframe slot
    rel_pose: jnp.ndarray    # (H, 7) T_frame * T_anchor^-1
    anchor_kf2: jnp.ndarray  # (H,) int32 secondary anchor (-1 / == primary
    #                          -> single-anchor entry)
    rel_pose2: jnp.ndarray   # (H, 7) T_frame * T_anchor2^-1
    anchor_dist: jnp.ndarray  # (H,) f32 |c(anchor) - c(anchor2)| at record
    valid: jnp.ndarray       # (H,) bool
    cursor: jnp.ndarray      # int32 ring-buffer write position


def empty_history(capacity: int) -> PoseHistory:
    def ident():
        # distinct buffers: the engine donates its state, and two pytree
        # leaves sharing one buffer trip XLA's double-donation check
        return jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
                        (capacity, 1))

    return PoseHistory(
        frame_id=jnp.full(capacity, -1, jnp.int32),
        timestamp=jnp.zeros(capacity, jnp.float32),
        anchor_kf=jnp.full(capacity, -1, jnp.int32),
        rel_pose=ident(),
        anchor_kf2=jnp.full(capacity, -1, jnp.int32),
        rel_pose2=ident(),
        anchor_dist=jnp.zeros(capacity, jnp.float32),
        valid=jnp.zeros(capacity, bool),
        cursor=jnp.int32(0),
    )


@jax.jit
def add_pose(h: PoseHistory, frame_id, timestamp, pose: jnp.ndarray,
             anchor_kf, anchor_pose: jnp.ndarray,
             anchor_kf2=None, anchor_pose2: jnp.ndarray = None
             ) -> PoseHistory:
    """Record a tracked frame's pose relative to its anchor keyframe(s)
    (History.AddHistoricalPose, TrackLocalMapWorker.cpp:204).  The
    optional second anchor enables scale-aware two-anchor
    reconstruction; omitted -> single-anchor entry."""
    if anchor_kf2 is None:
        anchor_kf2 = anchor_kf
        anchor_pose2 = anchor_pose
    rel = se3.pose_compose(pose, se3.pose_inverse(anchor_pose))
    rel2 = se3.pose_compose(pose, se3.pose_inverse(anchor_pose2))
    dist = jnp.linalg.norm(se3.camera_center(anchor_pose)
                           - se3.camera_center(anchor_pose2))
    i = h.cursor
    cap = h.valid.shape[0]
    return h._replace(
        frame_id=h.frame_id.at[i].set(jnp.asarray(frame_id, jnp.int32)),
        timestamp=h.timestamp.at[i].set(jnp.asarray(timestamp, jnp.float32)),
        anchor_kf=h.anchor_kf.at[i].set(jnp.asarray(anchor_kf, jnp.int32)),
        rel_pose=h.rel_pose.at[i].set(rel),
        anchor_kf2=h.anchor_kf2.at[i].set(
            jnp.asarray(anchor_kf2, jnp.int32)),
        rel_pose2=h.rel_pose2.at[i].set(rel2),
        anchor_dist=h.anchor_dist.at[i].set(dist),
        valid=h.valid.at[i].set(True),
        cursor=(i + 1) % cap,
    )


def _anchor_world(rel, anchor_pose, s_local):
    """World pose of the frame from one anchor, with the frame's offset
    from the anchor's center rescaled by the local scale change."""
    w = jax.vmap(se3.pose_compose)(rel, anchor_pose)
    c_a = jax.vmap(se3.camera_center)(anchor_pose)
    c_w = jax.vmap(se3.camera_center)(w)
    c_new = c_a + s_local[:, None] * (c_w - c_a)
    q = w[:, :4]
    R = se3.quat_to_mat(q)
    t_new = -jnp.einsum("hij,hj->hi", R, c_new)
    return jnp.concatenate([q, t_new], -1)


@jax.jit
def world_poses(h: PoseHistory, kf_pose: jnp.ndarray,
                kf_valid: jnp.ndarray):
    """Current world poses of all history entries given the (possibly
    BA-adjusted) keyframe poses — the re-interpolation step
    (PoseHistory::AdjustPoses).  Returns (poses (H, 7), valid (H,))."""
    K = kf_valid.shape[0]
    safe1 = jnp.clip(h.anchor_kf, 0, K - 1)
    safe2 = jnp.clip(h.anchor_kf2, 0, K - 1)
    a1 = kf_pose[safe1]
    a2 = kf_pose[safe2]
    ok1 = h.valid & (h.anchor_kf >= 0) & kf_valid[safe1]
    ok2 = h.valid & (h.anchor_kf2 >= 0) & kf_valid[safe2] \
        & (h.anchor_kf2 != h.anchor_kf) & (h.anchor_dist > 1e-6)

    # local scale change: ratio of anchors' current separation to the
    # record-time separation (clipped — a wild ratio means the anchors
    # ended up in different corrected sectors, where rescaling by it
    # would do more harm than good)
    c1 = jax.vmap(se3.camera_center)(a1)
    c2 = jax.vmap(se3.camera_center)(a2)
    s_local = jnp.where(
        ok2, jnp.linalg.norm(c1 - c2, axis=-1)
        / jnp.maximum(h.anchor_dist, 1e-6), 1.0)
    s_local = jnp.clip(s_local, 0.5, 2.0)

    w1 = _anchor_world(h.rel_pose, a1, s_local)
    w2 = _anchor_world(h.rel_pose2, a2, s_local)

    # blend: nlerp rotation (sign-aligned), mean center
    q1, q2 = w1[:, :4], w2[:, :4]
    q2 = q2 * jnp.sign(jnp.sum(q1 * q2, -1, keepdims=True) + 1e-20)
    qb = se3.quat_normalize(0.5 * (q1 + q2))
    cb = 0.5 * (jax.vmap(se3.camera_center)(w1)
                + jax.vmap(se3.camera_center)(w2))
    Rb = se3.quat_to_mat(qb)
    tb = -jnp.einsum("hij,hj->hi", Rb, cb)
    blended = jnp.concatenate([qb, tb], -1)

    poses = jnp.where(ok2[:, None], blended, w1)
    return poses, ok1


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
    slot = jnp.asarray(kf_slot, jnp.int32)
    return h._replace(
        anchor_kf=jnp.where(hit, slot, h.anchor_kf),
        rel_pose=jnp.where(hit[:, None], ident, h.rel_pose),
        anchor_kf2=jnp.where(hit, slot, h.anchor_kf2),
        rel_pose2=jnp.where(hit[:, None], ident, h.rel_pose2),
        anchor_dist=jnp.where(hit, 0.0, h.anchor_dist),
    )


@jax.jit
def reanchor(h: PoseHistory, kf_pose: jnp.ndarray, kf_valid: jnp.ndarray,
             dead_kf_mask: jnp.ndarray, new_anchor: jnp.ndarray
             ) -> PoseHistory:
    """Re-anchor entries whose keyframe is being culled onto a surviving
    keyframe (PoseHistory.cpp:95-110): world pose is preserved by composing
    through the old anchor before switching.  Both anchor slots are
    retargeted independently; the record-time anchor separation is
    refreshed from the current poses (a consistent snapshot)."""
    K = kf_valid.shape[0]
    na = jnp.clip(new_anchor, 0, K - 1)

    def retarget(anchor, rel):
        safe = jnp.clip(anchor, 0, K - 1)
        needs = h.valid & dead_kf_mask[safe]
        world = jax.vmap(se3.pose_compose)(rel, kf_pose[safe])
        new_rel = jax.vmap(se3.pose_compose)(
            world, jax.vmap(se3.pose_inverse)(kf_pose[na]))
        return (jnp.where(needs, na, anchor),
                jnp.where(needs[:, None], new_rel, rel), needs)

    a1, r1, n1 = retarget(h.anchor_kf, h.rel_pose)
    a2, r2, n2 = retarget(h.anchor_kf2, h.rel_pose2)
    changed = n1 | n2
    c1 = jax.vmap(se3.camera_center)(kf_pose[jnp.clip(a1, 0, K - 1)])
    c2 = jax.vmap(se3.camera_center)(kf_pose[jnp.clip(a2, 0, K - 1)])
    new_dist = jnp.linalg.norm(c1 - c2, axis=-1)
    return h._replace(
        anchor_kf=a1, rel_pose=r1, anchor_kf2=a2, rel_pose2=r2,
        anchor_dist=jnp.where(changed, new_dist, h.anchor_dist),
    )


@jax.jit
def nearest_valid_kf(kf_valid: jnp.ndarray, dead_mask: jnp.ndarray,
                     query_kf: jnp.ndarray,
                     kf_frame_id: jnp.ndarray = None) -> jnp.ndarray:
    """For each query keyframe id, the id of the nearest surviving
    keyframe — used to pick re-anchor targets.

    Nearest by FRAME ID (temporal adjacency) when kf_frame_id is given:
    slot indices are recycled arbitrarily, so slot distance can re-anchor
    a frame onto a keyframe from a different part of the trajectory.
    That preserves the pose AT reanchor time, but any later SECTORED
    correction — a loop closure moving only the covisible set — shears
    the frame about its far-away anchor."""
    K = kf_valid.shape[0]
    alive = kf_valid & ~dead_mask
    if kf_frame_id is None:
        key = jnp.arange(K)
    else:
        key = kf_frame_id
    dist = jnp.abs(key[None, :] - key[query_kf][:, None])
    dist = jnp.where(alive[None, :], dist, jnp.int32(2**30))
    return jnp.argmin(dist, axis=1).astype(jnp.int32)
