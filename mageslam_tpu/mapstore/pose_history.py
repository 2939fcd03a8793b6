"""Full-trajectory pose history with N-anchor keyframe-relative offsets.

Equivalent of the reference's PoseHistory / ThreadSafePoseHistory
(Map/PoseHistory.*): every tracked frame stores offsets to up to N nearby
keyframes — the most-covisible ones, N = InitalInterpolationConnections =
4 (PoseHistory.cpp:34-52, MageSettings.h:210); after BA/loop adjustments
non-keyframe poses are re-interpolated from the updated keyframes with
inverse-offset-distance weights (HistoricalPose::ComputeWorldPosition,
Data/HistoricalPose.cpp:78-130: weight = 1/(eps + |offset|), sign-aligned
quaternion lerp); keyframe removal re-anchors connections onto surviving
keyframes (PoseHistory.cpp:95-110).

TPU design: fixed-capacity ring of (H, N) anchor slots, all compose /
blend math batched over the whole history in one fused program.  Two
deliberate extensions over the reference's scheme, both born from the r4
sector-rescale fossil regression (BASELINE.md r4 loop-closure notes):

  - SCALE-AWARE offsets: a Sim(3) loop correction rescales local
    distances; the ratio of the anchors' current pairwise separations to
    their record-time separations (median over pairs, per entry) measures
    exactly that local scale change, and each anchor's offset is rescaled
    by it before blending.  Without this a 1.25x sector rescale shears
    anchored frames by |offset| * delta_scale.
  - the blend runs over ALL alive anchors with inverse-distance weights,
    so a frame near a correction seam (anchors on both sides) gets a
    smooth ramp instead of the two-anchor scheme's mid-seam jump — this
    is precisely the reference's N-way re-interpolation behavior.

Capacity is fixed (PoseHistorySettings.PoseHistoryInitialSize = 10000
~ 5.5 min, MageSettings.h:212).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3

# reference: PoseHistorySettings.InitalInterpolationConnections = 4
# (MageSettings.h:210)
N_ANCHORS = 4

# index pairs (i < j) over the N anchor slots, for the pairwise
# separation-ratio scale estimate
_PAIRS_I, _PAIRS_J = zip(*[(i, j) for i in range(N_ANCHORS)
                           for j in range(i + 1, N_ANCHORS)])


class PoseHistory(NamedTuple):
    frame_id: jnp.ndarray    # (H,) int32
    timestamp: jnp.ndarray   # (H,) float32
    anchor_kf: jnp.ndarray   # (H, N) int32 anchor keyframe slots (-1 empty)
    rel_pose: jnp.ndarray    # (H, N, 7) T_frame * T_anchor^-1 at record
    anchor_c: jnp.ndarray    # (H, N, 3) anchor world centers at record
    valid: jnp.ndarray       # (H,) bool
    cursor: jnp.ndarray      # int32 ring-buffer write position


def empty_history(capacity: int) -> PoseHistory:
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
                     (capacity, N_ANCHORS, 1))
    return PoseHistory(
        frame_id=jnp.full(capacity, -1, jnp.int32),
        timestamp=jnp.zeros(capacity, jnp.float32),
        anchor_kf=jnp.full((capacity, N_ANCHORS), -1, jnp.int32),
        rel_pose=ident,
        anchor_c=jnp.zeros((capacity, N_ANCHORS, 3), jnp.float32),
        valid=jnp.zeros(capacity, bool),
        cursor=jnp.int32(0),
    )


def _pad_anchors(anchor_kfs, anchor_ok):
    """Normalize anchors to a fixed (N,) slot vector + ok mask; duplicate
    slots keep only their FIRST occurrence (the reference skips already-
    connected keyframes, PoseHistory.cpp:118-124)."""
    a = jnp.atleast_1d(jnp.asarray(anchor_kfs, jnp.int32))
    n = a.shape[0]
    if anchor_ok is None:
        ok = jnp.ones(n, bool)
    else:
        ok = jnp.atleast_1d(jnp.asarray(anchor_ok, bool))
    if n < N_ANCHORS:
        a = jnp.concatenate([a, jnp.full(N_ANCHORS - n, -1, jnp.int32)])
        ok = jnp.concatenate([ok, jnp.zeros(N_ANCHORS - n, bool)])
    else:
        a, ok = a[:N_ANCHORS], ok[:N_ANCHORS]
    ok &= a >= 0
    same = (a[:, None] == a[None, :]) & ok[:, None] & ok[None, :]
    earlier = jnp.tril(jnp.ones((N_ANCHORS, N_ANCHORS), bool), k=-1)
    ok &= ~jnp.any(same & earlier, axis=1)
    return jnp.where(ok, a, -1), ok


@jax.jit
def add_pose(h: PoseHistory, frame_id, timestamp, pose: jnp.ndarray,
             anchor_kfs, kf_pose: jnp.ndarray,
             anchor_ok=None) -> PoseHistory:
    """Record a tracked frame's pose relative to up to N anchor keyframes
    (History.AddHistoricalPose, TrackLocalMapWorker.cpp:204; offsets per
    HistoricalPose::ComputeFrameOffset).  ``anchor_kfs`` is a scalar or
    (n,) vector of keyframe slots (first = preferred, duplicates and -1
    ignored); ``kf_pose`` is the full (K, 7) keyframe pose table."""
    K = kf_pose.shape[0]
    a, ok = _pad_anchors(anchor_kfs, anchor_ok)
    ap = kf_pose[jnp.clip(a, 0, K - 1)]                       # (N, 7)
    rel = jax.vmap(lambda p: se3.pose_compose(pose, se3.pose_inverse(p))
                   )(ap)
    centers = jax.vmap(se3.camera_center)(ap)
    ident = jnp.broadcast_to(se3.pose_identity(), rel.shape)
    rel = jnp.where(ok[:, None], rel, ident)
    i = h.cursor
    cap = h.valid.shape[0]
    return h._replace(
        frame_id=h.frame_id.at[i].set(jnp.asarray(frame_id, jnp.int32)),
        timestamp=h.timestamp.at[i].set(jnp.asarray(timestamp,
                                                    jnp.float32)),
        anchor_kf=h.anchor_kf.at[i].set(a),
        rel_pose=h.rel_pose.at[i].set(rel),
        anchor_c=h.anchor_c.at[i].set(
            jnp.where(ok[:, None], centers, 0.0)),
        valid=h.valid.at[i].set(True),
        cursor=(i + 1) % cap,
    )


@jax.jit
def world_poses(h: PoseHistory, kf_pose: jnp.ndarray,
                kf_valid: jnp.ndarray):
    """Current world poses of all history entries given the (possibly
    BA-adjusted) keyframe poses — the re-interpolation step
    (PoseHistory::AdjustPoses / HistoricalPose::ComputeWorldPosition).
    Returns (poses (H, 7), valid (H,))."""
    K = kf_valid.shape[0]
    a = h.anchor_kf                                         # (H, N)
    safe = jnp.clip(a, 0, K - 1)
    ok = h.valid[:, None] & (a >= 0) & kf_valid[safe]       # (H, N)
    ap = kf_pose[safe]                                      # (H, N, 7)
    c_now = jax.vmap(jax.vmap(se3.camera_center))(ap)       # (H, N, 3)

    # local scale change: per entry, the median over anchor pairs of
    # (current separation / record-time separation).  Clipped — a wild
    # ratio means the anchors ended up in different corrected sectors,
    # where rescaling by it would do more harm than good.
    pi = jnp.asarray(_PAIRS_I)
    pj = jnp.asarray(_PAIRS_J)
    d_now = jnp.linalg.norm(c_now[:, pi] - c_now[:, pj], axis=-1)
    d_rec = jnp.linalg.norm(h.anchor_c[:, pi] - h.anchor_c[:, pj],
                            axis=-1)
    pair_ok = ok[:, pi] & ok[:, pj] & (d_rec > 1e-6)
    ratio = jnp.where(pair_ok, d_now / jnp.maximum(d_rec, 1e-6), jnp.nan)
    s_local = jnp.nan_to_num(jnp.nanmedian(ratio, axis=1), nan=1.0)
    s_local = jnp.clip(s_local, 0.5, 2.0)

    # per-anchor world prediction, offset rescaled by the local scale
    w = jax.vmap(jax.vmap(se3.pose_compose))(h.rel_pose, ap)  # (H, N, 7)
    c_w = jax.vmap(jax.vmap(se3.camera_center))(w)
    c_pred = c_now + s_local[:, None, None] * (c_w - c_now)

    # inverse-offset-distance weights (HistoricalPose.cpp:87: weight =
    # 1/(scaleFudge + |offset|); |t| of T_frame*T_anchor^-1 IS the
    # record-time center distance)
    off = jnp.linalg.norm(h.rel_pose[..., 4:7], axis=-1)     # (H, N)
    wgt = jnp.where(ok, 1.0 / (1e-5 + off), 0.0)
    wsum = jnp.maximum(jnp.sum(wgt, axis=1), 1e-20)

    # rotation blend: sign-align every anchor's quaternion to the first
    # alive one, then weighted sum + normalize (the reference's averaged-
    # quaternion technique, HistoricalPose.cpp:92-122)
    q = w[..., :4]                                           # (H, N, 4)
    first = jnp.argmax(ok, axis=1)
    qr = q[jnp.arange(q.shape[0]), first]                    # (H, 4)
    sign = jnp.sign(jnp.sum(q * qr[:, None, :], -1, keepdims=True)
                    + 1e-20)
    qb = jnp.sum(q * sign * wgt[..., None], axis=1)
    qb = se3.quat_normalize(qb)
    cb = jnp.sum(c_pred * wgt[..., None], axis=1) / wsum[:, None]
    Rb = se3.quat_to_mat(qb)
    tb = -jnp.einsum("hij,hj->hi", Rb, cb)
    poses = jnp.concatenate([qb, tb], -1)
    return poses, jnp.any(ok, axis=1)


@jax.jit
def anchor_frame_to_kf(h: PoseHistory, frame_id, kf_slot) -> PoseHistory:
    """Re-anchor the history entry of a frame PROMOTED to a keyframe onto
    its own keyframe slot (identity offset, sole anchor).  Without this
    the promoted frame's trajectory pose forever rides a stale pre-BA
    offset to the previous reference keyframe — every later BA refinement
    of the keyframe itself is invisible to the exported trajectory (the
    reference keeps keyframe-backed poses exact the same way: keyframes
    live in m_keyframes with their own adjusted WorldPosition,
    PoseHistory.cpp:142-160)."""
    hit = h.valid & (h.frame_id == jnp.asarray(frame_id, jnp.int32))
    slot = jnp.asarray(kf_slot, jnp.int32)
    own = jnp.full(N_ANCHORS, -1, jnp.int32).at[0].set(slot)
    ident = jnp.broadcast_to(se3.pose_identity(), h.rel_pose.shape)
    return h._replace(
        anchor_kf=jnp.where(hit[:, None], own[None, :], h.anchor_kf),
        rel_pose=jnp.where(hit[:, None, None], ident, h.rel_pose),
        anchor_c=jnp.where(hit[:, None, None], 0.0, h.anchor_c),
    )


@jax.jit
def reanchor(h: PoseHistory, kf_pose: jnp.ndarray, kf_valid: jnp.ndarray,
             dead_kf_mask: jnp.ndarray, new_anchor: jnp.ndarray
             ) -> PoseHistory:
    """Re-anchor slots whose keyframe is being culled onto a surviving
    keyframe (PoseHistory.cpp:95-134): the world pose each dead slot
    predicts is preserved by composing through the old anchor before
    switching — the reference's ComputeOffsetPosition-then-reconnect.

    ``new_anchor`` is a (K,) per-keyframe-slot retarget table (from
    ``nearest_valid_kf``).  A retargeted slot that collides with another
    alive anchor of the same entry is dropped instead (the reference
    skips already-connected keyframes).  Entries touched by any retarget
    get their record-time anchor-center snapshot refreshed from the
    CURRENT poses — one consistent scale baseline."""
    K = kf_valid.shape[0]
    safe = jnp.clip(h.anchor_kf, 0, K - 1)                  # (H, N)
    alive = (h.anchor_kf >= 0) & h.valid[:, None]
    needs = alive & dead_kf_mask[safe]                      # (H, N)
    na = new_anchor[safe]                                   # (H, N)

    world = jax.vmap(jax.vmap(se3.pose_compose))(h.rel_pose,
                                                 kf_pose[safe])
    new_rel = jax.vmap(jax.vmap(se3.pose_compose))(
        world, jax.vmap(jax.vmap(se3.pose_inverse))(
            kf_pose[jnp.clip(na, 0, K - 1)]))

    a2 = jnp.where(needs, na, h.anchor_kf)
    # drop retargeted slots that collide with an already-present anchor
    coll = (a2[:, :, None] == a2[:, None, :]) \
        & (alive | needs)[:, :, None] & (alive | needs)[:, None, :]
    earlier = jnp.tril(jnp.ones((N_ANCHORS, N_ANCHORS), bool), k=-1)
    dropped = needs & jnp.any(coll & earlier[None], axis=2)
    a2 = jnp.where(dropped, -1, a2)
    rel2 = jnp.where((needs & ~dropped)[..., None], new_rel, h.rel_pose)

    changed = jnp.any(needs, axis=1)                        # (H,)
    ok2 = (a2 >= 0) & h.valid[:, None]
    c_cur = jax.vmap(jax.vmap(se3.camera_center))(
        kf_pose[jnp.clip(a2, 0, K - 1)])
    anchor_c = jnp.where(changed[:, None, None],
                         jnp.where(ok2[..., None], c_cur, 0.0),
                         h.anchor_c)
    return h._replace(anchor_kf=a2, rel_pose=rel2, anchor_c=anchor_c)


@jax.jit
def nearest_valid_kf(kf_valid: jnp.ndarray, dead_mask: jnp.ndarray,
                     kf_frame_id: jnp.ndarray) -> jnp.ndarray:
    """(K,) per-keyframe-slot retarget table: for every slot, the nearest
    SURVIVING keyframe by FRAME ID (temporal adjacency) — slot indices
    recycle arbitrarily, so slot distance could re-anchor a frame onto a
    keyframe from a different part of the trajectory, and any later
    SECTORED correction would shear the frame about that far anchor."""
    K = kf_valid.shape[0]
    alive = kf_valid & ~dead_mask
    key = kf_frame_id
    dist = jnp.abs(key[None, :] - key[:, None])
    dist = jnp.where(alive[None, :], dist, jnp.int32(2 ** 30))
    return jnp.argmin(dist, axis=1).astype(jnp.int32)
