"""The world map as functional state: fixed-capacity padded device arrays.

TPU-native replacement for the reference's authoritative store + concurrency
machinery: Map/Map.* (keyframes + map points + association add/remove/merge,
Map.h:36-55), Map/ThreadSafeMap.* (shared_mutex façade, ThreadSafeMap.h:263),
the Proxies snapshot system (Proxies/Proxy.h:22-60), and
Containers/MapPointAssociations.* (bidirectional map-point<->keypoint
association container).

Design (SURVEY.md §7 "functional state, not locked objects"):
  - One ``MapState`` NamedTuple of fixed-shape arrays; every mutation is a
    pure jitted function returning a new state.  Snapshot isolation is free
    (immutable pytrees ARE proxies); the reference's barrier states become
    host-side orchestration of which state version each stage reads.
  - Keyframe slots (K) and map-point slots (L) are preallocated; ``*_valid``
    masks define liveness; culling = clearing masks; allocation = rank-based
    free-slot assignment (the ImageFactory pool allocator made literal,
    Image/ImageFactory.h:21-60).
  - The covisibility graph (Map/CovisibilityGraph.*: Eigen sparse adjacency)
    is *derived, not stored*: a (K, L) membership matrix is built by one
    scatter from the association table and covis counts are one MXU matmul —
    recomputing beats maintaining sparse increments at these sizes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.tracking.frontend import FrameFeatures


class MapState(NamedTuple):
    """K keyframe slots, F feature slots per keyframe, L map-point slots."""

    # keyframes
    kf_pose: jnp.ndarray        # (K, 7) view poses
    kf_valid: jnp.ndarray       # (K,) bool
    kf_frame_id: jnp.ndarray    # (K,) int32 source frame id
    kf_immortal: jnp.ndarray    # (K,) bool — never culled (Keyframe.h:157)
    # per-keyframe feature copies (the AnalyzedImage snapshot)
    kf_uv: jnp.ndarray          # (K, F, 2)
    kf_xn: jnp.ndarray          # (K, F, 2) undistorted normalized
    kf_desc: jnp.ndarray        # (K, F, 8) uint32
    kf_octave: jnp.ndarray      # (K, F) int32
    kf_feat_valid: jnp.ndarray  # (K, F) bool
    kf_assoc: jnp.ndarray       # (K, F) int32 map-point id or -1
    # map points
    mp_pos: jnp.ndarray         # (L, 3)
    mp_valid: jnp.ndarray       # (L,) bool
    mp_desc: jnp.ndarray        # (L, 8) uint32 representative descriptor
    mp_normal: jnp.ndarray      # (L, 3) mean viewing direction (world)
    mp_anchor_kf: jnp.ndarray   # (L,) int32 creating keyframe
    mp_found: jnp.ndarray       # (L,) f32 found count (recent-point culling,
    mp_predicted: jnp.ndarray   # (L,) f32 predicted count  TrackLocalMap.h:114)
    mp_refine_count: jnp.ndarray  # (L,) int32 BA refinements (MapPoint.h)
    mp_created_kf_gen: jnp.ndarray  # (L,) int32 kf-generation at creation
    # scale-invariance info (TrackLocalMap.h:51-65 IsGoodCandidate /
    # ORB-SLAM mfMaxDistance): octave of the creating observation and the
    # scale-pyramid max viewing distance d_create * scale^octave.
    # max_dist <= 0 means "no scale info" (single-level maps; gates pass)
    mp_octave: jnp.ndarray      # (L,) int32
    mp_max_dist: jnp.ndarray    # (L,) f32
    # counters
    num_kf_ever: jnp.ndarray    # int32 — generation counter


def empty_map(max_keyframes: int, max_features: int,
              max_map_points: int) -> MapState:
    K, F, L = max_keyframes, max_features, max_map_points
    return MapState(
        kf_pose=jnp.tile(
            jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32), (K, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, jnp.int32),
        kf_immortal=jnp.zeros(K, bool),
        kf_uv=jnp.zeros((K, F, 2), jnp.float32),
        kf_xn=jnp.zeros((K, F, 2), jnp.float32),
        kf_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_octave=jnp.zeros((K, F), jnp.int32),
        kf_feat_valid=jnp.zeros((K, F), bool),
        kf_assoc=jnp.full((K, F), -1, jnp.int32),
        mp_pos=jnp.zeros((L, 3), jnp.float32),
        mp_valid=jnp.zeros(L, bool),
        mp_desc=jnp.zeros((L, 8), jnp.uint32),
        mp_normal=jnp.zeros((L, 3), jnp.float32),
        mp_anchor_kf=jnp.full(L, -1, jnp.int32),
        mp_found=jnp.zeros(L, jnp.float32),
        mp_predicted=jnp.zeros(L, jnp.float32),
        mp_refine_count=jnp.zeros(L, jnp.int32),
        mp_created_kf_gen=jnp.full(L, -1, jnp.int32),
        mp_octave=jnp.zeros(L, jnp.int32),
        mp_max_dist=jnp.zeros(L, jnp.float32),
        num_kf_ever=jnp.int32(0),
    )


def capacities(m: MapState):
    K, F = m.kf_assoc.shape
    L = m.mp_valid.shape[0]
    return K, F, L


# ---------------------------------------------------------------------------
# Derived structures
# ---------------------------------------------------------------------------

@jax.jit
def member_matrix(m: MapState) -> jnp.ndarray:
    """(K, L) bool: keyframe k observes map point l.  One scatter."""
    K, F, L = capacities(m)
    safe = jnp.where((m.kf_assoc >= 0) & m.kf_valid[:, None], m.kf_assoc, L)
    mem = jnp.zeros((K, L + 1), bool)
    mem = mem.at[jnp.arange(K)[:, None], safe].set(True)
    return mem[:, :L] & m.mp_valid[None, :]


@jax.jit
def covisibility(m: MapState) -> jnp.ndarray:
    """(K, K) shared-map-point counts (CovisibilityGraph.h:106 analog) —
    one MXU matmul over the membership matrix, diagonal zeroed."""
    mem = member_matrix(m).astype(jnp.float32)
    c = (mem @ mem.T).astype(jnp.int32)
    K = c.shape[0]
    return c * (1 - jnp.eye(K, dtype=jnp.int32))


@jax.jit
def feat_index_of_points(m: MapState, kf_list: jnp.ndarray) -> jnp.ndarray:
    """(Kw, L) int32: feature index in keyframe kf_list[k] observing map
    point l, or -1.  Inverse of the association table for a window of
    keyframes (one scatter per window keyframe, vmapped)."""
    K, F, L = capacities(m)

    def one(kf):
        assoc = m.kf_assoc[kf]
        safe = jnp.where(assoc >= 0, assoc, L)
        out = jnp.full(L + 1, -1, jnp.int32)
        out = out.at[safe].set(jnp.arange(F, dtype=jnp.int32))
        return out[:L]

    return jax.vmap(one)(kf_list)


@jax.jit
def refresh_point_representatives(m: MapState) -> MapState:
    """Recompute each map point's representative descriptor (the medoid of
    its observations' descriptors) and mean viewing direction — the
    reference updates both on every association change
    (Map/MapPoint.cpp:80-131 UpdateRepresentativeDescriptor /
    UpdateMeanViewDirectionAndDistances).  Without this, point descriptors
    stay frozen at creation viewpoint and go stale as the camera moves,
    which silently degrades relocalization and loop detection.

    Batched TPU shape: gather (L, K, 8) observation descriptors via the
    member matrix, one (L, K, K) popcount for pairwise distances, medoid by
    masked argmin — a handful of fused elementwise passes per mapping
    commit instead of the reference's per-association incremental walk."""
    K, F, L = capacities(m)
    feat_of = feat_index_of_points(
        m, jnp.arange(K, dtype=jnp.int32))          # (K, L)
    obs = (feat_of >= 0) & m.kf_valid[:, None]      # (K, L)
    fclip = jnp.clip(feat_of, 0, F - 1)
    desc = m.kf_desc[jnp.arange(K)[:, None], fclip]  # (K, L, 8)
    desc = desc.transpose(1, 0, 2)                   # (L, K, 8)
    obs_l = obs.T                                    # (L, K)

    # chunk over landmarks: the (Lc, K, K) pairwise-Hamming block stays
    # ~64 MB at default capacities instead of a 2 GB (L, K, K) tensor
    CH = 256

    def chunk_medoid(args):
        d, o = args                                  # (CH, K, 8), (CH, K)
        x = jnp.bitwise_xor(d[:, :, None, :], d[:, None, :, :])
        dm = jnp.sum(jax.lax.population_count(x), -1).astype(jnp.int32)
        pair_ok = o[:, :, None] & o[:, None, :]
        sums = jnp.sum(jnp.where(pair_ok, dm, 0), axis=-1)
        sums = jnp.where(o, sums, jnp.int32(1 << 30))
        return jnp.argmin(sums, axis=-1)             # (CH,)

    nch = (L + CH - 1) // CH
    pad = nch * CH - L
    d_pad = jnp.pad(desc, ((0, pad), (0, 0), (0, 0)))
    o_pad = jnp.pad(obs_l, ((0, pad), (0, 0)))
    medoid = jax.lax.map(
        chunk_medoid,
        (d_pad.reshape(nch, CH, K, 8), o_pad.reshape(nch, CH, K))
    ).reshape(-1)[:L]                                # (L,)
    any_obs = jnp.any(obs_l, axis=-1)
    new_desc = desc[jnp.arange(L), medoid]
    mp_desc = jnp.where((m.mp_valid & any_obs)[:, None], new_desc,
                        m.mp_desc)

    # mean viewing direction: average of unit point->camera... the
    # reference accumulates normalized camera->point deltas; keep our
    # existing convention (unit vectors from camera center to point,
    # matching the angle gate in tracking/track.py)
    from mageslam_tpu.geometry import se3
    centers = jax.vmap(se3.camera_center)(m.kf_pose)       # (K, 3)
    delta = m.mp_pos[None, :, :] - centers[:, None, :]     # (K, L, 3)
    delta = delta / jnp.maximum(
        jnp.linalg.norm(delta, axis=-1, keepdims=True), 1e-9)
    mean = jnp.sum(jnp.where(obs[:, :, None], delta, 0.0), axis=0)  # (L,3)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    mean = mean / jnp.maximum(norm, 1e-9)
    mp_normal = jnp.where((m.mp_valid & any_obs & (norm[:, 0] > 1e-6))
                          [:, None], mean, m.mp_normal)
    return m._replace(mp_desc=mp_desc, mp_normal=mp_normal)


# ---------------------------------------------------------------------------
# Keyframe insertion / removal
# ---------------------------------------------------------------------------

def _first_free_slot(valid: jnp.ndarray) -> jnp.ndarray:
    """Lowest invalid slot index (or argmax fallback when full)."""
    return jnp.argmin(valid.astype(jnp.int32))


@jax.jit
def insert_keyframe(m: MapState, pose: jnp.ndarray, feats: FrameFeatures,
                    assoc: jnp.ndarray, frame_id,
                    immortal=False):
    """Insert a keyframe with its feature snapshot + associations
    (ThreadSafeMap::InsertKeyframe, ThreadSafeMap.cpp:202-222).

    assoc: (F,) int32 map-point id per feature (-1 none).  Returns
    (new_map, kf_slot).
    """
    slot = _first_free_slot(m.kf_valid)
    assoc = jnp.where(feats.valid, assoc, -1)
    m = m._replace(
        kf_pose=m.kf_pose.at[slot].set(pose),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(
            jnp.asarray(frame_id, jnp.int32)),
        kf_immortal=m.kf_immortal.at[slot].set(
            jnp.asarray(immortal, bool)),
        kf_uv=m.kf_uv.at[slot].set(feats.uv),
        kf_xn=m.kf_xn.at[slot].set(feats.xn_undist),
        kf_desc=m.kf_desc.at[slot].set(feats.desc),
        kf_octave=m.kf_octave.at[slot].set(feats.octave),
        kf_feat_valid=m.kf_feat_valid.at[slot].set(feats.valid),
        kf_assoc=m.kf_assoc.at[slot].set(assoc),
        num_kf_ever=m.num_kf_ever + 1,
    )
    return m, slot


@jax.jit
def remove_keyframes(m: MapState, kf_mask: jnp.ndarray) -> MapState:
    """Cull keyframes (ThreadSafeMap::CullLocalKeyframes write side,
    ThreadSafeMap.cpp:1049-1130).  Immortal keyframes are protected."""
    kill = kf_mask & m.kf_valid & ~m.kf_immortal
    return m._replace(
        kf_valid=m.kf_valid & ~kill,
        kf_assoc=jnp.where(kill[:, None], -1, m.kf_assoc),
        kf_feat_valid=m.kf_feat_valid & ~kill[:, None],
    )


# ---------------------------------------------------------------------------
# Map points
# ---------------------------------------------------------------------------

@jax.jit
def allocate_map_points(m: MapState, pos: jnp.ndarray, desc: jnp.ndarray,
                        normal: jnp.ndarray, anchor_kf,
                        valid: jnp.ndarray, octave=None, max_dist=None):
    """Allocate N candidate map points into free slots
    (Map::CreateMapPoints analog).  Returns (new_map, mp_ids (N,) int32
    with -1 for dropped candidates — capacity overflow or invalid input).

    octave / max_dist: per-candidate scale-invariance info (optional —
    omitted means octave 0 / max_dist 0 = "no scale info", which keeps
    every scale gate vacuous; the single-level golden path).
    """
    K, F, L = capacities(m)
    if octave is None:
        octave = jnp.zeros(valid.shape, jnp.int32)
    if max_dist is None:
        max_dist = jnp.zeros(valid.shape, jnp.float32)
    free = ~m.mp_valid
    # stable list of free slots (free first, ascending id)
    free_slots = jnp.argsort(~free)               # (L,)
    n_free = jnp.sum(free)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1   # slot rank per candidate
    ok = valid & (rank < n_free)
    slot = free_slots[jnp.clip(rank, 0, L - 1)]
    slot_safe = jnp.where(ok, slot, L)               # scratch row

    anchor = jnp.broadcast_to(jnp.asarray(anchor_kf, jnp.int32), ok.shape)
    gen = jnp.broadcast_to(m.num_kf_ever, ok.shape).astype(jnp.int32)

    mp_pos = jnp.concatenate([m.mp_pos, jnp.zeros((1, 3))], 0)
    mp_pos = mp_pos.at[slot_safe].set(pos)[:L]
    mp_desc = jnp.concatenate([m.mp_desc, jnp.zeros((1, 8), jnp.uint32)], 0)
    mp_desc = mp_desc.at[slot_safe].set(desc)[:L]
    mp_normal = jnp.concatenate([m.mp_normal, jnp.zeros((1, 3))], 0)
    mp_normal = mp_normal.at[slot_safe].set(normal)[:L]
    mp_valid = jnp.concatenate([m.mp_valid, jnp.zeros(1, bool)], 0)
    mp_valid = mp_valid.at[slot_safe].set(True)[:L]
    mp_anchor = jnp.concatenate([m.mp_anchor_kf, jnp.zeros(1, jnp.int32)], 0)
    mp_anchor = mp_anchor.at[slot_safe].set(anchor)[:L]
    mp_gen = jnp.concatenate([m.mp_created_kf_gen,
                              jnp.zeros(1, jnp.int32)], 0)
    mp_gen = mp_gen.at[slot_safe].set(gen)[:L]
    zf = jnp.concatenate([m.mp_found, jnp.zeros(1)], 0)
    zf = zf.at[slot_safe].set(0.0)[:L]
    zp = jnp.concatenate([m.mp_predicted, jnp.zeros(1)], 0)
    zp = zp.at[slot_safe].set(0.0)[:L]
    zr = jnp.concatenate([m.mp_refine_count, jnp.zeros(1, jnp.int32)], 0)
    zr = zr.at[slot_safe].set(0)[:L]
    zo = jnp.concatenate([m.mp_octave, jnp.zeros(1, jnp.int32)], 0)
    zo = zo.at[slot_safe].set(jnp.asarray(octave, jnp.int32))[:L]
    zd = jnp.concatenate([m.mp_max_dist, jnp.zeros(1, jnp.float32)], 0)
    zd = zd.at[slot_safe].set(jnp.asarray(max_dist, jnp.float32))[:L]

    m = m._replace(mp_pos=mp_pos, mp_desc=mp_desc, mp_normal=mp_normal,
                   mp_valid=mp_valid, mp_anchor_kf=mp_anchor,
                   mp_created_kf_gen=mp_gen, mp_found=zf, mp_predicted=zp,
                   mp_refine_count=zr, mp_octave=zo, mp_max_dist=zd)
    mp_ids = jnp.where(ok, slot, -1).astype(jnp.int32)
    return m, mp_ids


@jax.jit
def remove_map_points(m: MapState, mp_mask: jnp.ndarray) -> MapState:
    """Cull map points and clear every association pointing at them
    (Map association remove, Map.h:36-55)."""
    K, F, L = capacities(m)
    new_valid = m.mp_valid & ~mp_mask
    safe = jnp.clip(m.kf_assoc, 0, L - 1)
    dead = (m.kf_assoc >= 0) & ~new_valid[safe]
    return m._replace(mp_valid=new_valid,
                      kf_assoc=jnp.where(dead, -1, m.kf_assoc))


@jax.jit
def set_associations(m: MapState, kf_idx, feat_idx: jnp.ndarray,
                     mp_ids: jnp.ndarray, valid: jnp.ndarray) -> MapState:
    """Batch-set kf_assoc[kf_idx, feat_idx[n]] = mp_ids[n] where valid."""
    K, F, L = capacities(m)
    fsafe = jnp.where(valid, feat_idx, F)
    row = jnp.concatenate([m.kf_assoc[kf_idx], jnp.full((1,), -1,
                                                        jnp.int32)], 0)
    row = row.at[fsafe].set(jnp.where(valid, mp_ids, -1))[:F]
    return m._replace(kf_assoc=m.kf_assoc.at[kf_idx].set(row))


@jax.jit
def merge_map_points(m: MapState, src_ids: jnp.ndarray,
                     dst_ids: jnp.ndarray, valid: jnp.ndarray) -> MapState:
    """Merge src map points into dst (loop-closure map-point merge,
    ThreadSafeMap::UpdateKeyframesFromProxies semantics,
    ThreadSafeMap.h:88-91): all associations of src are rewritten to dst,
    src slots are freed."""
    K, F, L = capacities(m)
    remap = jnp.arange(L, dtype=jnp.int32)
    src_safe = jnp.where(valid, src_ids, L)
    remap = jnp.concatenate([remap, jnp.full(1, -1, jnp.int32)])
    remap = remap.at[src_safe].set(jnp.where(valid, dst_ids, -1))[:L]
    assoc = m.kf_assoc
    safe = jnp.clip(assoc, 0, L - 1)
    new_assoc = jnp.where(assoc >= 0, remap[safe], -1)
    mp_valid = jnp.concatenate([m.mp_valid, jnp.zeros(1, bool)]
                               ).at[src_safe].set(False)[:L]
    return m._replace(kf_assoc=new_assoc, mp_valid=mp_valid)


@jax.jit
def update_point_stats(m: MapState, mp_ids: jnp.ndarray,
                       found: jnp.ndarray,
                       predicted: jnp.ndarray) -> MapState:
    """Accumulate found/predicted counts for recent-map-point culling
    (TrackLocalMap.h:114-125 scoring)."""
    K, F, L = capacities(m)
    safe = jnp.where(mp_ids >= 0, mp_ids, L)
    zf = jnp.concatenate([m.mp_found, jnp.zeros(1)]).at[safe].add(found)[:L]
    zp = jnp.concatenate([m.mp_predicted,
                          jnp.zeros(1)]).at[safe].add(predicted)[:L]
    return m._replace(mp_found=zf, mp_predicted=zp)


@jax.jit
def apply_ba_update(m: MapState, kf_list: jnp.ndarray,
                    kf_list_valid: jnp.ndarray, new_poses: jnp.ndarray,
                    mp_list: jnp.ndarray, mp_list_valid: jnp.ndarray,
                    new_pos: jnp.ndarray) -> MapState:
    """Write back BA results (Map::AdjustPosesAndMapPoints,
    ThreadSafeMap.h:170-172) and bump refinement counters."""
    K, F, L = capacities(m)
    ksafe = jnp.where(kf_list_valid, kf_list, K)
    kf_pose = jnp.concatenate([m.kf_pose, jnp.zeros((1, 7))], 0)
    kf_pose = kf_pose.at[ksafe].set(new_poses)[:K]
    psafe = jnp.where(mp_list_valid, mp_list, L)
    mp_pos = jnp.concatenate([m.mp_pos, jnp.zeros((1, 3))], 0)
    mp_pos = mp_pos.at[psafe].set(new_pos)[:L]
    rc = jnp.concatenate([m.mp_refine_count, jnp.zeros(1, jnp.int32)], 0)
    rc = rc.at[psafe].add(1)[:L]
    return m._replace(kf_pose=kf_pose, mp_pos=mp_pos, mp_refine_count=rc)


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_connected",))
def connected_keyframes(m: MapState, kf_idx, min_shared: int = 15,
                        max_connected: int = 16):
    """Top covisible keyframes of kf_idx above a threshold
    (CovisibilityGraph thresholded connected queries, CovisibilityGraph.h:60).
    Returns (idx (C,), valid (C,))."""
    cov = covisibility(m)[kf_idx]
    cov = jnp.where(m.kf_valid, cov, 0)
    vals, idx = jax.lax.top_k(cov, max_connected)
    return idx.astype(jnp.int32), vals >= min_shared


@jax.jit
def local_map_points(m: MapState, kf_list: jnp.ndarray,
                     kf_list_valid: jnp.ndarray) -> jnp.ndarray:
    """(L,) bool: map points observed by any keyframe in the list
    (the GetConnectedMapPoints local-map read, TrackLocalMapWorker.cpp:121).
    """
    K = m.kf_valid.shape[0]
    mem = member_matrix(m)
    sel = jnp.zeros(K + 1, bool).at[
        jnp.where(kf_list_valid, kf_list, K)].set(True)[:K] & m.kf_valid
    return jnp.any(mem & sel[:, None], axis=0)


def map_scale(m: MapState) -> jnp.ndarray:
    """Median distance between TEMPORALLY consecutive valid keyframe
    centers — the reference's map-scale statistic (ThreadSafeMap.h:222-224).

    Slots recycle out of temporal order after keyframe culling, so
    slot-adjacency is meaningless on long culled trajectories; order by
    kf_frame_id instead (invalid slots sort to the end and are masked)."""
    from mageslam_tpu.geometry import se3
    c = jax.vmap(se3.camera_center)(m.kf_pose)
    order = jnp.argsort(jnp.where(m.kf_valid, m.kf_frame_id,
                                  jnp.iinfo(jnp.int32).max))
    c = c[order]
    valid = m.kf_valid[order]
    d = jnp.linalg.norm(c[1:] - c[:-1], axis=-1)
    ok = valid[1:] & valid[:-1]
    d = jnp.where(ok, d, jnp.nan)
    return jnp.nanmedian(d)
