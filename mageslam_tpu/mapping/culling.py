"""Map maintenance: recent-map-point culling + keyframe culling.

Equivalents of the reference's
  - CullRecentMapPoints (ThreadSafeMap, under the
    KeyframeInsertionAndMapPointCulling state; ORB-SLAM VI-B policy:
    a recent point must be found in >= pct of the frames that predicted it,
    and be observed from >= 3 keyframes within a few keyframes of creation —
    TrackLocalMapSettings.RecentMapPointPctSuccess,
    MappingSettings.MinNumKeyframesForMapPointCulling)
  - CullLocalKeyframes (ThreadSafeMap.cpp:1049-1130: cull keyframes whose
    points are >= 90% covered by >= 3 other keyframes; immortality guard).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.mapstore import map_state as ms


class CullResult(NamedTuple):
    map: ms.MapState
    num_points_culled: jnp.ndarray
    num_keyframes_culled: jnp.ndarray
    kf_culled_mask: jnp.ndarray


@functools.partial(jax.jit, static_argnames=())
def cull_recent_map_points(m: ms.MapState,
                           pct_success,
                           min_observing_kf,
                           scrutiny_generations=3):
    """Cull under-performing recent points.  A point is 'recent' while
    num_kf_ever - created_gen <= scrutiny_generations; at the end of
    scrutiny it must be observed by >= min_observing_kf keyframes; at any
    time with enough predictions it must keep found/predicted >= pct."""
    mem = ms.member_matrix(m)
    obs_count = jnp.sum(mem, axis=0)
    age = m.num_kf_ever - m.mp_created_kf_gen
    recent = m.mp_valid & (age <= scrutiny_generations)

    ratio = m.mp_found / jnp.maximum(m.mp_predicted, 1.0)
    enough_data = m.mp_predicted >= 3.0
    fail_ratio = recent & enough_data & (ratio < pct_success)
    fail_obs = m.mp_valid & (age == scrutiny_generations) \
        & (obs_count < min_observing_kf)
    kill = fail_ratio | fail_obs
    m2 = ms.remove_map_points(m, kill)
    return m2, jnp.sum(kill)


@functools.partial(jax.jit, static_argnames=("window",))
def cull_keyframes(m: ms.MapState, center_kf,
                   max_overlap,
                   min_covis_count,
                   window: int = 8):
    """Cull redundant keyframes among those covisible with center_kf.

    A keyframe dies when >= max_overlap (0.9) of its observed points are
    each observed by >= min_covis_count (3) *other* keyframes.  One cull per
    call (like the reference's incremental culling per mapping pass) to keep
    the covisibility recomputation honest between removals.
    """
    K, F, L = ms.capacities(m)
    mem = ms.member_matrix(m)
    obs_count = jnp.sum(mem, axis=0)                 # (L,)
    # per keyframe: fraction of its points covered by >= min_covis others
    covered = obs_count[None, :] - mem.astype(jnp.int32) >= min_covis_count
    n_pts = jnp.sum(mem, axis=1)
    n_cov = jnp.sum(mem & covered, axis=1)
    frac = n_cov / jnp.maximum(n_pts, 1)

    kf_idx, kf_ok = ms.connected_keyframes(m, center_kf, min_shared=1,
                                           max_connected=window)
    in_window = jnp.zeros(K + 1, bool).at[
        jnp.where(kf_ok, kf_idx, K)].set(True)[:K]
    eligible = (m.kf_valid & in_window & ~m.kf_immortal
                & (n_pts > 0) & (frac >= max_overlap))
    eligible &= jnp.arange(K) != center_kf
    # cull at most one (the most redundant)
    score = jnp.where(eligible, frac, -1.0)
    victim = jnp.argmax(score)
    do_cull = score[victim] >= 0
    kill_mask = jnp.zeros(K, bool).at[victim].set(do_cull)
    m2 = ms.remove_keyframes(m, kill_mask)
    return CullResult(m2, jnp.int32(0), jnp.sum(kill_mask), kill_mask)


@jax.jit
def accumulate_tracking_stats(m: ms.MapState, predicted_mask: jnp.ndarray,
                              found_mask: jnp.ndarray) -> ms.MapState:
    """Fold one frame's predicted/found map-point masks into the stats
    (TrackLocalMap recent-point scoring feed)."""
    return m._replace(
        mp_predicted=m.mp_predicted + predicted_mask.astype(jnp.float32),
        mp_found=m.mp_found + found_mask.astype(jnp.float32),
    )
