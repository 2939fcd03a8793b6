"""Global bundle adjustment problem over the whole map.

Used by Fossilize (MAGESlam.cpp:322-383 runs a final global BA before
producing the immutable trajectory) and by loop closure (the reference's
CloseLoop runs a global BA as its correction polish,
LoopClosureWorker.cpp:164-210).

Fixed-shape: all K keyframe slots, all L map-point slots, M observation
slots per landmark filled with its top-observing keyframes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, BAResult,
                                                bundle_adjust, empty_tethers)


class GlobalBAWindow(NamedTuple):
    problem: BAProblem
    kf_list: jnp.ndarray
    kf_list_valid: jnp.ndarray
    mp_list: jnp.ndarray
    mp_list_valid: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("max_obs_per_point",))
def build_global_problem(m: ms.MapState,
                         max_obs_per_point: int = 12) -> GlobalBAWindow:
    K, F, L = ms.capacities(m)
    M = max_obs_per_point
    mem = ms.member_matrix(m)                      # (K, L)

    # per landmark: top-M observing keyframes (tie-break by lower kf id)
    score = mem.astype(jnp.float32) \
        - jnp.arange(K, dtype=jnp.float32)[:, None] * 1e-6
    vals, kf_of_obs = jax.lax.top_k(score.T, M)    # (L, M)
    obs_ok = vals > 0.5

    feat_of = ms.feat_index_of_points(m, jnp.arange(K, dtype=jnp.int32))
    feat_sel = feat_of[jnp.clip(kf_of_obs, 0, K - 1),
                       jnp.arange(L)[:, None]]      # (L, M)
    obs_ok &= feat_sel >= 0
    obs_xn = m.kf_xn[jnp.clip(kf_of_obs, 0, K - 1),
                     jnp.clip(feat_sel, 0, F - 1)]  # (L, M, 2)

    # gauge: fix the oldest valid keyframe (reference fixes the first)
    fid = jnp.where(m.kf_valid, m.kf_frame_id, jnp.int32(2**30))
    oldest = jnp.argmin(fid)
    kf_fixed = (~m.kf_valid) | (jnp.arange(K) == oldest)

    problem = BAProblem(
        kf_poses=m.kf_pose,
        kf_fixed=kf_fixed,
        points=m.mp_pos,
        point_valid=m.mp_valid,
        obs_kf=jnp.clip(kf_of_obs, 0, K - 1).astype(jnp.int32),
        obs_xn=obs_xn,
        obs_valid=obs_ok & m.mp_valid[:, None],
        **{k: jnp.asarray(v) for k, v in empty_tethers(0).items()},
    )
    return GlobalBAWindow(problem,
                          jnp.arange(K, dtype=jnp.int32), m.kf_valid,
                          jnp.arange(L, dtype=jnp.int32), m.mp_valid)


@functools.partial(jax.jit, static_argnames=("num_steps",
                                             "max_obs_per_point"))
def global_bundle_adjust(m: ms.MapState, huber_delta, max_outlier_error,
                         num_steps: int = 10, lam0=1e-4,
                         max_obs_per_point: int = 12):
    """Build + solve + write back a global BA.  Returns (map, BAResult)."""
    win = build_global_problem(m, max_obs_per_point)
    res = bundle_adjust(win.problem, huber_delta, max_outlier_error,
                        num_steps=num_steps, lam0=lam0)
    m2 = ms.apply_ba_update(m, win.kf_list, win.kf_list_valid,
                            res.kf_poses, win.mp_list, win.mp_list_valid,
                            res.points)
    return m2, res
