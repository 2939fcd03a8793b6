"""Local bundle-adjustment window extraction and write-back.

Equivalent of the reference's local-BA problem construction
(ThreadSafeMap::GetMapPointsAndDistantKeyframes, ThreadSafeMap.h:157-164:
window = covisible keyframes above an adaptive threshold, plus *fixed*
"distant" keyframes that observe window points but aren't adjusted) and the
BA write-back (AdjustPosesAndMapPoints).  The MappingWorker drives it per
keyframe (MappingWorker.cpp:228-286) with an adaptive covis threshold and a
persisted LM lambda.

Everything is fixed-shape: W window slots, WF fixed slots, LB landmark
slots, M = W + WF observation slots per landmark.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, BAResult,
                                                bundle_adjust, empty_tethers)


class LocalBAWindow(NamedTuple):
    problem: BAProblem
    kf_list: jnp.ndarray        # (W+WF,) map keyframe ids (window + fixed)
    kf_list_valid: jnp.ndarray  # (W+WF,)
    kf_adjustable: jnp.ndarray  # (W+WF,) bool — in-window, written back
    mp_list: jnp.ndarray        # (LB,) map point ids
    mp_list_valid: jnp.ndarray  # (LB,)


@functools.partial(jax.jit, static_argnames=("window_size", "num_fixed",
                                             "max_points"))
def build_local_window(m: ms.MapState, center_kf,
                       covis_threshold,
                       window_size: int = 16,
                       num_fixed: int = 8,
                       max_points: int = 2048) -> LocalBAWindow:
    K, F, L = ms.capacities(m)
    W, WF, LB = window_size, num_fixed, max_points
    cov = ms.covisibility(m)
    mem = ms.member_matrix(m)

    # --- window keyframes: center + top covisible >= threshold
    crow = jnp.where(m.kf_valid, cov[center_kf], -1)
    crow = crow.at[center_kf].set(-1)
    vals, idx = jax.lax.top_k(crow, W - 1)
    win_idx = jnp.concatenate([jnp.asarray(center_kf, jnp.int32)[None],
                               idx.astype(jnp.int32)])
    win_valid = jnp.concatenate([jnp.array([True]),
                                 vals >= covis_threshold])
    win_valid &= m.kf_valid[win_idx]

    # --- window map points: observed by any window keyframe
    sel_kf = jnp.zeros(K + 1, bool).at[
        jnp.where(win_valid, win_idx, K)].set(True)[:K]
    pt_mask = jnp.any(mem & sel_kf[:, None], axis=0)
    # selection when over capacity: points observed by the CENTER keyframe
    # first (its fresh triangulations are the ones BA must refine — losing
    # them to the cap re-opens the scale-drift feedback loop), then the
    # rest of the window's points, newest first within each class
    center_obs = mem[center_kf] & pt_mask
    prio = jnp.where(center_obs, 2, jnp.where(pt_mask, 1, 0)) * (L + 1) \
        + jnp.arange(L)
    order = jnp.argsort(-prio)
    mp_list = order[:LB].astype(jnp.int32)
    mp_list_valid = pt_mask[mp_list]

    # --- fixed (distant) keyframes: observe selected points, not in window
    sel_pt = jnp.zeros(L + 1, bool).at[
        jnp.where(mp_list_valid, mp_list, L)].set(True)[:L]
    obs_count = jnp.sum(mem & sel_pt[None, :], axis=1)
    obs_count = jnp.where(m.kf_valid & ~sel_kf, obs_count, 0)
    fvals, fidx = jax.lax.top_k(obs_count, WF)
    fix_idx = fidx.astype(jnp.int32)
    fix_valid = fvals > 0

    kf_list = jnp.concatenate([win_idx, fix_idx])
    kf_list_valid = jnp.concatenate([win_valid, fix_valid])
    kf_adjustable = jnp.concatenate(
        [win_valid, jnp.zeros(WF, bool)])

    # gauge anchoring: a monocular BA window has a SEVEN-dof gauge — one
    # fixed pose pins 6 but a similarity about that camera's center leaves
    # every reprojection invariant, so scale is an exact null mode unless
    # something else pins it.  Measured on a ground-truth-initialized
    # window with one fixed camera: LM slid the frontier to 0.37x scale
    # while the cost FELL; with the gauge pinned it stayed put.
    # SHIPPED DESIGN: freeze the oldest window keyframe (6 dof), and the
    # second-oldest too when fewer than 4 distant anchors carry real
    # observation mass — with >=4 fixed distant keyframes those already
    # pin scale.  (A soft distance tether to the second-oldest was tried
    # instead of the second freeze and REJECTED: at any weight low enough
    # not to fight real corrections it is dominated by the summed
    # reprojection terms and scale wanders again — measured ring ATE
    # 2.12 m with the tether vs 0.12 m frozen.  The tether slot below is
    # an inert zero-weight pytree placeholder, not an active constraint.)
    fid = jnp.where(win_valid, m.kf_frame_id[win_idx], jnp.int32(2**30))
    order_old = jnp.argsort(fid)
    kf_adjustable = kf_adjustable.at[order_old[0]].set(False)
    weak_anchoring = jnp.sum(fix_valid) < 4
    kf_adjustable = kf_adjustable.at[order_old[1]].set(
        kf_adjustable[order_old[1]] & ~weak_anchoring)
    tethers = {k: jnp.asarray(v) for k, v in empty_tethers(1).items()}

    # --- observation table, landmark-major
    feat_of = ms.feat_index_of_points(m, kf_list)       # (W+WF, L)
    feat_sel = feat_of[:, jnp.clip(mp_list, 0, L - 1)]  # (W+WF, LB)
    obs_valid = (feat_sel >= 0) & kf_list_valid[:, None] \
        & mp_list_valid[None, :]
    M = W + WF
    fclip = jnp.clip(feat_sel, 0, F - 1)
    obs_xn = m.kf_xn[kf_list[:, None], fclip]           # (W+WF, LB, 2)

    problem = BAProblem(
        kf_poses=m.kf_pose[kf_list],
        kf_fixed=~kf_adjustable,
        points=m.mp_pos[jnp.clip(mp_list, 0, L - 1)],
        point_valid=mp_list_valid,
        obs_kf=jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, :], (LB, M)),
        obs_xn=obs_xn.transpose(1, 0, 2),
        obs_valid=obs_valid.T,
        **tethers,
    )
    return LocalBAWindow(problem, kf_list, kf_list_valid, kf_adjustable,
                         mp_list, mp_list_valid)


@jax.jit
def apply_window_result(m: ms.MapState, window: LocalBAWindow,
                        result: BAResult) -> ms.MapState:
    """BA write-back: adjusted window poses + point positions
    (Map::AdjustPosesAndMapPoints under the BundleAdjust*WriteToMap states).
    """
    return ms.apply_ba_update(
        m, window.kf_list, window.kf_adjustable & window.kf_list_valid,
        result.kf_poses, window.mp_list, window.mp_list_valid,
        result.points)


@jax.jit
def unassociate_outliers(m: ms.MapState, window: LocalBAWindow,
                         result: BAResult) -> ms.MapState:
    """Clear associations flagged as BA outliers (the reference feeds
    outlier edges back into unassociation, BundleAdjust.h:202-244)."""
    K, F, L = ms.capacities(m)
    LB, M = result.outliers.shape
    # outlier (l, m): keyframe kf_list[m], feature observing mp_list[l]
    feat_of = ms.feat_index_of_points(m, window.kf_list)   # (M, L)
    feat_sel = feat_of[:, jnp.clip(window.mp_list, 0, L - 1)].T  # (LB, M)
    out = result.outliers & (feat_sel >= 0)
    kf_flat = jnp.broadcast_to(window.kf_list[None, :], (LB, M)).reshape(-1)
    feat_flat = jnp.where(out, feat_sel, F).reshape(-1)
    kf_safe = jnp.where(out.reshape(-1), kf_flat, K)
    assoc = jnp.pad(m.kf_assoc, ((0, 1), (0, 1)), constant_values=-1)
    assoc = assoc.at[kf_safe, feat_flat].set(-1)[:K, :F]
    return m._replace(kf_assoc=assoc)


def ba_error_px(result: BAResult, fx: float) -> float:
    return float(result.mean_sq_error) * fx * fx
