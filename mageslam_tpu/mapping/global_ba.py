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

    # gauge: monocular BA has a SEVEN-dof gauge — one fixed pose pins 6,
    # but a similarity about that camera's center preserves every
    # reprojection, so scale is an exact null mode that LM wanders along.
    # SHIPPED DESIGN: freeze the TWO oldest keyframes — their baseline is
    # a hard scale gauge.  (A soft distance tether between the pair was
    # tried instead of the second freeze and REJECTED: at any weight low
    # enough not to fight real corrections it is dominated by the summed
    # reprojection terms and scale wanders again — measured ring ATE
    # 2.12 m with the tether vs 0.12 m frozen; see local_ba.py note.)
    fid = jnp.where(m.kf_valid, m.kf_frame_id, jnp.int32(2**30))
    order_old = jnp.argsort(fid)
    kf_fixed = (~m.kf_valid) | (jnp.arange(K) == order_old[0]) \
        | (jnp.arange(K) == order_old[1])

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


def engine_global_bundle_adjust(m: ms.MapState, settings, fx: float,
                                num_steps: int, lam0,
                                huber_width_px: float | None = None,
                                max_outlier_px: float | None = None):
    """Settings-routed global BA for the engine paths (fossilize, host
    loop closure): distributed over all local devices when
    ParallelSettings.use_distributed_global_ba is on and the device count
    and capacity divisibility allow, single-device otherwise."""
    px = 1.0 / fx
    hd = jnp.float32((huber_width_px if huber_width_px is not None
                      else settings.bundle_adjust.huber_width) * px)
    moe = jnp.float32((max_outlier_px if max_outlier_px is not None
                       else settings.graph_optimization.max_outlier_error)
                      * px)
    p = settings.parallel
    devs = jax.devices()
    K = m.kf_valid.shape[0]
    L = m.mp_valid.shape[0]
    if p.use_trajectory_sharding and len(devs) >= p.min_devices \
            and K % len(devs) == 0 and L % len(devs) == 0 \
            and int(jnp.sum(m.kf_valid)) >= p.trajectory_min_keyframes:
        # long-trajectory layout: keyframe blocks + halo + long-range
        # tether injection (parallel/trajectory_sharding.py)
        from mageslam_tpu.parallel.distributed_ba import make_mesh
        from mageslam_tpu.parallel.trajectory_sharding import \
            trajectory_sharded_global_ba
        m2, res, _ = trajectory_sharded_global_ba(
            m, settings, fx, make_mesh(), num_steps=num_steps, lam0=lam0)
        return m2, res
    if p.use_distributed_global_ba:
        if len(devs) >= p.min_devices and L % len(devs) == 0:
            from mageslam_tpu.parallel.distributed_ba import make_mesh
            return global_bundle_adjust_distributed(
                m, hd, moe, make_mesh(), num_steps=num_steps, lam0=lam0)
    return global_bundle_adjust(m, hd, moe, num_steps=num_steps,
                                lam0=lam0)


def global_ba_to_floor(m: ms.MapState, settings, fx: float, lam0,
                       chunk_steps: int = 10, max_steps: int = 60,
                       rel_tol: float = 0.01):
    """Iterate the engine global BA in chunks until the inlier mean
    square error stops improving (relative gain < ``rel_tol``) or the
    step budget is exhausted — "run the final BA to its error floor".
    The reference budgets 25 steps for the post-closure global BA
    (console.cpp:116-120) and iterates local BA until below threshold
    (MappingWorker.cpp:330-372); a fixed small budget demonstrably
    under-repairs a freshly loop-corrected map (BASELINE.md r4 notes).
    Returns (map, last BAResult)."""
    prev = None
    lam = lam0
    total = 0
    res = None
    while total < max_steps:
        m, res = engine_global_bundle_adjust(m, settings, fx,
                                             num_steps=chunk_steps,
                                             lam0=lam)
        lam = res.lam
        mse = float(res.mean_sq_error)
        total += chunk_steps
        if prev is not None and (prev - mse) <= rel_tol * max(prev, 1e-12):
            break
        prev = mse
    return m, res


def global_bundle_adjust_distributed(m: ms.MapState, huber_delta,
                                     max_outlier_error, mesh,
                                     num_steps: int = 10, lam0=1e-4,
                                     max_obs_per_point: int = 12):
    """Global BA with landmark blocks sharded over a device mesh — the
    engine-wired entry to parallel/distributed_ba.py (SURVEY.md §2.2,
    BASELINE.json config 5).  Fossilize and host loop closure route here
    when ParallelSettings.use_distributed_global_ba is on and the mesh has
    enough devices.  L (map-point capacity) must divide by the shard
    count; capacities are powers of two so this holds by construction."""
    from mageslam_tpu.parallel import distributed_ba as dba
    win = build_global_problem(m, max_obs_per_point)
    L = win.problem.points.shape[0]
    n = mesh.devices.size
    assert L % n == 0, (L, n)
    sp = dba.shard_problem(win.problem, mesh)
    res = dba.distributed_bundle_adjust(
        sp, jnp.asarray(huber_delta, jnp.float32),
        jnp.asarray(max_outlier_error, jnp.float32), mesh,
        num_steps=num_steps, lam0=lam0)
    # Host round-trip keeps the write-back correct in BOTH deployment
    # modes: single-process (mesh fully addressable) and multi-controller
    # (jax.distributed — the sharded points span non-addressable devices,
    # so they are first all-gathered to a replicated layout whose local
    # shard IS the full array on every process).
    points_h = dba.replicated_host_copy(res.points, mesh)
    poses_h = dba.replicated_host_copy(res.kf_poses, mesh)
    m2 = ms.apply_ba_update(m, win.kf_list, win.kf_list_valid,
                            jnp.asarray(poses_h), win.mp_list,
                            win.mp_list_valid, jnp.asarray(points_h))
    return m2, res
