"""Keyframe-block trajectory sharding with halo exchange (SURVEY.md §7
item 7 / §2.2 sequence-parallel analog; VERDICT r3 missing #5).

``parallel/distributed_ba.py`` shards LANDMARK blocks and replicates all
cameras — the right layout while K <= a few hundred, but each device
still linearizes observations against every camera and the psum carries
the full (K+1)^2 6x6 system.  This module provides the LONG-trajectory
layout ("scaling sequence length" = keyframe count): the trajectory is
partitioned into contiguous keyframe blocks (one per device, frame
order — SLAM covisibility is overwhelmingly local in trajectory order),
landmarks live with the block of their anchoring keyframe, and each
device linearizes ONLY observations whose cameras fall inside its block
plus a HALO of boundary keyframes on each side — the cross-shard
covisibility exchange (the spiritual sibling of ring-attention's
blockwise neighbor exchange).

Per LM step each device reduces its landmark blocks analytically and
builds the camera system restricted to its (B + 2H)-keyframe window;
windows overlap only in halos, so the assembled global camera system is
banded and each observation contributes on exactly one shard (no
double counting).  One psum assembles the band; the reduced solve runs
replicated; back-substitution is local per shard.

Observations whose camera lies OUTSIDE a landmark's window (e.g. a
loop-closure edge spanning half the ring) are masked out of the
distributed problem and counted (``n_dropped_obs``); those long-range
constraints belong to the global-BA / pose-graph path, exactly like the
reference bounds its local-BA windows (ThreadSafeMap.h:157-164).
Tethers are not supported on this path (the plan zeroes them); gauge
fixing is by frozen keyframes as everywhere else.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mageslam_tpu.geometry import se3
from mageslam_tpu.solvers import bundle_adjust as ba
from mageslam_tpu.solvers.bundle_adjust import (BAProblem, BAResult,
                                                empty_tethers)

AXIS = "shard"


class TrajectoryShardPlan(NamedTuple):
    """Static partition of a BAProblem by trajectory blocks."""
    problem: BAProblem         # landmark-reordered, window-LOCAL obs_kf
    land_perm: jnp.ndarray     # (L,) original landmark id per new slot, -1 pad
    block_start: jnp.ndarray   # (n,) first keyframe of each block window
    n_dropped_obs: jnp.ndarray  # observations outside any window
    n_dropped_points: jnp.ndarray  # landmarks beyond a block's capacity


class LongRangeTethers(NamedTuple):
    """Replicated relative-pose constraints standing in for the
    observations the block windows drop (loop seams): for each strongly
    covisible keyframe pair too far apart in trajectory order for any
    window, a SIX_DOF tether at the CURRENT relative pose, weighted by
    the shared-observation count it replaces.  Because the psum-assembled
    camera system is solved densely, these off-band couplings are
    structurally free (solvers/bundle_adjust.tether_normal_contrib)."""
    i: jnp.ndarray       # (T,) int32 temporal keyframe index
    j: jnp.ndarray       # (T,) int32
    ttype: jnp.ndarray   # (T,) int32 (0 = disabled slot)
    pose: jnp.ndarray    # (T, 7) target relative pose T_i * T_j^-1
    dist: jnp.ndarray    # (T,)
    weight: jnp.ndarray  # (T,)
    n_pairs: jnp.ndarray  # () live tether count (diagnostic)


def plan_trajectory_shards(problem: BAProblem, n_shards: int,
                           halo: int) -> TrajectoryShardPlan:
    """Reorder landmarks by anchor block and localize obs_kf indices.

      - block b owns keyframes [b*B, (b+1)*B); its WINDOW spans
        [b*B - halo, b*B - halo + B + 2*halo) clipped into [0, K).
      - a landmark is anchored at its first valid observation's keyframe
        and binned to that block; blocks are padded to L/n_shards slots.
      - obs_kf is rewritten window-local; out-of-window observations are
        invalidated and counted.
    """
    K = problem.kf_poses.shape[0]
    L, M = problem.obs_kf.shape
    assert K % n_shards == 0, (K, n_shards)
    assert L % n_shards == 0, (L, n_shards)
    B = K // n_shards
    W = min(B + 2 * halo, K)
    per = L // n_shards

    first_obs = jnp.argmax(problem.obs_valid, axis=1)          # (L,)
    anchor = problem.obs_kf[jnp.arange(L), first_obs]
    has_obs = jnp.any(problem.obs_valid, axis=1) & problem.point_valid
    block = jnp.clip(anchor // B, 0, n_shards - 1)
    block = jnp.where(has_obs, block, n_shards - 1)

    order = jnp.argsort(block * (L + 1) + jnp.arange(L))       # stable
    blk_sorted = block[order]
    rank = jnp.arange(L) - jnp.searchsorted(blk_sorted, blk_sorted)
    keep = rank < per
    slot = blk_sorted * per + jnp.clip(rank, 0, per - 1)
    land_perm = jnp.full(L + 1, -1, jnp.int32)
    land_perm = land_perm.at[jnp.where(keep, slot, L)].set(
        jnp.where(keep, order, -1).astype(jnp.int32))[:L]
    src = jnp.clip(land_perm, 0, L - 1)
    sel_ok = land_perm >= 0
    n_dropped_points = jnp.sum(has_obs) - jnp.sum(sel_ok & has_obs[src])

    start = jnp.clip(jnp.arange(n_shards) * B - halo, 0, K - W)
    my_block = jnp.arange(L) // per                            # (L,)
    my_start = start[my_block]
    obs_kf_g = problem.obs_kf[src]
    local = obs_kf_g - my_start[:, None]
    in_win = (local >= 0) & (local < W)
    obs_valid = problem.obs_valid[src] \
        & problem.point_valid[src][:, None] & sel_ok[:, None]
    n_dropped = jnp.sum(obs_valid & ~in_win)
    obs_valid &= in_win

    new_problem = problem._replace(
        points=problem.points[src],
        point_valid=problem.point_valid[src] & sel_ok,
        obs_kf=jnp.clip(local, 0, W - 1).astype(jnp.int32),
        obs_xn=problem.obs_xn[src],
        obs_valid=obs_valid,
        **{k: jnp.asarray(v) for k, v in empty_tethers(1).items()},
    )
    return TrajectoryShardPlan(new_problem, land_perm,
                               start.astype(jnp.int32), n_dropped,
                               n_dropped_points)


def empty_long_range_tethers(t: int = 1) -> LongRangeTethers:
    return LongRangeTethers(
        i=jnp.zeros(t, jnp.int32), j=jnp.zeros(t, jnp.int32),
        ttype=jnp.zeros(t, jnp.int32),
        pose=jnp.tile(se3.pose_identity()[None], (t, 1)),
        dist=jnp.zeros(t, jnp.float32), weight=jnp.zeros(t, jnp.float32),
        n_pairs=jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("mesh", "num_steps", "halo"))
def trajectory_block_bundle_adjust(plan: TrajectoryShardPlan,
                                   huber_delta, max_outlier_error,
                                   mesh: Mesh, halo: int,
                                   num_steps: int = 5,
                                   lam0=1e-4,
                                   tethers: LongRangeTethers | None = None
                                   ) -> BAResult:
    """LM-BA over trajectory blocks: landmark AND camera-window
    linearization sharded; banded camera system assembled by one psum per
    iteration; replicated banded solve; local back-substitution.

    Returns a BAResult in the PLAN's landmark order (scatter back with
    plan.land_perm)."""
    problem = plan.problem
    K = problem.kf_poses.shape[0]
    n = mesh.devices.size
    B = K // n
    W = min(B + 2 * halo, K)
    if tethers is None:
        tethers = empty_long_range_tethers(1)

    def body(pr, starts, teth, hd, moe, l0):
        start = starts[0]

        def window(poses):
            return jax.lax.dynamic_slice(poses, (start, 0), (W, 7))

        local_pr = pr    # obs_kf already window-local per landmark block

        def gerr(poses_full, points):
            e, _ = ba._error(local_pr, window(poses_full), points, hd,
                             axis_name=AXIS)
            # long-range tether cost: replicated, identical on every
            # shard (the psum above already summed the sharded terms)
            e_t = ba.tether_error(poses_full, teth.i, teth.j, teth.ttype,
                                  teth.pose, teth.dist, teth.weight)
            return e + e_t

        def lm_step(carry, _):
            poses, points, lam, _prev = carry
            err0 = gerr(poses, points)
            pw = window(poses)
            S, b, V_inv, Wb, g_p, kf_safe = ba._build_normal_eq(
                local_pr, pw, points, hd, lam)
            # scatter the (W+1)^2 window system into the global banded
            # (K+1)^2 system (scratch row W of the window is dropped —
            # global row K stays the scratch row) and assemble via psum:
            # this is the halo exchange — overlapping windows add their
            # DISTINCT landmarks' contributions to shared boundary
            # cameras
            SG = jnp.zeros((K + 1, K + 1, 6, 6), S.dtype)
            SG = jax.lax.dynamic_update_slice(SG, S[:W, :W],
                                              (start, start, 0, 0))
            bG = jnp.zeros((K + 1, 6), b.dtype)
            bG = jax.lax.dynamic_update_slice(bG, b[:W], (start, 0))
            SG = jax.lax.psum(SG, AXIS)
            bG = jax.lax.psum(bG, AXIS)
            # long-range tether injection AFTER the psum (replicated,
            # added identically on every shard): the loop-seam couplings
            # the block windows dropped re-enter the dense global solve
            # as off-band blocks — structurally free here
            S_t, b_t = ba.tether_normal_contrib(
                poses, teth.i, teth.j, teth.ttype, teth.pose, teth.dist,
                teth.weight)
            SG = SG + S_t
            bG = bG + b_t
            dxK = ba._solve_schur(SG, bG, pr.kf_fixed, lam)    # (K, 6)
            new_poses = jax.vmap(se3.pose_retract)(poses, dxK)
            dc_w = jax.lax.dynamic_slice(dxK, (start, 0), (W, 6))
            dc_pad = jnp.concatenate([dc_w, jnp.zeros((1, 6))], 0)
            Wtdc = jnp.einsum("lmbc,lmb->lc", Wb, dc_pad[kf_safe])
            dp = jnp.einsum("lbc,lc->lb", V_inv, g_p - Wtdc)
            new_points = points + dp * pr.point_valid[:, None]
            err1 = gerr(new_poses, new_points)
            accept = err1 < err0
            poses = jnp.where(accept, new_poses, poses)
            points = jnp.where(accept, new_points, points)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-7, 1e3)
            return (poses, points, lam,
                    jnp.where(accept, err1, err0)), None

        init = (pr.kf_poses, pr.points, jnp.asarray(l0, jnp.float32),
                jnp.asarray(jnp.inf, jnp.float32))
        (poses, points, lam, _), _ = jax.lax.scan(lm_step, init, None,
                                                  length=num_steps)

        r, good, _ = ba._residuals(local_pr, window(poses), points)
        errs = jnp.sum(r * r, -1)
        outliers = good & (errs > moe ** 2)
        inl = good & ~outliers
        n_inl = jax.lax.psum(jnp.sum(inl), AXIS)
        sum_err = jax.lax.psum(jnp.sum(jnp.where(inl, errs, 0.0)), AXIS)
        mse = sum_err / jnp.maximum(n_inl, 1)
        return BAResult(poses, points, mse, lam, outliers, n_inl)

    lp, rp = P(AXIS), P()
    in_specs = (
        BAProblem(
            kf_poses=rp, kf_fixed=rp,
            points=lp, point_valid=lp,
            obs_kf=lp, obs_xn=lp, obs_valid=lp,
            tether_i=rp, tether_j=rp, tether_type=rp,
            tether_pose=rp, tether_dist=rp, tether_weight=rp,
        ), lp,
        LongRangeTethers(i=rp, j=rp, ttype=rp, pose=rp, dist=rp,
                         weight=rp, n_pairs=rp),
        rp, rp, rp)
    out_specs = BAResult(kf_poses=rp, points=lp, mean_sq_error=rp,
                         lam=rp, outliers=lp, num_inlier_obs=rp)
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)

    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        import numpy as np
        if jax.process_count() > 1:
            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, s, lambda idx, xnp=xnp: xnp[idx])
        return jax.device_put(x, s)

    pr = BAProblem(**{
        f: put(getattr(problem, f),
               sharded if f in ("points", "point_valid", "obs_kf",
                                "obs_xn", "obs_valid") else repl)
        for f in BAProblem._fields})
    starts = put(plan.block_start, sharded)
    teth = jax.tree.map(lambda x: put(x, repl), tethers)
    return fn(pr, starts, teth, jnp.asarray(huber_delta, jnp.float32),
              jnp.asarray(max_outlier_error, jnp.float32),
              jnp.asarray(lam0, jnp.float32))


# ---------------------------------------------------------------------------
# Engine wiring: MapState -> plan -> sharded solve -> MapState
# (VERDICT r4 #5: the solver existed but was reachable from no engine path)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_shards", "halo",
                                             "max_obs_per_point",
                                             "max_tethers"))
def plan_from_map(m, n_shards: int, halo: int,
                  max_obs_per_point: int = 12, max_tethers: int = 64,
                  min_covis: int = 8, tether_weight_scale: float = 1.0):
    """Build a trajectory-sharded plan from a REAL engine MapState.

    Keyframe slots recycle out of temporal order after culling
    (ThreadSafeMap.cpp:1049-1130 churn), so the trajectory blocks are
    formed over a TEMPORAL permutation of the slots (order by
    kf_frame_id; dead slots sort last and pad the final block).  Strongly
    covisible keyframe pairs too far apart in trajectory order for any
    window — the loop seams whose observations the windows drop — become
    replicated SIX_DOF tethers at their current relative pose, weighted
    by the shared-observation count they replace.

    Returns (plan, tethers, perm) where ``perm[new_temporal_idx] =
    original_slot`` (use with apply_plan_result)."""
    from mageslam_tpu.mapping.global_ba import build_global_problem
    from mageslam_tpu.mapstore import map_state as ms
    from mageslam_tpu.solvers.bundle_adjust import TETHER_SIX_DOF

    win = build_global_problem(m, max_obs_per_point)
    problem = win.problem
    K = problem.kf_poses.shape[0]
    fidkey = jnp.where(m.kf_valid, m.kf_frame_id, jnp.int32(2 ** 30))
    perm = jnp.argsort(fidkey).astype(jnp.int32)
    inv = jnp.zeros(K, jnp.int32).at[perm].set(
        jnp.arange(K, dtype=jnp.int32))
    problem_t = problem._replace(
        kf_poses=problem.kf_poses[perm],
        kf_fixed=problem.kf_fixed[perm],
        obs_kf=inv[problem.obs_kf])
    plan = plan_trajectory_shards(problem_t, n_shards, halo)

    B = K // n_shards
    W = min(B + 2 * halo, K)
    cov = ms.covisibility(m)[perm][:, perm]
    validT = m.kf_valid[perm]
    ii = jnp.arange(K)
    far = (ii[None, :] - ii[:, None]) >= W          # strictly out-of-window
    wmat = jnp.where(far & validT[:, None] & validT[None, :], cov, 0)
    vals, idx = jax.lax.top_k(wmat.reshape(-1), max_tethers)
    ti = (idx // K).astype(jnp.int32)
    tj = (idx % K).astype(jnp.int32)
    live = vals >= min_covis
    kfT = problem_t.kf_poses
    rel = jax.vmap(lambda a, b: se3.pose_compose(
        kfT[a], se3.pose_inverse(kfT[b])))(ti, tj)
    tethers = LongRangeTethers(
        i=jnp.where(live, ti, 0), j=jnp.where(live, tj, 0),
        ttype=jnp.where(live, TETHER_SIX_DOF, 0).astype(jnp.int32),
        pose=rel, dist=jnp.zeros(max_tethers, jnp.float32),
        weight=jnp.where(live, vals.astype(jnp.float32)
                         * tether_weight_scale, 0.0),
        n_pairs=jnp.sum(live).astype(jnp.int32))
    return plan, tethers, perm


@jax.jit
def apply_plan_result(m, plan: TrajectoryShardPlan, res: BAResult,
                      perm: jnp.ndarray):
    """Scatter a trajectory-sharded BAResult back into the MapState:
    poses leave temporal order via ``perm``; points leave the plan's
    landmark order via ``plan.land_perm``."""
    from mageslam_tpu.mapstore import map_state as ms
    K = perm.shape[0]
    inv = jnp.zeros(K, jnp.int32).at[perm].set(
        jnp.arange(K, dtype=jnp.int32))
    poses_old = res.kf_poses[inv]                  # per original slot
    L = plan.land_perm.shape[0]
    mp_ok = (plan.land_perm >= 0) & plan.problem.point_valid
    return ms.apply_ba_update(
        m, jnp.arange(K, dtype=jnp.int32), m.kf_valid, poses_old,
        jnp.clip(plan.land_perm, 0, L - 1), mp_ok, res.points)


def trajectory_sharded_global_ba(m, settings, fx: float, mesh: Mesh,
                                 num_steps: int = 10, lam0=1e-4):
    """Settings-shaped engine entry: plan + solve + write back.  Returns
    (map, BAResult, info dict).  Used by
    mapping.global_ba.engine_global_bundle_adjust when
    ParallelSettings.use_trajectory_sharding is on and the keyframe count
    clears the threshold (SURVEY.md §7 item 7 — long-trajectory scaling;
    the analog of the reference's bounded local-BA windows,
    ThreadSafeMap.h:157-164, at pod scale)."""
    px = 1.0 / fx
    p = settings.parallel
    n = mesh.devices.size
    plan, tethers, perm = plan_from_map(
        m, n, int(p.trajectory_halo),
        max_tethers=int(p.trajectory_max_tethers),
        min_covis=int(p.trajectory_tether_min_covis))
    res = trajectory_block_bundle_adjust(
        plan, jnp.float32(settings.bundle_adjust.huber_width * px),
        jnp.float32(settings.graph_optimization.max_outlier_error * px),
        mesh, int(p.trajectory_halo), num_steps=num_steps, lam0=lam0,
        tethers=tethers)
    import numpy as np
    from mageslam_tpu.parallel.distributed_ba import replicated_host_copy
    poses_h = jnp.asarray(replicated_host_copy(res.kf_poses, mesh))
    points_h = jnp.asarray(replicated_host_copy(res.points, mesh))
    m2 = apply_plan_result(m, plan, res._replace(kf_poses=poses_h,
                                                 points=points_h), perm)
    info = {
        "n_dropped_obs": int(plan.n_dropped_obs),
        "n_dropped_points": int(plan.n_dropped_points),
        "n_tethers": int(tethers.n_pairs),
        "n_shards": n,
    }
    return m2, res, info
