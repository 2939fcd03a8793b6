"""Levenberg-Marquardt bundle adjustment with sparse Schur complement.

First-class JAX replacement for the reference's g2o backend
(Dependencies/BundlerLib/Source/BundlerLib.cpp:174-190:
OptimizationAlgorithmLevenberg over BlockSolver_6_3, Huber kernels,
settable/readable LM lambda) and its orchestration
(Core BundleAdjustment/BundleAdjust.h:42-244: AdjustableData, stepwise
IterateBundleAdjust with outlier tracking, tether constraints Data/Tether.h).

TPU-first design:
  - Landmark-major fixed-shape problem: observations live in an (L, M) table
    (landmark x observing-keyframe slot).  This makes the Schur trick a set
    of dense einsums + scatter-adds instead of sparse graph traversal.
  - Schur complement: landmark blocks are reduced analytically
    (V^-1 in closed form per 3x3 block) and the camera system
    S = U - W V^-1 W^T is assembled by chunked scatter-add, then solved
    densely — cameras are few (<=256), so a (6K, 6K) solve is MXU food.
  - LM with accept/reject steps and a persisted lambda in/out (the
    reference's PersistLambda trick, Tasks/MappingWorker.cpp:268-286).
  - Tether constraints (DISTANCE / SIX_DOF / EXTRINSIC, Data/Tether.h:12-35)
    are extra residual blocks whose Jacobians come from autodiff (they are
    few; reprojection Jacobians are analytic).
  - Fixed keyframes (the local-BA "distant keyframe" anchors,
    Map/ThreadSafeMap.h:157-164) are handled by zeroing their rows/columns.

All coordinates are *normalized undistorted* image coords; thresholds are
converted from pixels by the caller (divide by focal length).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3
from mageslam_tpu.solvers.pnp import huber_weights

TETHER_NONE = 0
TETHER_DISTANCE = 1   # keep |C_i - C_j| at a target distance
TETHER_SIX_DOF = 2    # keep relative pose T_i * T_j^-1 at a target
TETHER_EXTRINSIC = 3  # hard stereo extrinsic (same math as SIX_DOF, high w)


class BAProblem(NamedTuple):
    """Fixed-shape BA problem (analog of AdjustableData, BundleAdjust.h:42-56).

    K keyframes, L landmarks, M observation slots per landmark,
    T tether slots.
    """

    kf_poses: jnp.ndarray     # (K, 7) view poses
    kf_fixed: jnp.ndarray     # (K,) bool — anchored (distant) keyframes
    points: jnp.ndarray       # (L, 3)
    point_valid: jnp.ndarray  # (L,) bool
    obs_kf: jnp.ndarray       # (L, M) int32 keyframe index per slot
    obs_xn: jnp.ndarray       # (L, M, 2) normalized measurements
    obs_valid: jnp.ndarray    # (L, M) bool
    tether_i: jnp.ndarray     # (T,) int32
    tether_j: jnp.ndarray     # (T,) int32
    tether_type: jnp.ndarray  # (T,) int32 TETHER_*
    tether_pose: jnp.ndarray  # (T, 7) target relative pose (SIX_DOF/EXTRINSIC)
    tether_dist: jnp.ndarray  # (T,) target distance (DISTANCE)
    tether_weight: jnp.ndarray  # (T,) float32


def empty_tethers(t: int = 0):
    return dict(
        tether_i=jnp.zeros((t,), jnp.int32),
        tether_j=jnp.zeros((t,), jnp.int32),
        tether_type=jnp.zeros((t,), jnp.int32),
        tether_pose=jnp.tile(se3.pose_identity()[None], (t, 1)) if t else
        jnp.zeros((t, 7), jnp.float32),
        tether_dist=jnp.zeros((t,), jnp.float32),
        tether_weight=jnp.zeros((t,), jnp.float32),
    )


class BAResult(NamedTuple):
    kf_poses: jnp.ndarray
    points: jnp.ndarray
    mean_sq_error: jnp.ndarray   # over inlier obs, normalized units
    lam: jnp.ndarray             # final LM lambda (persistable)
    outliers: jnp.ndarray        # (L, M) bool obs flagged as outliers
    num_inlier_obs: jnp.ndarray


# ---------------------------------------------------------------------------


def _project_obs(kf_poses, points, obs_kf):
    """Residual geometry for every (landmark, slot) pair.

    Returns xn (L, M, 2), z (L, M), cam-frame points y (L, M, 3), R (L,M,3,3).
    """
    poses = kf_poses[obs_kf]                     # (L, M, 7)
    y = se3.pose_apply(poses, points[:, None, :])
    z = y[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = y[..., :2] / zs[..., None]
    return xn, z, y, poses


def _residuals(problem: BAProblem, kf_poses, points):
    xn, z, _, _ = _project_obs(kf_poses, points, problem.obs_kf)
    r = xn - problem.obs_xn
    good = problem.obs_valid & problem.point_valid[:, None] & (z > 0)
    return r, good, z


def _tether_residual(pose_i, pose_j, ttype, target_pose, target_dist):
    """Stacked 6-vector tether residual (DISTANCE uses 1 dim, rest zero)."""
    rel = se3.pose_compose(pose_i, se3.pose_inverse(pose_j))
    r6 = se3.pose_log(se3.pose_compose(rel, se3.pose_inverse(target_pose)))
    ci = se3.camera_center(pose_i)
    cj = se3.camera_center(pose_j)
    rd = jnp.linalg.norm(ci - cj + 1e-12) - target_dist
    is_dist = (ttype == TETHER_DISTANCE)
    r = jnp.where(is_dist,
                  jnp.concatenate([rd[None], jnp.zeros(5)]),
                  r6)
    return jnp.where(ttype == TETHER_NONE, jnp.zeros(6), r)


def _error(problem, kf_poses, points, huber_delta, axis_name=None):
    r, good, z = _residuals(problem, kf_poses, points)
    err = jnp.sum(r * r, -1)
    # robustified error (Huber rho), like g2o's active chi2
    d2 = huber_delta ** 2
    rho = jnp.where(err <= d2, err,
                    2.0 * huber_delta * jnp.sqrt(jnp.maximum(err, d2)) - d2)
    e = jnp.sum(jnp.where(good, rho, 0.0))
    # cheirality penalty: an observation whose point moves behind its
    # camera must NOT silently leave the cost — without this, LM
    # discovers that collapsing frontier geometry "deletes" residuals
    # (z<=0 drops out of `good`) and monotonically shrinks map scale
    # while the reported error falls.  Measured on a ground-truth-
    # initialized window: cameras walked 0.19 units away from truth and
    # the frontier step collapsed to 0.39x in 80 accepted steps.  A flat
    # 1.0 (normalized-units^2) per lost observation makes such steps
    # strictly unprofitable; genuinely-bad observations still get
    # classified as outliers at the end.  (z reused from _residuals — no
    # second projection pass.)
    behind = problem.obs_valid & problem.point_valid[:, None] & (z <= 0)
    e = e + jnp.sum(behind.astype(jnp.float32))

    def one_tether(i, j, tt, tp, td, w):
        rt = _tether_residual(kf_poses[i], kf_poses[j], tt, tp, td)
        return w * jnp.sum(rt * rt)

    e_t = jnp.sum(jax.vmap(one_tether)(
        problem.tether_i, problem.tether_j, problem.tether_type,
        problem.tether_pose, problem.tether_dist, problem.tether_weight))
    if axis_name is not None:
        # landmarks are sharded; tethers are replicated — count them once
        e_t = e_t / jax.lax.psum(1, axis_name)
        return jax.lax.psum(e + e_t, axis_name), good
    return e + e_t, good


def _inv3x3(V):
    """Batched closed-form 3x3 inverse with determinant clamp."""
    a = V[..., 0, 0]; b = V[..., 0, 1]; c = V[..., 0, 2]
    d = V[..., 1, 0]; e = V[..., 1, 1]; f = V[..., 1, 2]
    g = V[..., 2, 0]; h = V[..., 2, 1]; i = V[..., 2, 2]
    A = e * i - f * h; B = c * h - b * i; C = b * f - c * e
    D = f * g - d * i; E = a * i - c * g; F = c * d - a * f
    G = d * h - e * g; H = b * g - a * h; I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([A, B, C, D, E, F, G, H, I], -1) / det[..., None]
    return inv.reshape(V.shape)


def tether_normal_contrib(kf_poses, tether_i, tether_j, tether_type,
                          tether_pose, tether_dist, tether_weight):
    """Normal-equation contributions of tether constraints against the
    FULL camera table: (S_t (K+1, K+1, 6, 6), b_t (K+1, 6)); row K is the
    scratch row for disabled (type 0) slots.  Shared by the in-problem
    tether path (_build_normal_eq) and the trajectory-sharded global BA's
    long-range tether injection (parallel/trajectory_sharding.py), where
    tether blocks are added to the psum-assembled global system — the
    dense solve makes off-band long-range couplings structurally free."""
    K = kf_poses.shape[0]

    def tether_blocks(i, j, tt, tp, td, tw):
        def rfun(xi):
            pi = se3.pose_retract(kf_poses[i], xi[:6])
            pj = se3.pose_retract(kf_poses[j], xi[6:])
            return _tether_residual(pi, pj, tt, tp, td)
        xi0 = jnp.zeros(12)
        Jt = jax.jacfwd(rfun)(xi0)      # (6, 12)
        rt = rfun(xi0)
        sw = jnp.sqrt(tw)
        return Jt[:, :6] * sw, Jt[:, 6:] * sw, rt * sw

    Ji, Jj, rt = jax.vmap(tether_blocks)(
        tether_i, tether_j, tether_type, tether_pose, tether_dist,
        tether_weight)
    ti = jnp.where(tether_type > 0, tether_i, K)
    tj = jnp.where(tether_type > 0, tether_j, K)
    S = jnp.zeros((K + 1, K + 1, 6, 6))
    S = S.at[ti, ti].add(jnp.einsum("tab,tac->tbc", Ji, Ji))
    S = S.at[tj, tj].add(jnp.einsum("tab,tac->tbc", Jj, Jj))
    S = S.at[ti, tj].add(jnp.einsum("tab,tac->tbc", Ji, Jj))
    S = S.at[tj, ti].add(jnp.einsum("tab,tac->tbc", Jj, Ji))
    b = jnp.zeros((K + 1, 6))
    b = b.at[ti].add(-jnp.einsum("tab,ta->tb", Ji, rt))
    b = b.at[tj].add(-jnp.einsum("tab,ta->tb", Jj, rt))
    return S, b


def tether_error(kf_poses, tether_i, tether_j, tether_type, tether_pose,
                 tether_dist, tether_weight):
    """Summed weighted squared tether residual (the _error tether term,
    exposed for solvers that keep tethers outside their BAProblem)."""
    def one(i, j, tt, tp, td, w):
        rt = _tether_residual(kf_poses[i], kf_poses[j], tt, tp, td)
        return w * jnp.sum(rt * rt)
    return jnp.sum(jax.vmap(one)(tether_i, tether_j, tether_type,
                                 tether_pose, tether_dist, tether_weight))


def _build_normal_eq(problem: BAProblem, kf_poses, points, huber_delta,
                     lam, axis_name=None):
    """One linearization: returns (S, b, V_inv, W, g_p, obs_w) where
    S (K+1, K+1, 6, 6) is the damped Schur-complement camera system,
    b (K+1, 6) its rhs (scratch row K holds invalid contributions)."""
    K = kf_poses.shape[0]
    L, M = problem.obs_kf.shape

    r, good, _ = _residuals(problem, kf_poses, points)
    xn, z, y, poses = _project_obs(kf_poses, points, problem.obs_kf)
    rn = jnp.linalg.norm(r, axis=-1)
    w = huber_weights(rn, huber_delta) * good          # (L, M)

    # Jacobians (weighted)
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    dpi = jnp.stack([
        jnp.stack([iz, zero, -y[..., 0] * iz2], -1),
        jnp.stack([zero, iz, -y[..., 1] * iz2], -1),
    ], -2)                                              # (L, M, 2, 3)
    hy = se3.hat(y)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), hy.shape)
    A = dpi @ jnp.concatenate([-hy, eye3], -1)          # (L, M, 2, 6)
    Rm = se3.quat_to_mat(se3.pose_q(poses))             # (L, M, 3, 3)
    B = dpi @ Rm                                        # (L, M, 2, 3)
    A = A * w[..., None, None]
    B = B * w[..., None, None]
    rw = r * w[..., None]

    # landmark blocks
    V = jnp.einsum("lmab,lmac->lbc", B, B)              # (L, 3, 3)
    g_p = -jnp.einsum("lmab,lma->lb", B, rw)            # (L, 3)
    # LM damping on the landmark diagonal + floor for unobserved points
    V = V + jax.vmap(jnp.diag)(
        lam * jnp.diagonal(V, axis1=-2, axis2=-1) + 1e-8)
    V_inv = _inv3x3(V)

    W = jnp.einsum("lmab,lmac->lmbc", A, B)             # (L, M, 6, 3)
    Y = jnp.einsum("lmbc,lcd->lmbd", W, V_inv)          # (L, M, 6, 3)

    # camera blocks: route each observation slot to its keyframe with a
    # one-hot matrix so ALL assembly is einsum (MXU) instead of scatter-add
    # (TPU scatters serialize; this was the local-BA hot spot).  HIGHEST
    # precision keeps f32 accumulation exact for the normal equations.
    HI = jax.lax.Precision.HIGHEST
    kf_safe = jnp.where(good, problem.obs_kf, K)
    O = jax.nn.one_hot(kf_safe, K + 1, dtype=A.dtype)   # (L, M, K+1)
    AA = jnp.einsum("lmab,lmac->lmbc", A, A)
    U = jnp.einsum("lmk,lmbc->kbc", O, AA, precision=HI)
    Ar = jnp.einsum("lmab,lma->lmb", A, rw)
    g_c = -jnp.einsum("lmk,lmb->kb", O, Ar, precision=HI)

    # tether contributions via autodiff (few, 6-dim residuals)
    tw = problem.tether_weight
    if axis_name is not None:
        # replicated tether blocks will be psummed with the sharded landmark
        # contributions; pre-scale the weight so they count once (the
        # normal-equation blocks are linear in the weight)
        tw = tw / jnp.float32(jax.lax.psum(1, axis_name))
    S_t, b_t = tether_normal_contrib(
        kf_poses, problem.tether_i, problem.tether_j, problem.tether_type,
        problem.tether_pose, problem.tether_dist, tw)

    # Schur assembly: S = U + tethers - sum_l Y W^T (camera-camera coupling)
    S = S_t
    S = S.at[jnp.arange(K + 1), jnp.arange(K + 1)].add(U)
    b = g_c + b_t

    # camera-camera coupling S -= sum_l Y_l W_l^T, routed through the same
    # one-hot: per-landmark keyframe-major blocks then one big contraction
    # over (landmark, point-dim) — pure MXU, no (L, M, M, 6, 6) intermediate
    # and no scatter
    Yk = jnp.einsum("lmk,lmab->lkab", O, Y, precision=HI)  # (L, K+1, 6, 3)
    Wk = jnp.einsum("lmk,lmab->lkab", O, W, precision=HI)
    S = S - jnp.einsum("lkab,lqcb->kqac", Yk, Wk, precision=HI)
    b = b - jnp.einsum("lkab,lb->ka", Yk, g_p, precision=HI)

    if axis_name is not None:
        # collective Schur reduction: sum partial camera systems over the
        # landmark shards (SURVEY.md §2.2 distributed-BA design — this is
        # the psum riding ICI)
        S = jax.lax.psum(S, axis_name)
        b = jax.lax.psum(b, axis_name)

    return S, b, V_inv, W, g_p, kf_safe


def _solve_schur(S, b, kf_fixed, lam):
    """Dense damped solve of the camera system with fixed-pose masking."""
    K = kf_fixed.shape[0]
    S = S[:K, :K]
    b = b[:K]
    free = ~kf_fixed
    # zero fixed rows/cols; identity on fixed diagonal
    mask2 = free[:, None] & free[None, :]
    S = S * mask2[:, :, None, None]
    diag = jnp.arange(K)
    # LM damping on the camera diagonal + identity for fixed cams
    damp = lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diagonal)(S[diag, diag]))
    S = S.at[diag, diag].add(damp + 1e-8 * jnp.eye(6))
    S = S.at[diag, diag].add(
        jnp.where(kf_fixed[:, None, None], jnp.eye(6), 0.0))
    b = b * free[:, None]
    Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dx = jnp.linalg.solve(Sd, b.reshape(K * 6))
    return dx.reshape(K, 6) * free[:, None]


def bundle_adjust_impl(problem: BAProblem,
                       huber_delta: jnp.ndarray,
                       max_outlier_error: jnp.ndarray,
                       num_steps: int = 5,
                       lam0: jnp.ndarray | float = 1e-4,
                       axis_name: str | None = None) -> BAResult:
    """Run num_steps LM iterations (analog of BundlerLib
    StepBundleAdjustment, BundlerLib.h:55 — returns mean square error and
    outlier observations; lambda in/out for persistence).

    With axis_name set, the call runs inside shard_map with landmarks
    (L dimension) sharded over that mesh axis: partial camera systems are
    psum-reduced, the dense camera solve is computed identically on every
    shard, and landmark back-substitution stays local.
    """
    lam0 = jnp.asarray(lam0, jnp.float32)

    def lm_step(carry, _):
        poses, points, lam, _prev_err = carry
        err0, _ = _error(problem, poses, points, huber_delta, axis_name)
        S, b, V_inv, W, g_p, kf_safe = _build_normal_eq(
            problem, poses, points, huber_delta, lam, axis_name)
        dc = _solve_schur(S, b, problem.kf_fixed, lam)
        # back-substitute landmarks: dp = V^-1 (g_p - sum_m W^T dc_k)
        dc_pad = jnp.concatenate([dc, jnp.zeros((1, 6))], 0)
        Wtdc = jnp.einsum("lmbc,lmb->lc", W, dc_pad[kf_safe])
        dp = jnp.einsum("lbc,lc->lb", V_inv, g_p - Wtdc)
        dp = dp * problem.point_valid[:, None]

        new_poses = jax.vmap(se3.pose_retract)(poses, dc)
        new_points = points + dp
        err1, _ = _error(problem, new_poses, new_points, huber_delta,
                         axis_name)
        accept = err1 < err0
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-7, 1e3)
        return (poses, points, lam, jnp.where(accept, err1, err0)), None

    init = (problem.kf_poses, problem.points, lam0,
            jnp.asarray(jnp.inf, jnp.float32))
    (poses, points, lam, _), _ = jax.lax.scan(lm_step, init, None,
                                              length=num_steps)

    r, good, _ = _residuals(problem, poses, points)
    err = jnp.sum(r * r, -1)
    outliers = good & (err > max_outlier_error ** 2)
    inl = good & ~outliers
    n_inl = jnp.sum(inl)
    sum_err = jnp.sum(jnp.where(inl, err, 0.0))
    if axis_name is not None:
        n_inl = jax.lax.psum(n_inl, axis_name)
        sum_err = jax.lax.psum(sum_err, axis_name)
    mse = sum_err / jnp.maximum(n_inl, 1)
    return BAResult(poses, points, mse, lam, outliers, n_inl)


bundle_adjust = jax.jit(
    functools.partial(bundle_adjust_impl, axis_name=None),
    static_argnames=("num_steps",))
