"""SE(3) / SO(3) / quaternion math, batch-friendly and jit-safe.

Replaces the reference's ``Data/Pose`` (reference Data/Pose.h:26-90: a cached
view matrix + inverse with quaternion/Rodrigues accessors) and the assorted
cv:: math helpers in Utils/cv.h.  Here a pose is a flat 7-vector
``[qw, qx, qy, qz, tx, ty, tz]`` encoding the **world-to-camera** (view)
transform ``x_cam = R(q) @ x_world + t`` — the same convention the reference
uses for its view matrix.  All functions broadcast over leading batch
dimensions and are differentiable, so solver Jacobians can be had either
analytically (solvers/) or via jax.jacfwd in tests.

Tangent-space convention: ``xi = [omega (3), upsilon (3)]`` with
*left*-multiplicative updates ``T <- Exp(xi) * T``, matching the standard
SLAM retraction used by g2o's SE3 expmap vertices (reference
Dependencies/BundlerLib/Source/BundlerLib.cpp:46-78 uses g2o VertexSE3Expmap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions  (w, x, y, z), scalar-first, unit-norm.
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonical sign: w >= 0 (stabilises tests & interpolation)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  Broadcasts on leading dims."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4).  Branch-free Shepperd's method (jit-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate extractions; pick numerically best via argmax of pivots
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) quaternion.  Taylor-safe near 0."""
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    half = 0.5 * theta
    small = theta_sq < 1e-10
    # sin(x/2)/x  with series fallback
    k = jnp.where(small, 0.5 - theta_sq / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, _EPS))
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * omega], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion -> (..., 3) axis-angle."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(vn < 1e-8, 2.0 / jnp.maximum(w, _EPS),
                  theta / jnp.maximum(vn, _EPS))
    return k * v


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    m = jnp.stack([zero, -oz, oy, oz, zero, -ox, -oy, ox, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Poses — 7-vector [qw qx qy qz tx ty tz], world-to-camera.
# ---------------------------------------------------------------------------

def pose_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def pose_q(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., :4]


def pose_t(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 4:]


def make_pose(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def pose_apply(p: jnp.ndarray, x_world: jnp.ndarray) -> jnp.ndarray:
    """x_cam = R x_world + t.  Broadcasts."""
    return quat_rotate(pose_q(p), x_world) + pose_t(p)


def pose_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a*b)(x) = a(b(x))."""
    q = quat_mul(pose_q(a), pose_q(b))
    t = quat_rotate(pose_q(a), pose_t(b)) + pose_t(a)
    return make_pose(q, t)


def pose_inverse(p: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(pose_q(p))
    return make_pose(qi, -quat_rotate(qi, pose_t(p)))


def pose_relative(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """T_ab = a * b^-1 (maps b's camera frame into a's)."""
    return pose_compose(a, pose_inverse(b))


def pose_to_mat44(p: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 4, 4) homogeneous view matrix."""
    R = quat_to_mat(pose_q(p))
    t = pose_t(p)[..., :, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def mat44_to_pose(m: jnp.ndarray) -> jnp.ndarray:
    return make_pose(mat_to_quat(m[..., :3, :3]), m[..., :3, 3])


def camera_center(p: jnp.ndarray) -> jnp.ndarray:
    """World-frame position of the camera: C = -R^T t."""
    return -quat_rotate(quat_conj(pose_q(p)), pose_t(p))


def pose_retract(p: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update T <- Exp(xi) * T, xi = [omega, upsilon]."""
    dq = so3_exp(xi[..., :3])
    q = quat_mul(dq, pose_q(p))
    t = quat_rotate(dq, pose_t(p)) + xi[..., 3:]
    return make_pose(q, t)


def pose_log(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pose_retract at identity: [so3_log(q), t] (decoupled chart)."""
    return jnp.concatenate([so3_log(pose_q(p)), pose_t(p)], axis=-1)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha) -> jnp.ndarray:
    """Spherical interpolation of unit quaternions (jit-safe)."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    lin = (1 - alpha) * q0 + alpha * q1  # fallback for tiny angles
    w0 = jnp.sin((1 - alpha) * theta) / jnp.maximum(sin_theta, _EPS)
    w1 = jnp.sin(alpha * theta) / jnp.maximum(sin_theta, _EPS)
    out = jnp.where(sin_theta < 1e-6, lin, w0 * q0 + w1 * q1)
    return quat_normalize(out)


def pose_interpolate(a: jnp.ndarray, b: jnp.ndarray, alpha) -> jnp.ndarray:
    """Interpolate between two poses (slerp rotation, lerp translation).

    Parity with the reference's pose interpolation helpers
    (Tracking/PoseEstimator.h:58-76).
    """
    q = slerp(pose_q(a), pose_q(b), alpha)
    t = (1 - alpha) * pose_t(a) + alpha * pose_t(b)
    return make_pose(q, t)


def constant_velocity_extrapolate(prev: jnp.ndarray, cur: jnp.ndarray,
                                  steps: float = 1.0) -> jnp.ndarray:
    """Constant-velocity motion model: predict next view pose.

    next = delta^steps * cur, with delta = cur * prev^-1 — the reference's
    EstimateNextPoseFromHistory (Tracking/PoseEstimator.cpp:84+).
    """
    delta = pose_compose(cur, pose_inverse(prev))
    return pose_compose(_pose_exp_scaled(delta, steps), cur)


def _pose_exp_scaled(delta: jnp.ndarray, s: float) -> jnp.ndarray:
    """delta^s via scaled log/exp on the decoupled chart."""
    omega = so3_log(pose_q(delta)) * s
    t = pose_t(delta) * s
    return make_pose(so3_exp(omega), t)


# Convenience jitted batch converters
pose_to_mat44_batch = jax.jit(jax.vmap(pose_to_mat44))
