"""Sim(3) similarity transforms for monocular loop closure.

The reference computes a similarity (rotation + translation + scale) between
the current covisible set and the relocalized loop frame and moves keyframes
by it (Tasks/LoopClosureWorker.cpp:300-375), and ships (but never calls) a
g2o Sim3 pose-graph optimizer (Dependencies/BundlerLib/Include/
PoseGraphOptimizer.h:18-65).  Here Sim3 is an 8-vector
``[qw qx qy qz tx ty tz s]`` acting as ``x -> s * R x + t``.
"""

from __future__ import annotations

import jax.numpy as jnp

from mageslam_tpu.geometry import se3


def sim3_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0, 1.0], dtype=dtype)


def make_sim3(q, t, s) -> jnp.ndarray:
    s = jnp.asarray(s, dtype=q.dtype)
    if s.ndim < q[..., :1].ndim:
        s = jnp.broadcast_to(s[..., None], q[..., :1].shape)
    return jnp.concatenate([se3.quat_normalize(q), t, s], axis=-1)


def sim3_q(g):
    return g[..., :4]


def sim3_t(g):
    return g[..., 4:7]


def sim3_s(g):
    return g[..., 7:8]


def sim3_apply(g, x):
    return sim3_s(g) * se3.quat_rotate(sim3_q(g), x) + sim3_t(g)


def sim3_compose(a, b):
    """(a*b)(x) = a(b(x))."""
    q = se3.quat_mul(sim3_q(a), sim3_q(b))
    t = sim3_s(a) * se3.quat_rotate(sim3_q(a), sim3_t(b)) + sim3_t(a)
    return make_sim3(q, t, (sim3_s(a) * sim3_s(b))[..., 0])


def sim3_inverse(g):
    qi = se3.quat_conj(sim3_q(g))
    si = 1.0 / sim3_s(g)
    t = -si * se3.quat_rotate(qi, sim3_t(g))
    return make_sim3(qi, t, si[..., 0])


def sim3_from_se3(p, s=1.0):
    return make_sim3(se3.pose_q(p), se3.pose_t(p),
                     jnp.asarray(s, dtype=p.dtype))


def se3_from_sim3(g):
    """Drop scale (keep rotation+translation)."""
    return se3.make_pose(sim3_q(g), sim3_t(g))


def sim3_retract(g, xi):
    """Left update Exp(xi) * g, xi = [omega(3), upsilon(3), sigma(1)]."""
    dq = se3.so3_exp(xi[..., :3])
    ds = jnp.exp(xi[..., 6:7])
    q = se3.quat_mul(dq, sim3_q(g))
    t = ds * se3.quat_rotate(dq, sim3_t(g)) + xi[..., 3:6]
    return make_sim3(q, t, (ds * sim3_s(g))[..., 0])


def sim3_log(g):
    """Decoupled chart log: [so3_log(q), t, log(s)]."""
    return jnp.concatenate(
        [se3.so3_log(sim3_q(g)), sim3_t(g), jnp.log(sim3_s(g))], axis=-1)


def umeyama_alignment(src: jnp.ndarray, dst: jnp.ndarray,
                      weights: jnp.ndarray | None = None,
                      with_scale: bool = True):
    """Closed-form Sim3 aligning src -> dst point sets (Umeyama 1991).

    Used for loop-closure similarity estimation and for Sim3-aligned ATE
    evaluation (monocular scale-free trajectory error).  Returns an 8-vector
    sim3 g with dst ≈ g(src).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(w[..., None] * src, axis=-2)
    mu_d = jnp.sum(w[..., None] * dst, axis=-2)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (w[..., None] * dc).swapaxes(-1, -2) @ sc  # (3,3)
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=src.dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    s = jnp.where(with_scale,
                  jnp.trace(jnp.diag(S) @ D) / jnp.maximum(var_s, 1e-12),
                  1.0).astype(src.dtype)
    t = mu_d - s * (R @ mu_s)
    return make_sim3(se3.mat_to_quat(R), t, s)
