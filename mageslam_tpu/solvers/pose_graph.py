"""Sim(3) pose-graph optimization (essential-graph relaxation).

Equivalent of the reference's PoseGraphOptimizer
(Dependencies/BundlerLib/Include/PoseGraphOptimizer.h:18-65: g2o
VertexSim3Expmap/EdgeSim3) — shipped there but never called from Core
(loop correction uses a global BA instead, LoopClosureWorker.cpp:164-210).
Here it is a first-class solver: monocular loop closure at scale corrects
accumulated scale drift by relaxing the essential graph in Sim(3), then a
global BA polishes (both are available to the loop-closure worker).

Damped Gauss-Newton over per-keyframe Sim3 states; edge residuals
r_ij = log(S_i * S_j^-1 * T_ij^-1), Jacobians by forward-mode autodiff per
edge (edges are few), dense (7K, 7K) solve — keyframe counts are small
enough that the dense system is MXU-friendly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import sim3


class PoseGraphProblem(NamedTuple):
    """K sim3 vertices, E edge slots (invalid edges have weight 0)."""

    states: jnp.ndarray      # (K, 8) sim3 per keyframe (view transforms)
    fixed: jnp.ndarray       # (K,) bool
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_rel: jnp.ndarray    # (E, 8) target S_i * S_j^-1
    edge_weight: jnp.ndarray  # (E,) float32 (0 = inactive slot)


class PoseGraphResult(NamedTuple):
    states: jnp.ndarray
    final_error: jnp.ndarray


def edge_residual(si, sj, rel):
    return sim3.sim3_log(
        sim3.sim3_compose(sim3.sim3_compose(si, sim3.sim3_inverse(sj)),
                          sim3.sim3_inverse(rel)))


def make_odometry_edges(states: jnp.ndarray, valid: jnp.ndarray,
                        weight: float = 1.0):
    """Consecutive-keyframe edges from current states (the spanning-tree /
    odometry backbone of the essential graph)."""
    K = states.shape[0]
    i = jnp.arange(1, K, dtype=jnp.int32)
    j = i - 1
    rel = jax.vmap(lambda a, b: sim3.sim3_compose(a, sim3.sim3_inverse(b)))(
        states[i], states[j])
    w = jnp.where(valid[i] & valid[j], weight, 0.0)
    return i, j, rel, w


@functools.partial(jax.jit, static_argnames=("num_steps",))
def optimize_pose_graph(problem: PoseGraphProblem,
                        num_steps: int = 20,
                        damping: float = 1e-6) -> PoseGraphResult:
    K = problem.states.shape[0]
    free = (~problem.fixed).astype(jnp.float32)

    def total_error(states):
        def one(i, j, rel, w):
            r = edge_residual(states[i], states[j], rel)
            return w * jnp.sum(r * r)
        return jnp.sum(jax.vmap(one)(problem.edge_i, problem.edge_j,
                                     problem.edge_rel, problem.edge_weight))

    def gn_step(carry, _):
        states, lam, _ = carry
        err0 = total_error(states)

        def edge_blocks(i, j, rel, w):
            def rfun(xi):
                si = sim3.sim3_retract(states[i], xi[:7])
                sj = sim3.sim3_retract(states[j], xi[7:])
                return edge_residual(si, sj, rel)
            J = jax.jacfwd(rfun)(jnp.zeros(14))     # (7, 14)
            r = rfun(jnp.zeros(14))
            sw = jnp.sqrt(w)
            return J[:, :7] * sw, J[:, 7:] * sw, r * sw

        Ji, Jj, r = jax.vmap(edge_blocks)(
            problem.edge_i, problem.edge_j, problem.edge_rel,
            problem.edge_weight)

        H = jnp.zeros((K, K, 7, 7))
        ii = problem.edge_i
        jj = problem.edge_j
        H = H.at[ii, ii].add(jnp.einsum("eab,eac->ebc", Ji, Ji))
        H = H.at[jj, jj].add(jnp.einsum("eab,eac->ebc", Jj, Jj))
        H = H.at[ii, jj].add(jnp.einsum("eab,eac->ebc", Ji, Jj))
        H = H.at[jj, ii].add(jnp.einsum("eab,eac->ebc", Jj, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[ii].add(-jnp.einsum("eab,ea->eb", Ji, r))
        b = b.at[jj].add(-jnp.einsum("eab,ea->eb", Jj, r))

        mask2 = free[:, None] * free[None, :]
        H = H * mask2[:, :, None, None]
        diag = jnp.arange(K)
        H = H.at[diag, diag].add(
            (lam + damping) * jnp.eye(7)
            + jnp.where(problem.fixed[:, None, None], jnp.eye(7), 0.0))
        b = b * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        dx = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(K, 7)
        dx = dx * free[:, None]
        new_states = jax.vmap(sim3.sim3_retract)(states, dx)
        err1 = total_error(new_states)
        accept = err1 < err0
        states = jnp.where(accept, new_states, states)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 8.0), 1e-9, 1e3)
        return (states, lam, jnp.where(accept, err1, err0)), None

    init = (problem.states, jnp.float32(1e-5), jnp.float32(jnp.inf))
    (states, _, err), _ = jax.lax.scan(gn_step, init, None, length=num_steps)
    return PoseGraphResult(states, err)
