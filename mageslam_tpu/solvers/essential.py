"""Essential-matrix estimation: vmapped 8-point RANSAC + pose recovery.

Replaces the reference's grafted Nistér five-point solver + RANSAC loop
(Tracking/ComputeEssential.cpp, Tracking/MapInitialization.cpp:181-277
FindPossiblePoses).  Design change (TPU-first): the 10th-degree-polynomial
five-point solver is hostile to batched compilation; with ~500 candidate
matches the normalized 8-point algorithm inside a *vmapped* fixed-budget
RANSAC reaches the same inlier sets and feeds the same downstream gates
(symmetric transfer error scoring, cheirality disambiguation, pixel-spread
sample rejection — MapInitialization.cpp:181-277).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import epipolar, se3, triangulation


def _eight_point(xn0: jnp.ndarray, xn1: jnp.ndarray) -> jnp.ndarray:
    """E from 8 normalized correspondences; projected to the essential
    manifold (singular values 1,1,0)."""
    x0, y0 = xn0[:, 0], xn0[:, 1]
    x1, y1 = xn1[:, 0], xn1[:, 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, ones], -1)  # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, _, Vt2 = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt2


class EssentialResult(NamedTuple):
    rel_pose: jnp.ndarray    # (7,) x1 = R x0 + t, |t| = 1
    E: jnp.ndarray           # (3, 3)
    inliers: jnp.ndarray     # (N,) bool
    num_inliers: jnp.ndarray
    score: jnp.ndarray       # symmetric-transfer-error score of the winner


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def essential_ransac(key: jax.Array, xn0: jnp.ndarray, xn1: jnp.ndarray,
                     valid: jnp.ndarray,
                     inlier_thresh: jnp.ndarray,
                     min_pixel_spread: jnp.ndarray = 0.0,
                     num_hypotheses: int = 1024,
                     sample_weight: jnp.ndarray | None = None
                     ) -> EssentialResult:
    """Fixed-budget vmapped RANSAC for E.

    inlier_thresh / min_pixel_spread in normalized-coordinate units.
    Samples with pixel-spread rejection (reference MinPixelSpread gate,
    MapInitialization.cpp FindPossiblePoses): hypotheses whose 8 sample
    points are spatially clustered are demoted rather than re-drawn.
    Scoring = truncated symmetric transfer error (reference
    ScoreFundamentalMatrix).
    """
    n = xn0.shape[0]
    p = valid.astype(jnp.float32)
    if sample_weight is not None:
        # PROSAC-style bias: better-scoring matches are likelier inliers, so
        # weighting the minimal-sample draw dramatically cuts the hypothesis
        # budget needed at ~50% inlier rates
        p = p * sample_weight
    p = p / jnp.maximum(jnp.sum(p), 1e-9)
    thresh_sq = inlier_thresh ** 2

    def hypothesis(k):
        idx = jax.random.choice(k, n, shape=(8,), replace=False, p=p)
        s0 = xn0[idx]
        spread = (jnp.max(s0[:, 0]) - jnp.min(s0[:, 0])
                  + jnp.max(s0[:, 1]) - jnp.min(s0[:, 1]))
        E = _eight_point(s0, xn1[idx])
        d = epipolar.symmetric_epipolar_distance_sq(E, xn0, xn1)
        inl = valid & (d < thresh_sq)
        # truncated quadratic score (higher is better), like the reference's
        # per-point scoring capped at the threshold
        score = jnp.sum(jnp.where(inl, thresh_sq - d, 0.0))
        ok = (spread >= min_pixel_spread) & jnp.all(jnp.isfinite(E))
        return E, jnp.where(ok, score, -1.0), jnp.sum(inl)

    keys = jax.random.split(key, num_hypotheses)
    Es, scores, counts = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    E = Es[best]

    # final inlier set
    d = epipolar.symmetric_epipolar_distance_sq(E, xn0, xn1)
    inl = valid & (d < thresh_sq)

    # LO-RANSAC: iterated refit on the inlier set (smallest eigenvector of
    # the masked Gram matrix, projected to the essential manifold).  At
    # ~50% inlier rates the minimal-sample winner is noisy; 3 local
    # optimization rounds recover the full consensus set.
    x0, y0 = xn0[:, 0], xn0[:, 1]
    x1, y1 = xn1[:, 0], xn1[:, 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, jnp.ones_like(x0)], -1)

    def refit(carry, _):
        E, inl, d = carry
        Aw = A * inl[:, None]
        G = Aw.T @ Aw
        _, V = jnp.linalg.eigh(G)
        E2 = V[:, 0].reshape(3, 3)
        U, _, Vt2 = jnp.linalg.svd(E2)
        E2 = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E2.dtype)) @ Vt2
        d2 = epipolar.symmetric_epipolar_distance_sq(E2, xn0, xn1)
        inl2 = valid & (d2 < thresh_sq)
        use = jnp.sum(inl2) >= jnp.sum(inl)
        return (jnp.where(use, E2, E), jnp.where(use, inl2, inl),
                jnp.where(use, d2, d)), None

    (E, inl, d), _ = jax.lax.scan(refit, (E, inl, d), None, length=3)

    rel = recover_pose(E, xn0, xn1, inl)
    score = jnp.sum(jnp.where(inl, thresh_sq - d, 0.0))
    return EssentialResult(rel, E, inl, jnp.sum(inl), score)


def recover_pose(E: jnp.ndarray, xn0: jnp.ndarray, xn1: jnp.ndarray,
                 inliers: jnp.ndarray) -> jnp.ndarray:
    """Disambiguate the 4 E-decompositions by cheirality voting
    (reference FindCorrectPose, MapInitialization.h:153-161)."""
    cands = epipolar.decompose_essential(E)  # (4, 7)
    pose0 = se3.pose_identity()
    r0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], -1)
    r1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], -1)

    def votes(rel):
        X, valid_tri = triangulation.triangulate_midpoint(pose0, rel, r0, r1)
        z0 = se3.pose_apply(pose0, X)[..., 2]
        z1 = se3.pose_apply(rel, X)[..., 2]
        return jnp.sum(inliers & valid_tri & (z0 > 0) & (z1 > 0))

    counts = jax.vmap(votes)(cands)
    return cands[jnp.argmax(counts)]
