"""Homography estimation + calibrated decomposition: the planar half of the
H/F dual-model bootstrap.

The reference grafts OpenCV's Nistér five-point solver precisely because the
8-point essential matrix degenerates on planar / low-parallax scenes
(Tracking/ComputeEssential.cpp:1-10), and its init settings already speak of
"computing homography and fundamental model" (MageSettings.h:110
RansacIterationsForModels).  TPU-first design choice: the five-point solver
needs the roots of a degree-10 polynomial (companion-matrix eigenvalues of a
nonsymmetric system — unsupported on TPU, hostile to fixed-shape batching),
so planar robustness is provided the ORB-SLAM way instead: score a 4-point
homography RANSAC *against* the 8-point essential RANSAC on every candidate
pair and reconstruct from whichever model explains the matches (planar ->
H + Faugeras decomposition, general -> E + cheirality).  Both RANSACs are
vmapped fixed-budget hypothesis batches — pure batched linear algebra (SVD),
no polynomial root finding.

Decomposition follows Faugeras & Lustman (1988): SVD-based closed-form
enumeration of the 8 (R, t, n) candidates, disambiguated by cheirality
voting + reprojection, exactly parallel to recover_pose for E.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.geometry import se3, triangulation


def _four_point_h(xn0: jnp.ndarray, xn1: jnp.ndarray) -> jnp.ndarray:
    """H (3,3) from 4 normalized correspondences via the DLT: each pair
    gives two rows of the 8x9 system A h = 0."""
    x0, y0 = xn0[:, 0], xn0[:, 1]
    x1, y1 = xn1[:, 0], xn1[:, 1]
    ones = jnp.ones_like(x0)
    zeros = jnp.zeros_like(x0)
    rows_u = jnp.stack([x0, y0, ones, zeros, zeros, zeros,
                        -x1 * x0, -x1 * y0, -x1], -1)
    rows_v = jnp.stack([zeros, zeros, zeros, x0, y0, ones,
                        -y1 * x0, -y1 * y0, -y1], -1)
    A = jnp.concatenate([rows_u, rows_v], 0)          # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _h_apply(H: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply a homography to (N, 2) normalized points."""
    p = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], -1) @ H.T
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    return p[..., :2] / z[..., None]


def symmetric_transfer_error_sq(H: jnp.ndarray, xn0: jnp.ndarray,
                                xn1: jnp.ndarray) -> jnp.ndarray:
    """||x1 - H x0||^2 + ||x0 - H^-1 x1||^2 per correspondence."""
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    f = jnp.sum((_h_apply(H, xn0) - xn1) ** 2, -1)
    b = jnp.sum((_h_apply(Hinv, xn1) - xn0) ** 2, -1)
    return f + b


class HomographyResult(NamedTuple):
    H: jnp.ndarray           # (3, 3)
    inliers: jnp.ndarray     # (N,) bool
    num_inliers: jnp.ndarray
    score: jnp.ndarray       # truncated symmetric-transfer score


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def homography_ransac(key: jax.Array, xn0: jnp.ndarray, xn1: jnp.ndarray,
                      valid: jnp.ndarray,
                      inlier_thresh: jnp.ndarray,
                      min_pixel_spread: jnp.ndarray = 0.0,
                      num_hypotheses: int = 512,
                      sample_weight: jnp.ndarray | None = None
                      ) -> HomographyResult:
    """Fixed-budget vmapped 4-point RANSAC for H, with the same truncated
    scoring / pixel-spread demotion / LO refit structure as
    essential_ransac so the two model scores are directly comparable."""
    n = xn0.shape[0]
    p = valid.astype(jnp.float32)
    if sample_weight is not None:
        p = p * sample_weight
    p = p / jnp.maximum(jnp.sum(p), 1e-9)
    thresh_sq = inlier_thresh ** 2

    def hypothesis(k):
        idx = jax.random.choice(k, n, shape=(4,), replace=False, p=p)
        s0 = xn0[idx]
        spread = (jnp.max(s0[:, 0]) - jnp.min(s0[:, 0])
                  + jnp.max(s0[:, 1]) - jnp.min(s0[:, 1]))
        H = _four_point_h(s0, xn1[idx])
        d = symmetric_transfer_error_sq(H, xn0, xn1)
        inl = valid & (d < thresh_sq)
        score = jnp.sum(jnp.where(inl, thresh_sq - d, 0.0))
        ok = (spread >= min_pixel_spread) & jnp.all(jnp.isfinite(H))
        return H, jnp.where(ok, score, -1.0)

    keys = jax.random.split(key, num_hypotheses)
    Hs, scores = jax.vmap(hypothesis)(keys)
    H = Hs[jnp.argmax(scores)]
    d = symmetric_transfer_error_sq(H, xn0, xn1)
    inl = valid & (d < thresh_sq)

    # LO refit: weighted DLT over the consensus set
    x0, y0 = xn0[:, 0], xn0[:, 1]
    x1, y1 = xn1[:, 0], xn1[:, 1]
    ones = jnp.ones_like(x0)
    zeros = jnp.zeros_like(x0)
    rows_u = jnp.stack([x0, y0, ones, zeros, zeros, zeros,
                        -x1 * x0, -x1 * y0, -x1], -1)
    rows_v = jnp.stack([zeros, zeros, zeros, x0, y0, ones,
                        -y1 * x0, -y1 * y0, -y1], -1)
    A = jnp.concatenate([rows_u, rows_v], 0)          # (2N, 9)

    def refit(carry, _):
        H, inl, d = carry
        w = jnp.concatenate([inl, inl], 0).astype(A.dtype)
        Aw = A * w[:, None]
        G = Aw.T @ Aw
        _, V = jnp.linalg.eigh(G)
        H2 = V[:, 0].reshape(3, 3)
        d2 = symmetric_transfer_error_sq(H2, xn0, xn1)
        inl2 = valid & (d2 < thresh_sq)
        use = jnp.sum(inl2) >= jnp.sum(inl)
        return (jnp.where(use, H2, H), jnp.where(use, inl2, inl),
                jnp.where(use, d2, d)), None

    (H, inl, d), _ = jax.lax.scan(refit, (H, inl, d), None, length=3)
    score = jnp.sum(jnp.where(inl, thresh_sq - d, 0.0))
    return HomographyResult(H, inl, jnp.sum(inl), score)


def decompose_homography(H: jnp.ndarray) -> jnp.ndarray:
    """(8, 7) candidate relative poses from a calibrated homography
    (Faugeras-Lustman SVD enumeration).  x1 ~ (R + t n^T / d) x0 with
    |n| = 1; translation is returned unit-normalized (monocular gauge,
    same convention as decompose_essential)."""
    U, dvals, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = dvals[0], dvals[1], dvals[2]
    d2s = jnp.where(d2 < 1e-12, 1e-12, d2)
    denom = jnp.maximum(d1 ** 2 - d3 ** 2, 1e-12)
    x1m = jnp.sqrt(jnp.clip((d1 ** 2 - d2 ** 2) / denom, 0.0, None))
    x3m = jnp.sqrt(jnp.clip((d2 ** 2 - d3 ** 2) / denom, 0.0, None))
    V = Vt.T

    def case_pos(e1, e3):
        # d' = +d2
        x1, x3 = e1 * x1m, e3 * x3m
        st = (d1 - d3) / d2s * x1 * x3
        ct = (d1 * x3 ** 2 + d3 * x1 ** 2) / d2s
        Rp = jnp.array([[1.0, 0.0, 0.0],
                        [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
        tp = (d1 - d3) * jnp.array([x1, 0.0, -x3])
        return Rp, tp

    def case_neg(e1, e3):
        # d' = -d2 (reflection case)
        x1, x3 = e1 * x1m, e3 * x3m
        sp = (d1 + d3) / d2s * x1 * x3
        cp = (d3 * x1 ** 2 - d1 * x3 ** 2) / d2s
        Rp = jnp.zeros((3, 3))
        Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp)
        Rp = Rp.at[1, 1].set(-1.0)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cp)
        tp = (d1 + d3) * jnp.array([x1, 0.0, x3])
        return Rp, tp

    poses = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            for case in (case_pos, case_neg):
                Rp, tp = case(e1, e3)
                R = s * U @ Rp @ Vt
                t = U @ tp
                tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
                poses.append(se3.make_pose(se3.mat_to_quat(R), tn))
    return jnp.stack(poses)  # (8, 7)


def recover_pose_from_h(H: jnp.ndarray, xn0: jnp.ndarray, xn1: jnp.ndarray,
                        inliers: jnp.ndarray) -> jnp.ndarray:
    """Pick the physical (R, t) among the 8 Faugeras candidates by
    cheirality + reprojection voting (parallel of essential.recover_pose)."""
    cands = decompose_homography(H)
    pose0 = se3.pose_identity()
    r0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], -1)
    r1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], -1)

    def votes(rel):
        X, valid_tri = triangulation.triangulate_midpoint(pose0, rel, r0, r1)
        z0 = X[..., 2]
        z1 = se3.pose_apply(rel, X)[..., 2]
        good = inliers & valid_tri & (z0 > 0) & (z1 > 0)
        # small reprojection residual in view 1 breaks cheirality ties
        zs = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
        y1 = se3.pose_apply(rel, X)
        rr = jnp.sum((y1[..., :2] / zs[..., None] - xn1) ** 2, -1)
        return (jnp.sum(good).astype(jnp.float32)
                - 1e-3 * jnp.sum(jnp.where(good, rr, 0.0)))

    counts = jax.vmap(votes)(cands)
    return cands[jnp.argmax(counts)]
