"""Point-cloud post-processing: normals, mollification, repositioning.

Equivalent of the reference's Clouds/DeNoising.* (DeNoising.h:13-39:
offline normals estimation, normal mollification, and point repositioning
for exported clouds — used by VOI/debug consumers, not the tracking loop).

TPU shape: k-nearest-neighbor structure is a dense masked distance matrix
(fine at L <= 8192 on the MXU); normals come from vmapped 3x3 covariance
eigen-decompositions; mollification/repositioning are weighted neighbor
reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def knn_indices(points: jnp.ndarray, valid: jnp.ndarray, k: int = 12):
    """(N, k) nearest-neighbor indices among valid points (self excluded)."""
    d2 = jnp.sum((points[:, None] - points[None, :]) ** 2, -1)
    big = jnp.float32(1e12)
    n = points.shape[0]
    d2 = jnp.where(valid[None, :] & valid[:, None], d2, big)
    d2 = d2 + jnp.eye(n) * big
    _, idx = jax.lax.top_k(-d2, k)
    return idx


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points: jnp.ndarray, valid: jnp.ndarray,
                     view_dirs: jnp.ndarray, k: int = 12) -> jnp.ndarray:
    """PCA normals oriented toward the viewing direction
    (DeNoising ComputeNormals analog).  view_dirs: (N, 3) unit camera->point
    directions used for orientation disambiguation."""
    idx = knn_indices(points, valid, k)
    nbrs = points[idx]                        # (N, k, 3)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    c = nbrs - mu
    cov = jnp.einsum("nka,nkb->nab", c, c) / k
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, :, 0]                    # smallest eigenvector
    flip = jnp.sum(normal * view_dirs, axis=-1) > 0
    return normal * jnp.where(flip, -1.0, 1.0)[:, None]


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def mollify_normals(points: jnp.ndarray, normals: jnp.ndarray,
                    valid: jnp.ndarray, k: int = 12,
                    sigma: float = 0.1, iters: int = 2) -> jnp.ndarray:
    """Smooth the normal field by distance-weighted neighbor averaging
    (DeNoising MollifyNormals)."""
    idx = knn_indices(points, valid, k)
    d = jnp.linalg.norm(points[idx] - points[:, None], axis=-1)
    w = jnp.exp(-0.5 * (d / sigma) ** 2) * valid[idx]

    def body(n, _):
        avg = jnp.einsum("nk,nka->na", w, n[idx]) \
            + n * 1e-3
        return avg / jnp.maximum(
            jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-9), None

    normals, _ = jax.lax.scan(body, normals, None, length=iters)
    return normals


@functools.partial(jax.jit, static_argnames=("k",))
def reposition_points(points: jnp.ndarray, normals: jnp.ndarray,
                      valid: jnp.ndarray, k: int = 12,
                      sigma: float = 0.1) -> jnp.ndarray:
    """Move each point onto the weighted average of its neighbors' tangent
    planes (DeNoising RepositionPoints) — bilateral denoising that
    preserves structure."""
    idx = knn_indices(points, valid, k)
    nbr_p = points[idx]
    nbr_n = normals[idx]
    d = jnp.linalg.norm(nbr_p - points[:, None], axis=-1)
    w = jnp.exp(-0.5 * (d / sigma) ** 2) * valid[idx]
    # projection of this point onto each neighbor's tangent plane
    off = jnp.einsum("nka,nka->nk", nbr_n,
                     points[:, None] - nbr_p)
    proj = points[:, None] - off[..., None] * nbr_n
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    new_p = jnp.einsum("nk,nka->na", w, proj) / wsum
    return jnp.where(valid[:, None], new_p, points)
