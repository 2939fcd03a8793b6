"""Keypoint selection from score maps: top-k with spatial gridding.

Replaces the reference's per-cell candidate collection + response-histogram
pruning (Image/OpenCVModified.cpp:575-616 keepBestKeyPoints; grid shape
FeatureExtractorSettings.NumCellsX/Y = 32x32, MageSettings.h:164-165) and the
Boost R*-tree spatial index used for radius queries
(Image/KeypointSpatialIndex.cpp:26-31).  On TPU both become regular-grid
operations: per-cell top-k for distribution, and radius queries are brute
masked distance tests (ops/matching.py) — no tree needed at N<=512.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    uv: jnp.ndarray        # (K, 2) float32 pixel coords (x, y)
    response: jnp.ndarray  # (K,) float32
    valid: jnp.ndarray     # (K,) bool


@functools.partial(jax.jit, static_argnames=("max_features",))
def select_topk(score: jnp.ndarray, max_features: int) -> Keypoints:
    """Global top-k keypoints from an NMS'd score map."""
    h, w = score.shape
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_features)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return Keypoints(jnp.stack([xs, ys], -1), vals, vals > 0)


@functools.partial(jax.jit,
                   static_argnames=("max_features", "cells_x", "cells_y",
                                    "per_cell"))
def select_gridded(score: jnp.ndarray, max_features: int,
                   cells_x: int = 32, cells_y: int = 32,
                   per_cell: int = 4) -> Keypoints:
    """Spatially-distributed top-k: keep <= per_cell best per grid cell, then
    global top-k over survivors.  Mirrors the intent of the reference's
    robustness-factor gridding (spread features, prefer strong responses).
    """
    h, w = score.shape
    ch = -(-h // cells_y)
    cw = -(-w // cells_x)
    pad_h = ch * cells_y - h
    pad_w = cw * cells_x - w
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    # (cells_y*cells_x, ch*cw)
    cells = s.reshape(cells_y, ch, cells_x, cw).transpose(0, 2, 1, 3)
    cells = cells.reshape(cells_y * cells_x, ch * cw)
    # rank within cell (0 = strongest); ordering key = (rank, -score)
    # lexicographic so selection goes breadth-first across cells — the
    # spatial-distribution guarantee the reference gets from per-cell pruning
    order = jnp.argsort(-cells, axis=1)
    rank = jnp.argsort(order, axis=1).astype(jnp.float32)
    # soft per-cell cap: ranks beyond per_cell are heavily penalised but can
    # still fill the budget when the image is sparse
    rank = jnp.where(rank < per_cell, rank, rank + 1024.0)
    key = jnp.where(cells > 0, rank * 1e4 - cells, jnp.inf)
    # back to image layout
    key_img = key.reshape(cells_y, cells_x, ch, cw).transpose(0, 2, 1, 3)
    key_img = key_img.reshape(ch * cells_y, cw * cells_x)[:h, :w]
    neg_key, idx = jax.lax.top_k(-key_img.reshape(-1), max_features)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    resp = score.reshape(-1)[idx]
    return Keypoints(jnp.stack([xs, ys], -1), resp,
                     jnp.isfinite(neg_key) & (resp > 0))
