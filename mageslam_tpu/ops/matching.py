"""Binary descriptor matching: batched Hamming distance + ratio tests.

TPU-native replacement for the reference's FeatureMatcher
(Tracking/FeatureMatcher.*: global Match, BoW-indexed IndexedMatch, spatial
RadiusMatch with NEON popcount, FeatureMatcher.h:21-132).  Everything is a
fixed-shape masked matrix op: distance matrices via XOR +
lax.population_count, best/second-best via a two-pass min, radius queries as
brute-force masked distance tests (at N<=512 features a dense (N, M) matrix
is far cheaper on TPU than any tree).

Invalid entries are encoded with distance BIG; "no match" indices are -1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)


def hamming_matrix(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances."""
    x = jnp.bitwise_xor(da[:, None, :], db[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def _top2_min(d: jnp.ndarray):
    """Per-row best and second-best distances + best index. d: (N, M)."""
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best, second, best_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mutual",))
def match(da: jnp.ndarray, db: jnp.ndarray,
          valid_a: jnp.ndarray, valid_b: jnp.ndarray,
          max_distance: int = 30, min_difference: int = 1,
          mutual: bool = True):
    """Global matching (reference FeatureMatcher::Match).

    Returns (idx: (N,) int32 index into b or -1, dist: (N,) int32).
    Tests: Hamming <= max_distance, second-best margin >= min_difference
    (reference MinHammingDifference ambiguity test), optional mutual-best.
    """
    d = hamming_matrix(da, db)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, BIG)
    best, second, idx = _top2_min(d)
    ok = (best <= max_distance) & ((second - best) >= min_difference)
    if mutual:
        back = jnp.argmin(d, axis=0)  # best a for each b
        ok &= back[idx] == jnp.arange(da.shape[0])
    return jnp.where(ok, idx, -1), jnp.where(ok, best, BIG)


@jax.jit
def radius_match(query_uv: jnp.ndarray, query_desc: jnp.ndarray,
                 query_valid: jnp.ndarray,
                 train_uv: jnp.ndarray, train_desc: jnp.ndarray,
                 train_valid: jnp.ndarray,
                 radius: jnp.ndarray,
                 max_distance: int = 30, min_difference: int = 1):
    """Spatial radius matching (reference FeatureMatcher::RadiusMatch,
    FeatureMatcher.h:92-132): for each query (a projected map point with a
    predicted pixel), find the best descriptor among train keypoints within
    `radius` pixels.

    radius: scalar or (N,) per-query search radius.
    Returns (idx: (N,) into train or -1, dist: (N,) int32).
    """
    d2 = jnp.sum((query_uv[:, None, :] - train_uv[None, :, :]) ** 2, axis=-1)
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32),
                         (query_uv.shape[0],))
    in_r = d2 <= (r[:, None] ** 2)
    dm = hamming_matrix(query_desc, train_desc)
    dm = jnp.where(in_r & query_valid[:, None] & train_valid[None, :],
                   dm, BIG)
    best, second, idx = _top2_min(dm)
    ok = (best <= max_distance) & ((second - best) >= min_difference)
    return jnp.where(ok, idx, -1), jnp.where(ok, best, BIG)


@jax.jit
def assign_unique(idx: jnp.ndarray, dist: jnp.ndarray):
    """Resolve duplicate targets: when several queries matched the same train
    index keep only the lowest-distance one (the reference resolves these
    through its association container;  we do a segment-min).

    Returns idx with losers set to -1.
    """
    n = idx.shape[0]
    m = jnp.where(idx >= 0, idx, n)  # route invalid to a scratch bucket
    # min distance per target
    best_per_target = jnp.full((n + 1,), BIG, jnp.int32).at[m].min(dist)
    winner = dist <= best_per_target[m]
    # among equal distances, keep lowest query index
    qidx = jnp.arange(n, dtype=jnp.int32)
    first_winner = jnp.full((n + 1,), n, jnp.int32).at[m].min(
        jnp.where(winner, qidx, n))
    keep = winner & (qidx == first_winner[m]) & (idx >= 0)
    return jnp.where(keep, idx, -1)


def match_count(idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(idx >= 0)
