"""Keyframe BoW database: signatures per keyframe slot + place queries.

Equivalent of the reference's BaseBow interface surface (BoW/BaseBow.h:20-56:
AddImage / RemoveImage / QueryUnknownImage) and the ThreadSafeMap query
wrappers FindSimilarKeyframes / FindNonCovisibleSimilarKeyframeClusters
(Map/ThreadSafeMap.h:110-112) used for relocalization and loop detection.

State is a dense (K, NUM_LEAVES) signature matrix aligned with MapState's
keyframe slots; queries are batched reductions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.bow import vocab as bv
from mageslam_tpu.mapstore import map_state as ms


class BowDatabase(NamedTuple):
    vocab: bv.Vocabulary
    kf_sig: jnp.ndarray    # (K, NUM_LEAVES)
    kf_valid: jnp.ndarray  # (K,) slots with a signature


def empty_database(max_keyframes: int) -> BowDatabase:
    return BowDatabase(
        vocab=bv.empty_vocabulary(),
        kf_sig=jnp.zeros((max_keyframes, bv.NUM_LEAVES), jnp.float32),
        kf_valid=jnp.zeros(max_keyframes, bool),
    )


@jax.jit
def add_keyframe(db: BowDatabase, kf_slot, desc: jnp.ndarray,
                 valid: jnp.ndarray) -> BowDatabase:
    """BoW.AddImage (MappingWorker.cpp:189-193)."""
    sig = bv.signature(db.vocab, desc, valid)
    return db._replace(
        kf_sig=db.kf_sig.at[kf_slot].set(sig),
        kf_valid=db.kf_valid.at[kf_slot].set(True),
    )


@jax.jit
def remove_keyframes(db: BowDatabase, kf_mask: jnp.ndarray) -> BowDatabase:
    return db._replace(kf_valid=db.kf_valid & ~kf_mask)


@functools.partial(jax.jit, static_argnames=("max_results",))
def query(db: BowDatabase, desc: jnp.ndarray, valid: jnp.ndarray,
          exclude_mask: jnp.ndarray,
          qualifying_score: float = 0.75,
          max_results: int = 4):
    """QueryUnknownImage / FindSimilarKeyframes: top keyframes by BoW score.

    exclude_mask: (K,) keyframes to skip (e.g. covisible set for loop
    detection).  Returns (kf_idx (R,), scores (R,), valid (R,)).
    A candidate must reach qualifying_score x best_score
    (BagOfWordsSettings.QualifyingCandidateScore).
    """
    sig = bv.signature(db.vocab, desc, valid)
    scores = bv.similarity(sig, db.kf_sig)
    scores = jnp.where(db.kf_valid & ~exclude_mask, scores, -1.0)
    vals, idx = jax.lax.top_k(scores, max_results)
    best = jnp.maximum(vals[0], 1e-9)
    ok = (vals > 0) & (vals >= qualifying_score * best)
    return idx.astype(jnp.int32), vals, ok


@functools.partial(jax.jit, static_argnames=("max_results",))
def query_clusters(db: BowDatabase, m: ms.MapState, query_kf,
                   desc: jnp.ndarray, valid: jnp.ndarray,
                   covis_threshold: int = 15,
                   qualifying_score: float = 0.75,
                   max_results: int = 8):
    """FindNonCovisibleSimilarKeyframeClusters (loop detection,
    LoopClosureWorker.cpp:108-162): similar keyframes NOT covisible with
    the query keyframe, each expanded to its covisibility cluster.

    Returns (cand_idx (R,), cand_scores (R,), cand_ok (R,),
    cluster_mask (R, K) bool — each candidate's covisible set).
    """
    K = m.kf_valid.shape[0]
    cov = ms.covisibility(m)
    covisible = (cov[query_kf] > 0) | \
        (jnp.arange(K) == jnp.asarray(query_kf))
    # TWO-hop exclusion (ORB-SLAM's DetectLoop excludes the query's whole
    # covisible neighborhood): once tracking or cheap loop closure has
    # stitched the seam, the revisited sector is 1 hop away — candidates
    # 2 hops out are physically the same wall and "closing" against them
    # re-corrects an already-consistent map (measured on the real-texture
    # ring: 3 such closures took ATE 2.2% -> 6.1% of extent)
    covisible2 = covisible | (
        ((cov > 0).astype(jnp.float32) @ covisible.astype(jnp.float32))
        > 0)
    idx, scores, ok = query(db, desc, valid, covisible2,
                            qualifying_score, max_results)
    # cluster per candidate: keyframes sharing >= covis_threshold points
    clusters = (cov[idx] >= covis_threshold) & m.kf_valid[None, :]
    clusters = clusters.at[jnp.arange(idx.shape[0]), idx].set(True)
    clusters &= ok[:, None]
    return idx, scores, ok, clusters
