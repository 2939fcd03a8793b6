"""Online bag-of-binary-words: vocabulary training + image signatures.

TPU-native equivalent of the reference's OnlineBow (BoW/OnlineBow.*:
vocabulary tree trained online from the first ~15 frames' descriptors —
k-means/k-medoids over binary descriptors OnlineBow.h:59-69, tf-idf node
weights OnlineBow.cpp:25-30, inverted index + similarity scoring
OnlineBow.cpp:150-210; tracking is gated until training completes,
Runtime.cpp:247-250; tree shape BagOfWordsSettings: branching 6, 2 levels).

Design changes for TPU:
  - Clustering is k-majority (bitwise majority vote as the binary "mean"),
    fixed-iteration, fully batched over the training set.
  - The 2-level tree (6 x 6 = 36 leaves) is stored flat; quantization is
    two batched Hamming argmins.
  - The inverted index becomes a dense (K, NUM_LEAVES) signature matrix:
    similarity queries are one matmul-like reduction over keyframe slots —
    at K <= 256 dense scoring on the MXU beats list-walking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mageslam_tpu.ops.matching import hamming_matrix

BRANCH = 6          # BagOfWordsSettings.TrainingTreeBranchingFactor
LEVELS = 2          # BagOfWordsSettings.TrainingTreeLevels
NUM_LEAVES = BRANCH ** LEVELS


class Vocabulary(NamedTuple):
    l1_desc: jnp.ndarray    # (B, 8) uint32 level-1 centroids
    leaf_desc: jnp.ndarray  # (B, B, 8) uint32 level-2 centroids
    idf: jnp.ndarray        # (NUM_LEAVES,) tf-idf weights
    trained: jnp.ndarray    # bool scalar


def empty_vocabulary() -> Vocabulary:
    return Vocabulary(
        l1_desc=jnp.zeros((BRANCH, 8), jnp.uint32),
        leaf_desc=jnp.zeros((BRANCH, BRANCH, 8), jnp.uint32),
        idf=jnp.ones(NUM_LEAVES, jnp.float32),
        trained=jnp.asarray(False),
    )


def _unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) float32 in {0, 1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) {0,1} -> (N, 8) uint32."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


def _k_majority(key, desc: jnp.ndarray, valid: jnp.ndarray, k: int,
                iters: int):
    """Fixed-iteration k-majority clustering of binary descriptors.

    Returns (centroids (k, 8) uint32, assignment (N,) int32)."""
    n = desc.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    init_idx = jax.random.choice(key, n, shape=(k,), replace=False, p=p)
    cents = desc[init_idx]
    bits = _unpack_bits(desc)

    def step(cents, _):
        d = hamming_matrix(desc, cents)              # (N, k)
        d = jnp.where(valid[:, None], d, 1 << 20)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k) * valid[:, None]  # (N, k)
        counts = jnp.sum(onehot, axis=0)             # (k,)
        mean_bits = (onehot.T @ bits) / jnp.maximum(counts[:, None], 1.0)
        new_cents = _pack_bits(mean_bits > 0.5)
        # keep old centroid for empty clusters
        new_cents = jnp.where((counts > 0)[:, None], new_cents, cents)
        return new_cents, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    d = hamming_matrix(desc, cents)
    d = jnp.where(valid[:, None], d, 1 << 20)
    return cents, jnp.argmin(d, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iters",))
def train_vocabulary(key: jax.Array, desc: jnp.ndarray,
                     valid: jnp.ndarray, iters: int = 12) -> Vocabulary:
    """Train the 2-level tree from a pooled descriptor set (the reference
    pools TrainingFrames=15 frames; caller stacks them)."""
    k1, k2 = jax.random.split(key)
    l1, assign1 = _k_majority(k1, desc, valid, BRANCH, iters)

    def sub(cluster_idx, kk):
        mask = valid & (assign1 == cluster_idx)
        return _k_majority(kk, desc, mask, BRANCH, iters)[0]

    keys = jax.random.split(k2, BRANCH)
    leaf = jax.vmap(sub)(jnp.arange(BRANCH), keys)   # (B, B, 8)

    vocab = Vocabulary(l1, leaf, jnp.ones(NUM_LEAVES, jnp.float32),
                       jnp.asarray(True))
    # idf weights from the training set: log(N / (1 + n_l))
    leaves = quantize(vocab, desc)
    counts = jnp.zeros(NUM_LEAVES).at[leaves].add(
        valid.astype(jnp.float32))
    n_total = jnp.maximum(jnp.sum(valid), 1)
    idf = jnp.log(n_total.astype(jnp.float32) / (1.0 + counts))
    idf = jnp.maximum(idf, 0.0)
    return vocab._replace(idf=idf)


@jax.jit
def quantize(vocab: Vocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) descriptors -> (N,) leaf ids via 2-level traversal."""
    d1 = hamming_matrix(desc, vocab.l1_desc)         # (N, B)
    a1 = jnp.argmin(d1, axis=1)                      # (N,)
    sub = vocab.leaf_desc[a1]                        # (N, B, 8)
    x = jnp.bitwise_xor(desc[:, None, :], sub)
    d2 = jnp.sum(jax.lax.population_count(x), axis=-1)
    a2 = jnp.argmin(d2, axis=1)
    return (a1 * BRANCH + a2).astype(jnp.int32)


@jax.jit
def signature(vocab: Vocabulary, desc: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """tf-idf L1-normalized bag-of-words vector (NUM_LEAVES,)."""
    leaves = quantize(vocab, desc)
    tf = jnp.zeros(NUM_LEAVES).at[leaves].add(valid.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@jax.jit
def similarity(sig_a: jnp.ndarray, sigs: jnp.ndarray) -> jnp.ndarray:
    """L1 BoW score in [0, 1]: 1 - 0.5*|a - b|_1 (the standard DBoW
    similarity the reference's scoring follows).  sigs: (K, NUM_LEAVES)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(sig_a[None, :] - sigs), axis=-1)
