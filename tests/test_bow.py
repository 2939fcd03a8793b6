"""BoW vocabulary, database queries, and relocalization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.bow import database as bdb
from mageslam_tpu.bow import vocab as bv


def random_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


def perturb_desc(rng, desc, bits=10):
    """Flip `bits` random bits per descriptor."""
    d = np.array(desc)
    for i in range(d.shape[0]):
        for _ in range(bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1) << np.uint32(b)
    return jnp.asarray(d)


class TestVocabulary:
    def test_train_and_quantize(self, rng):
        desc = random_desc(rng, 600)
        valid = jnp.ones(600, bool)
        vocab = bv.train_vocabulary(jax.random.key(0), desc, valid, iters=6)
        assert bool(vocab.trained)
        leaves = bv.quantize(vocab, desc)
        assert leaves.shape == (600,)
        assert int(leaves.min()) >= 0 and int(leaves.max()) < bv.NUM_LEAVES
        # a reasonable spread of leaves in use
        assert len(np.unique(np.asarray(leaves))) > 10

    def test_quantization_stable_under_noise(self, rng):
        desc = random_desc(rng, 400)
        valid = jnp.ones(400, bool)
        vocab = bv.train_vocabulary(jax.random.key(1), desc, valid, iters=6)
        noisy = perturb_desc(rng, desc, bits=6)
        l0 = np.asarray(bv.quantize(vocab, desc))
        l1 = np.asarray(bv.quantize(vocab, noisy))
        assert (l0 == l1).mean() > 0.5

    def test_signature_similarity(self, rng):
        desc = random_desc(rng, 500)
        valid = jnp.ones(500, bool)
        vocab = bv.train_vocabulary(jax.random.key(2), desc, valid, iters=6)
        a = desc[:200]
        b = perturb_desc(rng, a, bits=6)     # same "image", noisy
        c = desc[250:450]                    # different image
        sa = bv.signature(vocab, a, jnp.ones(200, bool))
        sb = bv.signature(vocab, b, jnp.ones(200, bool))
        sc = bv.signature(vocab, c, jnp.ones(200, bool))
        sim_ab = float(bv.similarity(sa, sb[None])[0])
        sim_ac = float(bv.similarity(sa, sc[None])[0])
        assert sim_ab > sim_ac + 0.1


class TestDatabase:
    def test_query_finds_matching_keyframe(self, rng):
        pool = random_desc(rng, 800)
        vocab = bv.train_vocabulary(jax.random.key(3), pool,
                                    jnp.ones(800, bool), iters=6)
        db = bdb.empty_database(8)
        db = db._replace(vocab=vocab)
        frames = [pool[i * 100:(i + 1) * 100] for i in range(6)]
        for i, f in enumerate(frames):
            db = bdb.add_keyframe(db, i, f, jnp.ones(100, bool))
        # query with a noisy copy of frame 3
        q = perturb_desc(rng, frames[3], bits=5)
        idx, scores, ok = bdb.query(db, q, jnp.ones(100, bool),
                                    jnp.zeros(8, bool), max_results=2)
        assert bool(ok[0])
        assert int(idx[0]) == 3

    def test_query_respects_exclusion(self, rng):
        pool = random_desc(rng, 600)
        vocab = bv.train_vocabulary(jax.random.key(4), pool,
                                    jnp.ones(600, bool), iters=6)
        db = bdb.empty_database(8)._replace(vocab=vocab)
        for i in range(4):
            db = bdb.add_keyframe(db, i, pool[i * 100:(i + 1) * 100],
                                  jnp.ones(100, bool))
        q = perturb_desc(rng, pool[100:200], bits=5)
        excl = jnp.zeros(8, bool).at[1].set(True)
        idx, scores, ok = bdb.query(db, q, jnp.ones(100, bool), excl,
                                    max_results=2)
        assert int(idx[0]) != 1

    def test_remove_keyframes(self, rng):
        pool = random_desc(rng, 600)
        vocab = bv.train_vocabulary(jax.random.key(5), pool,
                                    jnp.ones(600, bool), iters=6)
        db = bdb.empty_database(8)._replace(vocab=vocab)
        db = bdb.add_keyframe(db, 0, pool[:100], jnp.ones(100, bool))
        db = bdb.remove_keyframes(db, jnp.ones(8, bool))
        idx, scores, ok = bdb.query(db, pool[:100], jnp.ones(100, bool),
                                    jnp.zeros(8, bool), max_results=2)
        assert not bool(ok[0])
