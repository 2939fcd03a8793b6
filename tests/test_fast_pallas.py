"""Pallas FAST kernel vs the jnp reference implementation.

The fused score+NMS kernel (ops/fast_pallas.py) must be bit-exact against
ops/fast.detect — it replaces it on TPU in the frontend hot path. On CPU
the Mosaic interpreter executes the same kernel body.
"""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.ops import fast, fast_pallas


def test_fast_pallas_matches_jnp_random(rng):
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    ref = fast.detect(jnp.asarray(img), 20.0)
    pal = fast_pallas.detect(jnp.asarray(img), 20.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))


def test_fast_pallas_structured_corners(rng):
    # a bright square on dark background: corners must fire identically
    img = np.zeros((48, 64), np.float32)
    img[12:30, 20:44] = 200.0
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    ref = fast.detect(jnp.asarray(img), 15.0)
    pal = fast_pallas.detect(jnp.asarray(img), 15.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))
    assert int(jnp.sum(pal > 0)) >= 4  # the four square corners fire


def test_detect_and_smooth_matches_components(rng):
    from mageslam_tpu.ops import pyramid
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    ref_s = fast.detect(jnp.asarray(img), 20.0)
    ref_b = pyramid.gaussian_blur(jnp.asarray(img), 7)
    s, b = fast_pallas.detect_and_smooth(jnp.asarray(img), 20.0, 7,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(s))
    # blur matches to float32 mul-add reassociation
    np.testing.assert_allclose(np.asarray(ref_b), np.asarray(b),
                               atol=2e-3)
