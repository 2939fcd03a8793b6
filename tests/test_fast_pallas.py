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


def test_fast_pallas_compiled_tpu_bitexact(rng):
    """Bit-exactness of the REAL compiled Mosaic kernel (not the
    interpreter).  Runs only when the suite targets TPU hardware
    (MAGESLAM_TEST_PLATFORM=tpu — see conftest.py); the interpret=True
    tests above cover the kernel body on CPU."""
    import jax
    import pytest
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs TPU hardware (set MAGESLAM_TEST_PLATFORM=tpu)")
    img = rng.uniform(0, 255, (180, 320)).astype(np.float32)
    ref = fast.detect(jnp.asarray(img), 20.0)
    pal = fast_pallas.detect(jnp.asarray(img), 20.0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))
    s, b = fast_pallas.detect_and_smooth(jnp.asarray(img), 20.0, 7)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(s))
    # blur: compare against a float64 numpy separable blur.  The Pallas
    # blur is full-f32 VPU mul-adds; the jnp conv path on TPU rounds
    # through bf16 on the MXU (~0.5% error), so the jnp output is NOT the
    # gold standard here — f64 numpy is.
    from mageslam_tpu.ops import pyramid
    taps = np.asarray(pyramid.gaussian_kernel1d(7), np.float64)
    p = np.pad(img.astype(np.float64), 3, mode="reflect")
    hb = sum(taps[i] * p[:, i:i + img.shape[1]] for i in range(7))
    gold = sum(taps[j] * hb[j:j + img.shape[0], :] for j in range(7))
    np.testing.assert_allclose(np.asarray(b), gold, atol=5e-3)


def test_frontend_vmem_guard_large_image(rng):
    """extract_features on a > PALLAS_MAX_PIXELS frame must not select the
    grid-less Pallas kernel (it would exceed VMEM on TPU)."""
    from mageslam_tpu.tracking import frontend
    big = (752, 480)
    assert big[0] * big[1] > frontend.PALLAS_MAX_PIXELS
    assert frontend._use_pallas(big, None) is False
    assert frontend._use_pallas(big, True) is False  # guard overrides
    small = (180, 320)
    assert frontend._use_pallas(small, True) is True
    assert frontend._use_pallas(small, False) is False


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
