"""Frontend kernel tests: FAST, selection, descriptors, matching."""

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.ops import fast, matching, orb, pyramid, select
from mageslam_tpu.tracking.frontend import extract_features


def corner_image(h=64, w=96):
    """Dark background with one bright square -> 4 strong corners."""
    img = np.full((h, w), 20.0, np.float32)
    img[20:40, 30:60] = 200.0
    return img


class TestFast:
    def test_detects_square_corners(self):
        img = jnp.asarray(corner_image())
        score = fast.detect(img, 20.0)
        ys, xs = np.nonzero(np.asarray(score))
        assert len(ys) >= 4
        corners = {(30, 20), (59, 20), (30, 39), (59, 39)}
        found = set(zip(xs.tolist(), ys.tolist()))
        # each true corner has a detection within 2 px
        for cx, cy in corners:
            assert any(abs(fx - cx) <= 2 and abs(fy - cy) <= 2
                       for fx, fy in found), (cx, cy)

    def test_flat_image_no_corners(self):
        img = jnp.full((32, 32), 100.0)
        score = fast.detect(img, 10.0)
        assert float(jnp.sum(score)) == 0.0

    def test_threshold_monotonic(self):
        img = jnp.asarray(corner_image())
        n_low = int(jnp.sum(fast.detect(img, 5.0) > 0))
        n_high = int(jnp.sum(fast.detect(img, 60.0) > 0))
        assert n_high <= n_low

    def test_score_reference_naive(self, rng):
        """FAST score map matches a naive numpy implementation."""
        img = rng.uniform(0, 255, size=(24, 24)).astype(np.float32)
        t = 10.0
        got = np.asarray(fast.fast_score_map(jnp.asarray(img), t))
        offs = fast.CIRCLE_OFFSETS
        for y in range(3, 21):
            for x in range(3, 21):
                c = np.array([img[y + dy, x + dx] for dx, dy in offs])
                db = c - img[y, x] - t
                dk = img[y, x] - c - t

                def arc(d):
                    dd = np.concatenate([d, d[:8]])
                    return max(np.min(dd[k:k + 9]) for k in range(16))

                expect = max(arc(db), arc(dk), 0.0)
                assert abs(got[y, x] - expect) < 1e-3, (x, y)


class TestSelect:
    def test_topk_positions(self):
        img = jnp.asarray(corner_image())
        score = fast.detect(img, 20.0)
        kps = select.select_topk(score, 16)
        n = int(jnp.sum(kps.valid))
        assert n >= 4
        s = np.asarray(score)
        for i in range(n):
            x, y = np.asarray(kps.uv[i]).astype(int)
            assert s[y, x] > 0

    def test_gridded_spreads(self, rng):
        # many corners in one quadrant, a few in another; gridding keeps both
        img = np.full((64, 64), 20.0, np.float32)
        img[4:28, 4:28] = 0.0
        for i in range(5):
            img[6 + i * 4: 8 + i * 4, 6 + i * 4: 8 + i * 4] = 200.0
        img[50:60, 50:60] = 180.0
        score = fast.detect(jnp.asarray(img), 20.0)
        kps = select.select_gridded(score, 8, cells_x=4, cells_y=4,
                                    per_cell=2)
        uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
        assert np.any((uv[:, 0] > 45) & (uv[:, 1] > 45))


class TestOrb:
    def test_descriptor_shape_and_determinism(self):
        img = jnp.asarray(corner_image())
        smooth = pyramid.gaussian_blur(img, 7)
        uv = jnp.array([[30.0, 20.0], [59.0, 39.0]])
        ang = orb.compute_orientations(smooth, uv)
        d1 = orb.compute_descriptors(smooth, uv, ang, True)
        d2 = orb.compute_descriptors(smooth, uv, ang, True)
        assert d1.shape == (2, 8) and d1.dtype == jnp.uint32
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_different_patches_different_desc(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (64, 96)).astype(np.float32))
        smooth = pyramid.gaussian_blur(img, 7)
        uv = jnp.array([[20.0, 20.0], [70.0, 40.0]])
        ang = jnp.zeros(2)
        d = orb.compute_descriptors(smooth, uv, ang, False)
        dist = matching.hamming_matrix(d, d)
        assert int(dist[0, 0]) == 0
        assert int(dist[0, 1]) > 40  # random patches ⇒ ~128 expected

    def test_orientation_rotates(self):
        # a gradient patch: orientation should follow the bright direction
        img = np.zeros((64, 64), np.float32)
        img[:, 40:] = 200.0  # bright to the +x side
        ang = orb.compute_orientations(jnp.asarray(img),
                                       jnp.array([[38.0, 32.0]]))
        assert abs(float(ang[0])) < 0.3  # pointing toward +x: angle ~ 0


class TestMatching:
    def test_hamming_known(self):
        a = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        b = jnp.array([[0xFFFFFFFF] * 8, [0] * 8], jnp.uint32)
        d = matching.hamming_matrix(a, b)
        np.testing.assert_array_equal(np.asarray(d), [[256, 0]])

    def test_match_identity(self, rng):
        desc = jnp.asarray(
            rng.integers(0, 2**32, size=(40, 8), dtype=np.uint32))
        valid = jnp.ones(40, bool)
        idx, dist = matching.match(desc, desc, valid, valid,
                                   max_distance=30, min_difference=1)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(40))
        np.testing.assert_array_equal(np.asarray(dist), np.zeros(40))

    def test_match_respects_validity(self, rng):
        desc = jnp.asarray(
            rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32))
        va = jnp.ones(10, bool)
        vb = jnp.zeros(10, bool)
        idx, _ = matching.match(desc, desc, va, vb)
        np.testing.assert_array_equal(np.asarray(idx), -np.ones(10))

    def test_radius_match_gates_distance(self, rng):
        desc = jnp.asarray(
            rng.integers(0, 2**32, size=(5, 8), dtype=np.uint32))
        q_uv = jnp.asarray(np.array([[0, 0], [100, 100], [10, 10],
                                     [50, 50], [200, 200]], np.float32))
        t_uv = q_uv + 3.0
        valid = jnp.ones(5, bool)
        idx, _ = matching.radius_match(q_uv, desc, valid, t_uv, desc, valid,
                                       radius=10.0)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(5))
        idx2, _ = matching.radius_match(q_uv, desc, valid, t_uv, desc, valid,
                                        radius=1.0)
        np.testing.assert_array_equal(np.asarray(idx2), -np.ones(5))

    def test_assign_unique(self):
        idx = jnp.array([2, 2, 3, -1], jnp.int32)
        dist = jnp.array([5, 3, 1, 9], jnp.int32)
        out = np.asarray(matching.assign_unique(idx, dist))
        np.testing.assert_array_equal(out, [-1, 2, 3, -1])


class TestEndToEndFrontend:
    def test_extract_and_match_consecutive(self):
        world = SyntheticWorld.create(300)
        cal = default_calibration()
        poses = orbit_trajectory(2)
        img0 = world.render(cal, poses[0], seed=1)
        img1 = world.render(cal, poses[1], seed=2)
        f0 = extract_features(jnp.asarray(img0), cal, 12.0, max_features=256)
        f1 = extract_features(jnp.asarray(img1), cal, 12.0, max_features=256)
        n0 = int(f0.count)
        n1 = int(f1.count)
        assert n0 > 80 and n1 > 80
        idx, dist = matching.match(f0.desc, f1.desc, f0.valid, f1.valid,
                                   max_distance=60, min_difference=1)
        n_match = int(matching.match_count(idx))
        assert n_match > 40
