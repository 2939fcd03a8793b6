"""Image-pixel undistortion remap (Tasks/ImageAnalyzer.cpp:26-51 branch)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry.camera import (CameraCalibration,
                                          distort_normalized)
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.ops import undistort
from mageslam_tpu.tracking.frontend import extract_for_settings

from test_slam_e2e import fast_settings


def _distorted_cal():
    return CameraCalibration.poly3k(272.0, 272.0, 160.0, 90.0,
                                    -0.28, 0.07, 0.0, 320, 180)


class TestUndistortImage:
    def test_identity_when_pinhole(self):
        world = SyntheticWorld.create(300, seed=3)
        cal = default_calibration()
        img = jnp.asarray(world.render(cal, orbit_trajectory(2)[0],
                                       seed=4))
        out = undistort.undistort_image(img, cal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-4)

    def test_rectifies_distorted_render(self):
        """Render through a pinhole, apply a known distortion warp, then
        rectify: the result must match the pinhole render where the
        distorted source covers the output."""
        world = SyntheticWorld.create(300, seed=3)
        pin = default_calibration()
        cal_d = _distorted_cal()
        img_pin = np.asarray(world.render(pin, orbit_trajectory(2)[0],
                                          seed=4))
        # synthesize a distorted capture: sample the pinhole image at the
        # FORWARD-distorted position of every distorted-capture pixel...
        # i.e. warp img_pin by the inverse remap.  Build it with the same
        # camera math the module uses, but through the *keypoint* inverse
        # (independent path).
        from mageslam_tpu.geometry.camera import undistort_normalized
        h, w = img_pin.shape
        v, u = np.mgrid[0:h, 0:w]
        xd = np.stack([(u - 160.0) / 272.0, (v - 90.0) / 272.0],
                      -1).astype(np.float32)
        xn = np.asarray(undistort_normalized(cal_d,
                                             jnp.asarray(xd.reshape(-1, 2)))
                        ).reshape(h, w, 2)
        gx = np.clip(xn[..., 0] * 272.0 + 160.0, 0, w - 1)
        gy = np.clip(xn[..., 1] * 272.0 + 90.0, 0, h - 1)
        img_dist = img_pin[gy.round().astype(int), gx.round().astype(int)]
        rect = np.asarray(undistort.undistort_image(
            jnp.asarray(img_dist), cal_d))
        # compare central region (border pixels clamp)
        c = (slice(40, 140), slice(60, 260))
        err = np.abs(rect[c] - img_pin[c])
        assert np.median(err) < 8.0, np.median(err)

    def test_frontend_dispatch(self):
        """undistort_image_pixels routes the frontend through the
        rectified-image branch and still produces valid features."""
        world = SyntheticWorld.create(300, seed=3)
        cal = _distorted_cal()
        img = jnp.asarray(world.render(default_calibration(),
                                       orbit_trajectory(2)[0], seed=4))
        s = fast_settings()
        cam = dataclasses.replace(s.mono.camera,
                                  undistort_image_pixels=True)
        f = extract_for_settings(img, cal, cam, 256)
        assert int(f.count) > 50
        assert bool(jnp.all(jnp.isfinite(f.uv)))
        # rectified branch: xn == plain pinhole unprojection of uv
        sel = np.asarray(f.valid)
        uv = np.asarray(f.uv)[sel]
        xn = np.asarray(f.xn_undist)[sel]
        np.testing.assert_allclose(
            xn, np.stack([(uv[:, 0] - 160.0) / 272.0,
                          (uv[:, 1] - 90.0) / 272.0], -1), atol=1e-4)
