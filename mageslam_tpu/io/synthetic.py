"""Synthetic scene + sequence generation for tests and benchmarks.

The reference's golden path consumes an OpenCV video (Apps/Console/
console.cpp:291-341).  With no camera or dataset on the box, this module
renders deterministic synthetic sequences with exact ground truth:

  - ``SyntheticWorld``: a random 3D point cloud with per-point intensity
    "texture"; ``render`` splats each visible point as a small bright square
    (strong FAST corners at all four square corners plus texture gradient)
    onto a noisy background, producing images the real frontend tracks.
  - trajectories: smooth orbits / arcs with known view poses, so ATE is
    measurable without EuRoC/TUM.

Everything is numpy on the host (data generation is not a device workload);
images come back as float32 (H, W) in [0, 255].
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration

import jax.numpy as jnp


@dataclass
class SyntheticWorld:
    points: np.ndarray       # (P, 3) world points
    intensities: np.ndarray  # (P,) point brightness
    sizes: np.ndarray        # (P,) splat half-size in px at depth 1

    @staticmethod
    def create(num_points: int = 600, seed: int = 7,
               extent=(6.0, 4.0, 3.0), center=(0.0, 0.0, 6.0)
               ) -> "SyntheticWorld":
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1.0, 1.0, size=(num_points, 3)) * np.asarray(extent)
        pts += np.asarray(center)
        inten = rng.uniform(90.0, 250.0, size=num_points)
        sizes = rng.uniform(2.0, 5.0, size=num_points)
        return SyntheticWorld(pts.astype(np.float32),
                              inten.astype(np.float32),
                              sizes.astype(np.float32))

    def render(self, cal: CameraCalibration, pose7: np.ndarray,
               noise: float = 2.0, seed: int = 0) -> np.ndarray:
        """Render the world from a view pose as (H, W) float32."""
        h, w = cal.height, cal.width
        rng = np.random.default_rng(seed)
        img = rng.normal(28.0, noise, size=(h, w)).astype(np.float32)

        q = np.asarray(pose7[:4], np.float64)
        t = np.asarray(pose7[4:], np.float64)
        R = np.asarray(se3.quat_to_mat(jnp.asarray(q, jnp.float32)))
        xc = self.points @ R.T + t
        z = xc[:, 2]
        vis = z > 0.25
        fx, fy = float(cal.fx), float(cal.fy)
        cx, cy = float(cal.cx), float(cal.cy)
        u = fx * xc[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * xc[:, 1] / np.maximum(z, 1e-6) + cy
        # splat size shrinks with depth
        half = np.clip(self.sizes * 2.0 / np.maximum(z, 0.3), 1.0, 6.0)
        vis &= (u > -8) & (u < w + 8) & (v > -8) & (v < h + 8)

        for i in np.nonzero(vis)[0]:
            hw = int(round(half[i]))
            x0, x1 = int(round(u[i])) - hw, int(round(u[i])) + hw + 1
            y0, y1 = int(round(v[i])) - hw, int(round(v[i])) + hw + 1
            xs0, ys0 = max(x0, 0), max(y0, 0)
            xs1, ys1 = min(x1, w), min(y1, h)
            if xs1 <= xs0 or ys1 <= ys0:
                continue
            # per-point fixed texture: brightness ramp keyed on point id
            yy, xx = np.mgrid[ys0:ys1, xs0:xs1]
            ramp = 1.0 - 0.35 * ((xx - x0) % 7) / 7.0
            img[ys0:ys1, xs0:xs1] = np.maximum(
                img[ys0:ys1, xs0:xs1], self.intensities[i] * ramp)
        return np.clip(img, 0.0, 255.0)


def default_calibration(width: int = 320, height: int = 180
                        ) -> CameraCalibration:
    f = 0.85 * width
    return CameraCalibration.pinhole(f, f, width / 2.0, height / 2.0,
                                     width, height)


def orbit_trajectory(num_frames: int, radius: float = 0.8,
                     forward: float = 0.012,
                     look_at=(0.0, 0.0, 6.0)) -> np.ndarray:
    """(T, 7) view poses: gentle lateral arc with forward drift, always
    looking roughly at the cloud center — plenty of parallax for init."""
    poses = []
    target = np.asarray(look_at, np.float64)
    for i in range(num_frames):
        ang = 0.35 * np.sin(2 * np.pi * i / max(num_frames - 1, 1) * 0.5)
        c = np.array([radius * np.sin(ang), 0.25 * np.sin(ang * 2.0),
                      forward * i])
        fwd = target - c
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        # camera-from-world rotation: rows are camera axes
        Rcw = np.stack([right, upv, fwd])
        t = -Rcw @ c
        q = np.asarray(se3.mat_to_quat(jnp.asarray(Rcw, jnp.float32)))
        poses.append(np.concatenate([q, t]))
    return np.asarray(poses, np.float32)


def render_sequence(world: SyntheticWorld, cal: CameraCalibration,
                    poses: np.ndarray, noise: float = 2.0):
    """Yields (frame_idx, image, gt_pose7)."""
    for i, p in enumerate(poses):
        yield i, world.render(cal, p, noise=noise, seed=100 + i), p
