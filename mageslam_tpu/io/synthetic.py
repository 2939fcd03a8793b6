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
    tex_grid: np.ndarray     # (P, G, G) per-point binary texture pattern

    GRID = 5

    @staticmethod
    def create(num_points: int = 600, seed: int = 7,
               extent=(6.0, 4.0, 3.0), center=(0.0, 0.0, 6.0)
               ) -> "SyntheticWorld":
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1.0, 1.0, size=(num_points, 3)) * np.asarray(extent)
        pts += np.asarray(center)
        inten = rng.uniform(150.0, 250.0, size=num_points)
        sizes = rng.uniform(8.0, 16.0, size=num_points)
        G = SyntheticWorld.GRID
        grid = (rng.random((num_points, G, G)) > 0.45).astype(np.float32)
        # keep the center cell bright so the 3D point itself is on texture
        grid[:, G // 2, G // 2] = 1.0
        return SyntheticWorld(pts.astype(np.float32),
                              inten.astype(np.float32),
                              sizes.astype(np.float32),
                              grid)

    def render(self, cal: CameraCalibration, pose7: np.ndarray,
               noise: float = 1.0, seed: int = 0,
               bg_depth: float = 30.0) -> np.ndarray:
        """Render the world from a view pose as (H, W) float32.

        The background is a textured plane at world z = bg_depth so that
        descriptor patches see geometrically consistent context (pure
        sensor noise would make BRIEF bits random); splats overlay it.
        """
        h, w = cal.height, cal.width
        rng = np.random.default_rng(seed)

        q = np.asarray(pose7[:4], np.float64)
        t = np.asarray(pose7[4:], np.float64)
        R = np.asarray(se3.quat_to_mat(jnp.asarray(q, jnp.float32)))

        # background plane: cast rays to z=bg_depth, sample procedural tex
        fx, fy = float(cal.fx), float(cal.fy)
        cx, cy = float(cal.cx), float(cal.cy)
        vv, uu = np.mgrid[0:h, 0:w]
        rays = np.stack([(uu - cx) / fx, (vv - cy) / fy,
                         np.ones_like(uu, np.float64)], -1)
        rays_w = rays @ R  # R^T applied row-wise
        c = -R.T @ t
        tt = (bg_depth - c[2]) / np.maximum(rays_w[..., 2], 1e-6)
        px = c[0] + tt * rays_w[..., 0]
        py = c[1] + tt * rays_w[..., 1]
        img = (46.0 + 16.0 * np.sin(0.53 * px + 1.21 * py)
               + 13.0 * np.sin(1.87 * px - 0.77 * py + 1.3)
               + 9.0 * np.sin(3.1 * px + 2.3 * py + 4.0)
               + 6.0 * np.sin(6.7 * px - 4.9 * py + 2.2)).astype(np.float32)
        img += rng.normal(0.0, noise, size=(h, w)).astype(np.float32)
        # splats are true world-space planar patches (normal +z, side
        # length = sizes/40 world units): every texture corner is a fixed
        # 3D point, so multi-view geometry is exact (billboards would
        # inject systematic parallax error).  Render far-to-near so nearer
        # patches occlude.
        xc = self.points @ R.T + t
        z = xc[:, 2]
        vis = z > 0.25
        u = fx * xc[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * xc[:, 1] / np.maximum(z, 1e-6) + cy
        vis &= (u > -40) & (u < w + 40) & (v > -40) & (v < h + 40)
        side = self.sizes / 40.0           # world half-side
        G = SyntheticWorld.GRID

        order = np.argsort(-z)  # far first
        for i in order:
            if not vis[i]:
                continue
            pz = self.points[i]
            s_half = side[i]
            # project the 4 patch corners for the pixel bounding box
            corners = pz[None, :] + np.array(
                [[-s_half, -s_half, 0], [s_half, -s_half, 0],
                 [-s_half, s_half, 0], [s_half, s_half, 0]])
            ccam = corners @ R.T + t
            if np.any(ccam[:, 2] < 0.2):
                continue
            cu = fx * ccam[:, 0] / ccam[:, 2] + cx
            cv = fy * ccam[:, 1] / ccam[:, 2] + cy
            xs0, xs1 = max(int(np.floor(cu.min())), 0), \
                min(int(np.ceil(cu.max())) + 1, w)
            ys0, ys1 = max(int(np.floor(cv.min())), 0), \
                min(int(np.ceil(cv.max())) + 1, h)
            if xs1 <= xs0 or ys1 <= ys0:
                continue
            # ray-plane intersection with plane z_world = pz[2]
            yy, xx = np.mgrid[ys0:ys1, xs0:xs1]
            rw = rays_w[ys0:ys1, xs0:xs1]
            denom = rw[..., 2]
            tt_i = (pz[2] - c[2]) / np.where(np.abs(denom) < 1e-9, 1e-9,
                                             denom)
            wx = c[0] + tt_i * rw[..., 0]
            wy = c[1] + tt_i * rw[..., 1]
            un = (wx - pz[0]) / (2 * s_half) + 0.5
            vn = (wy - pz[1]) / (2 * s_half) + 0.5
            inside = (un >= 0) & (un < 1) & (vn >= 0) & (vn < 1) & (tt_i > 0)
            if not inside.any():
                continue
            gi = np.clip((un * G).astype(int), 0, G - 1)
            gj = np.clip((vn * G).astype(int), 0, G - 1)
            cell = self.tex_grid[i][gj, gi]
            tex = self.intensities[i] * (0.12 + 0.88 * cell)
            patch = img[ys0:ys1, xs0:xs1]
            img[ys0:ys1, xs0:xs1] = np.where(inside, tex, patch)
        return np.clip(img, 0.0, 255.0)


def default_calibration(width: int = 320, height: int = 180
                        ) -> CameraCalibration:
    f = 0.85 * width
    return CameraCalibration.pinhole(f, f, width / 2.0, height / 2.0,
                                     width, height)


def orbit_trajectory(num_frames: int, radius: float = 0.8,
                     forward: float = 0.012,
                     look_at=(0.0, 0.0, 6.0),
                     sweep: float = 0.35) -> np.ndarray:
    """(T, 7) view poses: gentle lateral arc with forward drift, always
    looking roughly at the cloud center — plenty of parallax for init."""
    poses = []
    target = np.asarray(look_at, np.float64)
    for i in range(num_frames):
        ang = sweep * np.sin(2 * np.pi * i / max(num_frames - 1, 1) * 0.5)
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
