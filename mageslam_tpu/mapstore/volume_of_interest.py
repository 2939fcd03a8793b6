"""Volume of interest: the observed-scene bounding volume.

Equivalent of the reference's VolumeOfInterest/* (VolumeOfInterest.h:15-34:
a voxelized "teardrop" score per keyframe frustum, thresholded and
iteratively refined into an AABB of the observed scene;  queried through
MAGESlam::TryGetVolumeOfInterest, MageSlam.h:178).

TPU shape: each refinement iteration evaluates the full voxel grid against
all frames as one batched (V, N) computation — voxel scoring is pure
elementwise math over broadcasted frustum geometry.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.config import VolumeOfInterestSettings
from mageslam_tpu.geometry import se3


class VolumeOfInterest(NamedTuple):
    min_corner: np.ndarray
    max_corner: np.ndarray
    valid: bool


def _teardrop_score(voxels: jnp.ndarray, pose7: jnp.ndarray,
                    near: jnp.ndarray, far: jnp.ndarray,
                    s: VolumeOfInterestSettings) -> jnp.ndarray:
    """Score of each voxel under one frame's teardrop kernel: max on the
    view axis within [near, far], falling off away from the axis
    (SideProminence) and along it (Away/TowardProminence)."""
    y = se3.pose_apply(pose7[None], voxels)     # camera coords (V, 3)
    z = y[:, 2]
    r = jnp.linalg.norm(y[:, :2], axis=-1)
    depth_range = jnp.maximum(far - near, 1e-3)
    mid = 0.5 * (near + far)
    ahead = (z - mid) / depth_range
    axial = jnp.where(
        ahead >= 0,
        jnp.exp(-0.5 * (ahead / jnp.maximum(s.away_prominence, 1e-3)) ** 2),
        jnp.exp(-0.5 * (ahead
                        / jnp.maximum(s.toward_prominence, 1e-3)) ** 2))
    # lateral falloff relative to the frustum half-width at that depth
    half_w = jnp.tan(s.kernel_angle_x_rads / 2) * jnp.maximum(z, 1e-3)
    lateral = jnp.exp(
        -0.5 * (r / jnp.maximum(half_w * s.side_prominence, 1e-3)) ** 2)
    return jnp.where(z > 0, axial * lateral, 0.0)


@functools.partial(jax.jit, static_argnames=("settings", "grid"))
def score_grid(min_c, max_c, poses, nears, fars, frame_valid,
               settings: VolumeOfInterestSettings, grid: int = 24):
    """(grid^3,) mean teardrop score over frames + the voxel centers."""
    gs = jnp.linspace(0.0, 1.0, grid)
    gx, gy, gz = jnp.meshgrid(gs, gs, gs, indexing="ij")
    unit = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    voxels = min_c + unit * (max_c - min_c)

    def one(pose, near, far, ok):
        return _teardrop_score(voxels, pose, near, far, settings) * ok

    scores = jax.vmap(one)(poses, nears, fars,
                           frame_valid.astype(jnp.float32))
    return jnp.sum(scores, 0) / jnp.maximum(jnp.sum(frame_valid), 1), voxels


def compute_volume_of_interest(poses: np.ndarray, nears: np.ndarray,
                               fars: np.ndarray, valid: np.ndarray,
                               settings: VolumeOfInterestSettings = None
                               ) -> VolumeOfInterest:
    """Iteratively refined AABB of the high-interest region
    (VolumeOfInterestSettings.Iterations increasing-resolution passes)."""
    s = settings if settings is not None else VolumeOfInterestSettings()
    if valid.sum() == 0:
        return VolumeOfInterest(np.zeros(3), np.zeros(3), False)

    centers = np.asarray(se3.camera_center(jnp.asarray(poses)))
    reach = np.maximum(np.asarray(fars), 1.0)[:, None]
    fwd = np.asarray(jax.vmap(
        lambda p: se3.quat_rotate(se3.quat_conj(se3.pose_q(p)),
                                  jnp.array([0.0, 0.0, 1.0])))(
        jnp.asarray(poses)))
    pts = np.concatenate([centers, centers + fwd * reach])
    min_c = pts.min(0) - 1.0
    max_c = pts.max(0) + 1.0

    grid = max(int(round(s.voxel_count_floor ** (1 / 3))), 8)
    for _ in range(max(int(s.iterations), 1)):
        scores, voxels = score_grid(
            jnp.asarray(min_c, jnp.float32), jnp.asarray(max_c, jnp.float32),
            jnp.asarray(poses), jnp.asarray(nears, jnp.float32),
            jnp.asarray(fars, jnp.float32), jnp.asarray(valid), s, grid)
        scores = np.asarray(scores)
        voxels = np.asarray(voxels)
        keep = scores >= s.threshold * max(scores.max(), 1e-9)
        if not keep.any():
            return VolumeOfInterest(min_c, max_c, False)
        sel = voxels[keep]
        span = (max_c - min_c) / (grid - 1)
        min_c = sel.min(0) - span
        max_c = sel.max(0) + span
    return VolumeOfInterest(min_c, max_c, True)
