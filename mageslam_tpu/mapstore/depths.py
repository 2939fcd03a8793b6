"""Per-frame near/far bounding-plane depth estimation.

Equivalent of the reference's Tracking/BoundingPlaneDepths.*
(BoundingPlaneDepths.h:11-12: near/far plane estimate from the observed map
points inside a region of interest, with softness controls —
BoundingDepthSettings, MageSettings.h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mageslam_tpu.config import BoundingDepthSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration, project


import functools


@functools.partial(jax.jit, static_argnames=("settings",))
def bounding_plane_depths(pose7: jnp.ndarray, points: jnp.ndarray,
                          point_mask: jnp.ndarray,
                          cal: CameraCalibration,
                          settings: BoundingDepthSettings = None):
    """Returns (near, far) depths of the masked points whose projections
    land inside the ROI.  Softness blends toward the percentile interior
    (softness 0 = true min/max, like the reference defaults)."""
    s = settings if settings is not None else BoundingDepthSettings()
    uv, z = project(cal, se3.pose_apply(pose7[None], points))
    in_roi = ((uv[:, 0] >= s.roi_min_x * cal.width)
              & (uv[:, 0] <= s.roi_max_x * cal.width)
              & (uv[:, 1] >= s.roi_min_y * cal.height)
              & (uv[:, 1] <= s.roi_max_y * cal.height))
    ok = point_mask & (z > 0) & in_roi
    zs = jnp.where(ok, z, jnp.nan)
    near_hard = jnp.nanmin(zs)
    far_hard = jnp.nanmax(zs)
    near_soft = jnp.nanpercentile(zs, 10)
    far_soft = jnp.nanpercentile(zs, 90)
    near = (1 - s.near_depth_softness) * near_hard \
        + s.near_depth_softness * near_soft
    far = (1 - s.far_depth_softness) * far_hard \
        + s.far_depth_softness * far_soft
    any_ok = jnp.any(ok)
    return (jnp.where(any_ok, near, 0.1),
            jnp.where(any_ok, far, 10.0), any_ok)
