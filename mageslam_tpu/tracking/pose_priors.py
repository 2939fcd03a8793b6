"""Pose prior provider strategies (motion model / IMU).

Equivalent of the reference's strategy interface and its two
implementations:
- IPosePriorProvider::GetPoseForTime (Tracking/IPosePriorProvider.h)
- MotionModelPriorProvider (Tasks/MotionModelPriorProvider.cpp:13-17 →
  EstimateNextPoseFromHistory, PoseEstimator.cpp:84+): constant-velocity
  extrapolation in time from the last two tracked poses.
- IMUPosePriorProvider (Tasks/IMUPosePriorProvider.*): feeds IMU samples
  and integrates rotation (the CAS-filter-backed variant is commented out
  in the reference, Runtime.cpp:450-477; the buildable piece is the direct
  integrator, Fuser/UnfilteredIMU.h:15-25).

Providers are host-side strategy objects (they sit between jitted steps);
the math they call is jitted SE(3) code.
"""

from __future__ import annotations

from typing import Optional, Protocol

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.fuser.imu import UnfilteredIMU
from mageslam_tpu.geometry import se3


class IPosePriorProvider(Protocol):
    def get_pose_for_time(self, timestamp: float) -> Optional[jnp.ndarray]:
        """Predicted view pose (7,) for the given time, or None."""

    def on_tracking_pose(self, timestamp: float, pose: jnp.ndarray) -> None:
        """Observe a confirmed tracked pose (PoseRefined event)."""


class MotionModelPriorProvider:
    """Constant-velocity extrapolation, time-scaled: the relative motion of
    the last two tracked poses is scaled by dt ratio and applied forward."""

    def __init__(self):
        self._t1: Optional[float] = None
        self._t2: Optional[float] = None
        self._p1: Optional[jnp.ndarray] = None   # most recent
        self._p2: Optional[jnp.ndarray] = None

    def on_tracking_pose(self, timestamp: float, pose: jnp.ndarray) -> None:
        self._t2, self._p2 = self._t1, self._p1
        self._t1, self._p1 = float(timestamp), jnp.asarray(pose)

    def get_pose_for_time(self, timestamp: float) -> Optional[jnp.ndarray]:
        if self._p1 is None:
            return None
        if self._p2 is None or self._t1 == self._t2:
            return self._p1
        steps = (float(timestamp) - self._t1) / (self._t1 - self._t2)
        return se3.constant_velocity_extrapolate(self._p2, self._p1,
                                                 steps=max(steps, 0.0))

    def reset(self):
        self.__init__()


class IMUPosePriorProvider:
    """Gyro-integrated rotation prior on top of the last visual pose.

    AddSample feeds raw samples (IMUPosePriorProvider::AddSample analog);
    between visual fixes the accumulated body rotation is composed onto the
    last tracked view pose. Translation falls back to constant position
    (double-integrated accel is unusable without a filter — the reference
    stubs that path too, FuserStubs.cpp).
    """

    def __init__(self, body_to_camera: Optional[np.ndarray] = None):
        self._imu = UnfilteredIMU()
        self._gyro_buf: list = []     # [(t, wx, wy, wz)] since last fence
        self._anchor_pose: Optional[jnp.ndarray] = None
        self._q_at_anchor = np.array([1.0, 0, 0, 0], np.float32)
        self._r_bc = (np.eye(3, dtype=np.float32)
                      if body_to_camera is None
                      else np.asarray(body_to_camera,
                                      np.float32)[:3, :3])

    def add_sample(self, timestamp: float, gyro_xyz) -> None:
        self._gyro_buf.append((float(timestamp), *map(float, gyro_xyz)))

    def _integrate_pending(self):
        if len(self._gyro_buf) >= 2:
            self._imu.step(np.zeros((0, 4), np.float32),
                           np.asarray(self._gyro_buf, np.float32))
            self._gyro_buf = self._gyro_buf[-1:]

    def on_tracking_pose(self, timestamp: float, pose: jnp.ndarray) -> None:
        self._integrate_pending()
        self._anchor_pose = jnp.asarray(pose)
        self._q_at_anchor = np.array(self._imu.q_wb, np.float32)

    def get_pose_for_time(self, timestamp: float) -> Optional[jnp.ndarray]:
        if self._anchor_pose is None:
            return None
        self._integrate_pending()
        # body rotation accumulated since the anchor, mapped to camera frame
        q0 = jnp.asarray(self._q_at_anchor, jnp.float32)
        q1 = jnp.asarray(self._imu.q_wb, jnp.float32)
        dq_body = se3.quat_mul(se3.quat_conj(q0), q1)
        r_bc = jnp.asarray(self._r_bc)
        dq_cam = se3.mat_to_quat(
            r_bc @ se3.quat_to_mat(dq_body) @ r_bc.T)
        # view pose: world->cam; a body rotation dq maps to right-compose
        # of the inverse camera delta
        q_anchor = se3.pose_q(self._anchor_pose)
        t_anchor = se3.pose_t(self._anchor_pose)
        q_new = se3.quat_mul(se3.quat_conj(dq_cam), q_anchor)
        return se3.make_pose(q_new, t_anchor)
