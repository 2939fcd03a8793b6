"""IMU integration + visual-inertial fusion manager.

Equivalent of the reference's buildable fuser pieces and interfaces:
  - Fuser/UnfilteredIMU.* (UnfilteredIMU.h:15-25): direct gyro/accel
    integration producing delta poses between image fences
  - Fuser/PoseInterpolator.* (PoseInterpolator.h:14-24): pose at arbitrary
    timestamps from bracketing samples
  - Fuser/Fuser.h:20-114: the fusion manager mode machine
    (WaitForMageInit -> GravityConverge -> ScaleInit -> Tracking,
    FuserWorker.cpp:44-70), gravity/scale extraction, visual updates.

NOTE: the reference *ships stubs* for the real Kalman filters — the build
compiles FuserStubs.cpp (every method throws, CMakeLists.txt:57-58) because
the ST:: filters aren't open-sourced.  This module therefore implements the
full buildable surface (direct integration, gravity averaging, scale from
visual/inertial displacement ratio) — strictly more than the reference's
public build provides.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Optional

import numpy as np

import jax.numpy as jnp

from mageslam_tpu.geometry import se3

GRAVITY = 9.80665


class FuserMode(IntEnum):  # Fuser.h mode machine
    INACTIVE = 0
    WAIT_FOR_MAGE_INIT = 1
    GRAVITY_CONVERGE = 2
    SCALE_INIT = 3
    TRACKING = 4
    VISUAL_TRACKING_LOST = 5


def integrate_gyro(q0: np.ndarray, gyro: np.ndarray) -> np.ndarray:
    """Integrate body-frame gyro samples [(t, wx, wy, wz), ...] from
    orientation q0 (world->body).  Returns final quaternion."""
    q = jnp.asarray(q0, jnp.float32)
    for i in range(len(gyro) - 1):
        dt = float(gyro[i + 1, 0] - gyro[i, 0])
        w = jnp.asarray(gyro[i, 1:4], jnp.float32)
        dq = se3.so3_exp(w * dt)
        q = se3.quat_normalize(se3.quat_mul(q, dq))
    return np.asarray(q)


def integrate_accel(accel: np.ndarray, q_wb: np.ndarray,
                    gravity_w: np.ndarray, v0: np.ndarray):
    """Double-integrate accel samples [(t, ax, ay, az), ...] given a fixed
    body orientation (coarse — per-fence window), world gravity, and an
    initial velocity.  Returns (delta_p, v1)."""
    p = np.zeros(3)
    v = np.asarray(v0, np.float64).copy()
    R = np.asarray(se3.quat_to_mat(jnp.asarray(q_wb, jnp.float32)))
    for i in range(len(accel) - 1):
        dt = float(accel[i + 1, 0] - accel[i, 0])
        a_w = R @ np.asarray(accel[i, 1:4]) - gravity_w
        p += v * dt + 0.5 * a_w * dt * dt
        v += a_w * dt
    return p, v


@dataclasses.dataclass
class UnfilteredIMU:
    """Direct integrator between image fences (UnfilteredIMU.h:15-25)."""

    q_wb: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0, 0, 0]))
    v: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    gravity_w: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, -GRAVITY, 0.0]))

    def step(self, accel: np.ndarray, gyro: np.ndarray):
        """Integrate one fence window; returns (delta_rotation_q, delta_p)."""
        q0 = self.q_wb.copy()
        if len(gyro) >= 2:
            self.q_wb = integrate_gyro(self.q_wb, gyro)
        dp = np.zeros(3)
        if len(accel) >= 2:
            dp, self.v = integrate_accel(accel, q0, self.gravity_w, self.v)
        dq = np.asarray(se3.quat_mul(
            se3.quat_conj(jnp.asarray(q0, jnp.float32)),
            jnp.asarray(self.q_wb, jnp.float32)))
        return dq, dp


class PoseInterpolator:
    """Pose at arbitrary timestamps by interpolating a pose track
    (PoseInterpolator.h:14-24)."""

    def __init__(self):
        self._ts: list[float] = []
        self._poses: list[np.ndarray] = []

    def add(self, timestamp: float, pose7: np.ndarray):
        self._ts.append(timestamp)
        self._poses.append(np.asarray(pose7))

    def pose_at(self, timestamp: float) -> Optional[np.ndarray]:
        if not self._ts:
            return None
        ts = np.asarray(self._ts)
        i = int(np.searchsorted(ts, timestamp))
        if i == 0:
            return self._poses[0]
        if i >= len(ts):
            return self._poses[-1]
        a = (timestamp - ts[i - 1]) / max(ts[i] - ts[i - 1], 1e-9)
        return np.asarray(se3.pose_interpolate(
            jnp.asarray(self._poses[i - 1]), jnp.asarray(self._poses[i]),
            float(a)))


class Fuser:
    """Visual-inertial fusion manager (Fuser.h:20-114 surface).

    Gravity: averaged accelerometer direction while converging.
    Scale: ratio of IMU-integrated displacement to visual displacement
    accumulated over the ScaleInit window.
    """

    def __init__(self, gravity_samples_needed: int = 60,
                 scale_windows_needed: int = 10):
        self.mode = FuserMode.WAIT_FOR_MAGE_INIT
        self._grav_accum = np.zeros(3)
        self._grav_count = 0
        self._grav_needed = gravity_samples_needed
        self._imu = UnfilteredIMU()
        self._scale_num = 0.0
        self._scale_den = 0.0
        self._scale_windows = 0
        self._scale_needed = scale_windows_needed
        self._last_visual_pose: Optional[np.ndarray] = None

    # --- queries (MageSlam.h:168-176 gravity/scale) -------------------
    @property
    def has_gravity(self) -> bool:
        return self.mode.value >= FuserMode.SCALE_INIT.value

    @property
    def gravity_w(self) -> Optional[np.ndarray]:
        if not self.has_gravity:
            return None
        return self._imu.gravity_w

    @property
    def has_scale(self) -> bool:
        return self.mode == FuserMode.TRACKING

    @property
    def scale(self) -> Optional[float]:
        if not self.has_scale or self._scale_den <= 0:
            return None
        return self._scale_num / self._scale_den

    # --- events -------------------------------------------------------
    def on_mage_initialized(self):
        if self.mode == FuserMode.WAIT_FOR_MAGE_INIT:
            self.mode = FuserMode.GRAVITY_CONVERGE

    def on_visual_lost(self):
        if self.mode == FuserMode.TRACKING:
            self.mode = FuserMode.VISUAL_TRACKING_LOST

    def on_visual_reacquired(self):
        if self.mode == FuserMode.VISUAL_TRACKING_LOST:
            self.mode = FuserMode.TRACKING

    def process_fence(self, accel: np.ndarray, gyro: np.ndarray,
                      visual_pose: Optional[np.ndarray]):
        """Consume one image-fence window of samples + the visual pose."""
        if self.mode == FuserMode.GRAVITY_CONVERGE and len(accel):
            self._grav_accum += accel[:, 1:4].sum(axis=0)
            self._grav_count += len(accel)
            if self._grav_count >= self._grav_needed:
                g = self._grav_accum / max(np.linalg.norm(self._grav_accum),
                                           1e-9)
                self._imu.gravity_w = g * GRAVITY
                self.mode = FuserMode.SCALE_INIT
            return

        if self.mode in (FuserMode.SCALE_INIT, FuserMode.TRACKING):
            dq, dp = self._imu.step(accel, gyro)
            if visual_pose is not None and \
                    self._last_visual_pose is not None:
                c0 = np.asarray(se3.camera_center(
                    jnp.asarray(self._last_visual_pose)))
                c1 = np.asarray(se3.camera_center(jnp.asarray(visual_pose)))
                self._scale_num += float(np.linalg.norm(dp))
                self._scale_den += float(np.linalg.norm(c1 - c0))
                self._scale_windows += 1
                if self.mode == FuserMode.SCALE_INIT and \
                        self._scale_windows >= self._scale_needed:
                    self.mode = FuserMode.TRACKING
            if visual_pose is not None:
                self._last_visual_pose = visual_pose
