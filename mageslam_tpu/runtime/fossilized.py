"""FossilizedMap — immutable post-run trajectory and map queries.

Equivalent of the reference's FossilizedMap (MAGESlam.cpp:385-441: offline
GetTrackingResultsForFrames + volume-of-interest queries after Fossilize
stops all workers and runs the final global BA) and the Console app's CSV
export of 4x4 poses (Apps/Console/console.cpp:15-54), which feeds the
Babylon.js drag-and-drop visualizer (docs/Visualizers/fossil_visualizer.html).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.mapstore import pose_history as ph


@dataclasses.dataclass(frozen=True)
class FossilizedMap:
    frame_ids: np.ndarray     # (N,) int32, sorted
    timestamps: np.ndarray    # (N,)
    poses: np.ndarray         # (N, 7) view poses after final global BA
    map_points: np.ndarray    # (P, 3) world points
    keyframe_poses: np.ndarray  # (Q, 7)
    keyframe_frame_ids: np.ndarray  # (Q,)

    @staticmethod
    def from_state(m, history) -> "FossilizedMap":
        """Build from a (MapState, PoseHistory) pair — works for both the
        host engine and the fused device engine's EngineState fields."""
        poses, ok = ph.world_poses(history, m.kf_pose, m.kf_valid)
        ok = np.asarray(ok)
        fid = np.asarray(history.frame_id)[ok]
        ts = np.asarray(history.timestamp)[ok]
        pw = np.asarray(poses)[ok]
        order = np.argsort(fid, kind="stable")
        kf_ok = np.asarray(m.kf_valid)
        return FossilizedMap(
            frame_ids=fid[order],
            timestamps=ts[order],
            poses=pw[order],
            map_points=np.asarray(m.mp_pos)[np.asarray(m.mp_valid)],
            keyframe_poses=np.asarray(m.kf_pose)[kf_ok],
            keyframe_frame_ids=np.asarray(m.kf_frame_id)[kf_ok],
        )

    @staticmethod
    def from_engine(engine) -> "FossilizedMap":
        return FossilizedMap.from_state(engine.map_state, engine._history)

    def pose_for_frame(self, frame_id: int) -> Optional[np.ndarray]:
        i = np.searchsorted(self.frame_ids, frame_id)
        if i < len(self.frame_ids) and self.frame_ids[i] == frame_id:
            return self.poses[i]
        return None

    def camera_centers(self) -> np.ndarray:
        return np.asarray(se3.camera_center(jnp.asarray(self.poses)))

    def world_from_camera_mats(self) -> np.ndarray:
        """(N, 4, 4) camera-to-world transforms (visualizer convention)."""
        return np.asarray(se3.pose_to_mat44(
            jnp.asarray(np.stack([
                np.asarray(se3.pose_inverse(jnp.asarray(p)))
                for p in self.poses]) if len(self.poses) else
                np.zeros((0, 7), np.float32))))

    def export_csv(self, path: str):
        """CSV of flattened 4x4 world-from-camera matrices per frame —
        the Console app's fossil format (console.cpp:15-54)."""
        mats = self.world_from_camera_mats()
        with open(path, "w") as f:
            for fid, m44 in zip(self.frame_ids, mats):
                flat = ",".join(f"{v:.9g}" for v in m44.reshape(-1))
                f.write(f"{fid},{flat}\n")

    def export_tum(self, path: str):
        """TUM trajectory format (timestamp tx ty tz qx qy qz qw, camera-to-
        world) for standard ATE evaluators."""
        with open(path, "w") as f:
            for ts, p in zip(self.timestamps, self.poses):
                inv = np.asarray(se3.pose_inverse(jnp.asarray(p)))
                qw, qx, qy, qz, tx, ty, tz = inv
                f.write(f"{ts:.6f} {tx:.9g} {ty:.9g} {tz:.9g} "
                        f"{qx:.9g} {qy:.9g} {qz:.9g} {qw:.9g}\n")
