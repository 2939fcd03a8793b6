"""SkeletonKey: privileged inspector over a live engine + introspection bus.

Equivalent of the reference's debugging side door
(Core/MAGESLAM/Source/Debugging/SkeletonKey.h:29-52: privileged access to
the live map / pose history / fuser, crafted via a backdoor lambda in
MAGESlam.cpp:132-160) and the Introspection fan-out
(Debugging/Introspection.h:13-40: registered introspectors receive frame /
map events).

Works against either host engine (runtime/slam.MageSlamTPU,
runtime/fused.MageSlamTPUFused) — both expose ``map_state``; the fused
engine's full EngineState is reachable through ``_state``. All getters pull
small arrays to host; the engine is never mutated.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import numpy as np

from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.utils.tracing import SkeletonLogger


class Introspector:
    """Base observer (Debugging/Introspection.h). Override any hook."""

    def on_frame(self, frame_id: int, state: Any, pose):   # pragma: no cover
        pass

    def on_map_snapshot(self, snapshot: dict):              # pragma: no cover
        pass


class Introspection:
    """Fan-out to registered introspectors."""

    def __init__(self):
        self._sinks: List[Introspector] = []

    def register(self, sink: Introspector):
        self._sinks.append(sink)

    def introspect_frame(self, frame_id: int, state: Any, pose):
        for s in self._sinks:
            s.on_frame(frame_id, state, pose)

    def introspect_map(self, snapshot: dict):
        for s in self._sinks:
            s.on_map_snapshot(snapshot)


def craft_skeleton_key(engine) -> "SkeletonKey":
    """CraftSkeletonKey(MAGESlam&) analog (SkeletonKey.h:50)."""
    return SkeletonKey(engine)


class SkeletonKey:
    def __init__(self, engine,
                 logger: Optional[SkeletonLogger] = None):
        self._engine = engine
        self.logger = logger or SkeletonLogger()
        self.introspection = Introspection()

    # --- live map access (GetMapPoints / GetKeyframes analogs) ---------
    @property
    def map_state(self) -> ms.MapState:
        return self._engine.map_state

    def get_map_points(self) -> np.ndarray:
        m = self.map_state
        valid = np.asarray(m.mp_valid)
        return np.asarray(m.mp_pos)[valid]

    def get_keyframe_poses(self) -> np.ndarray:
        m = self.map_state
        valid = np.asarray(m.kf_valid)
        return np.asarray(m.kf_pose)[valid]

    def get_keyframe_frame_ids(self) -> np.ndarray:
        m = self.map_state
        return np.asarray(m.kf_frame_id)[np.asarray(m.kf_valid)]

    def get_covisibility(self) -> np.ndarray:
        m = self.map_state
        valid = np.asarray(m.kf_valid)
        cov = np.asarray(ms.covisibility(m))
        return cov[np.ix_(valid, valid)]

    def get_spanning_tree(self):
        from mageslam_tpu.mapstore import spanning_tree as st
        return st.spanning_tree(self.map_state)

    # --- pose history / trajectory --------------------------------------
    def get_trajectory(self):
        """(frame_ids, (N, 7) world poses) of the tracked history."""
        from mageslam_tpu.mapstore import pose_history as ph
        hist = getattr(self._engine, "_history", None)
        if hist is None:  # fused engine keeps history inside EngineState
            hist = self._engine._state.history
        m = self.map_state
        poses, ok = ph.world_poses(hist, m.kf_pose, m.kf_valid)
        okn = np.asarray(ok)
        return (np.asarray(hist.frame_id)[okn], np.asarray(poses)[okn])

    # --- fuser ----------------------------------------------------------
    def get_fuser(self):
        return getattr(self._engine, "_fuser", None)

    # --- snapshot + introspection fan-out -------------------------------
    def snapshot(self) -> dict:
        m = self.map_state
        snap = {
            "num_keyframes": int(np.asarray(m.kf_valid).sum()),
            "num_map_points": int(np.asarray(m.mp_valid).sum()),
            "map_points": self.get_map_points(),
            "keyframe_poses": self.get_keyframe_poses(),
            "keyframe_frame_ids": self.get_keyframe_frame_ids(),
        }
        self.introspection.introspect_map(snap)
        return snap
