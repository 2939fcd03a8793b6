"""Keyframe decision gates (host-side scalar logic).

Equivalent of the reference's NewKeyFrameDecision
(Tracking/NewKeyFrameDecision.cpp:153-202): ORB-SLAM V-E gates plus extras —
frames-since-keyframe cadence, mapping idle override, min/max tracked
points, reference-keyframe overlap, min-motion-vs-scene-depth.  These are a
handful of scalar comparisons on per-frame stats the tracking jit already
produced, so they run on the host (no device round-trips beyond fetching
the stats, which the runtime needs anyway).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mageslam_tpu.config import KeyframeSettings


@dataclass
class KeyframeDecisionInputs:
    frames_since_keyframe: int
    frames_since_reloc: int
    num_tracked_points: int
    ref_kf_point_count: int      # points observed by the reference keyframe
    num_matches: int
    mapping_idle: bool
    motion_distance: float       # |camera center - ref kf center|
    min_scene_depth: float       # nearest tracked point depth


def should_add_keyframe(s: KeyframeSettings,
                        x: KeyframeDecisionInputs) -> bool:
    """True when the current frame should be promoted to a keyframe."""
    # hard gates
    if x.num_tracked_points < s.min_tracking_point_count:
        return False
    if x.num_matches > s.max_tracking_point_matches:
        return False

    # cadence gate: enough frames passed, or mapping is idle
    cadence_ok = (x.frames_since_keyframe >= s.min_frame_count
                  or (x.mapping_idle and x.frames_since_keyframe >= 1))
    if x.frames_since_reloc < s.min_frame_count_reloc:
        cadence_ok = False
    if not cadence_ok:
        return False

    # overlap gate: the frame must track less than max_tracking_point_overlap
    # of the reference keyframe's points (paper V-E), OR have moved enough
    # relative to the scene (min_frame_move_to_min_depth_ratio), OR mapping
    # is idle and the view has at least drifted below the mapping overlap
    # bound (the reference's idle-mapping insertion path)
    overlap = (x.num_tracked_points / max(x.ref_kf_point_count, 1))
    moved_enough = (x.motion_distance
                    >= s.min_frame_move_to_min_depth_ratio
                    * max(x.min_scene_depth, 1e-6))
    idle_insert = (x.mapping_idle
                   and overlap <= s.mapping_max_tracking_point_overlap)
    if (overlap > s.max_tracking_point_overlap and not moved_enough
            and not idle_insert):
        return False
    return True
