"""MageSlamTPU — the public SLAM façade and host-side scheduler.

Equivalent of the reference's public API + runtime orchestration:
  - mage::MAGESlam (MageSlam.h:25-187: ProcessFrame -> future<Tracking>,
    Fossilize -> immutable trajectory, gravity/scale queries)
  - Tasks/Runtime.* (Runtime.cpp:365-398 TrackMono, :510-587 the
    tracking/mapping interleave schedule, :271-301 lost-tracking
    bookkeeping)
  - Tasks/MappingWorker.* (MappingWorker.cpp:147-372: insert+cull ->
    new points -> local BA with persisted lambda -> keyframe culling)
  - Tasks/InitializationWorker.* (init attempt per frame until success)

Concurrency design: the reference pipelines three dispatcher threads with
state-machine barriers so map WRITES happen at defined points between
tracking READS.  Here every stage is a pure function over MapState, so the
interleave is simply sequential host code — the tracking step reads the
state version produced by the last mapping commit, and JAX's async dispatch
overlaps device work with host bookkeeping.  Mapping work is dispatched
non-blocking (device futures); only the per-frame pose is fetched
synchronously.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.bow import database as bdb
from mageslam_tpu.bow import vocab as bv
from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration
from mageslam_tpu.loop import closure as loop_closure
from mageslam_tpu.mapping import culling, global_ba, local_ba, new_points
from mageslam_tpu.mapstore import map_state as ms
from mageslam_tpu.mapstore import pose_history as ph
from mageslam_tpu.ops import pyramid
from mageslam_tpu.tracking import initialization, relocalization, track
from mageslam_tpu.tracking.frontend import extract_for_settings
from mageslam_tpu.utils.mediator import (AnalysisCompleted, HistoryUpdated,
                                          InitCompleted, Mediator,
                                          PoseRefined, TrackingLost)
from mageslam_tpu.tracking import keyframe_decision
from mageslam_tpu.tracking.keyframe_decision import (KeyframeDecisionInputs,
                                                     should_add_keyframe)


class TrackingState(Enum):
    """Per-frame outcome (reference TrackingState, Runtime.cpp:271-301)."""

    SKIPPED = "skipped"
    INITIALIZING = "initializing"
    TRACKING = "tracking"
    RELOCALIZING = "relocalizing"


@dataclasses.dataclass
class TrackingResult:
    frame_id: int
    timestamp: float
    state: TrackingState
    pose: Optional[np.ndarray] = None       # (7,) view pose when tracked

    @property
    def mat44(self) -> Optional[np.ndarray]:
        if self.pose is None:
            return None
        return np.asarray(se3.pose_to_mat44(jnp.asarray(self.pose)))


from mageslam_tpu.runtime.facade_common import (SensorFacadeMixin,
                                                seed_map_from_stereo,
                                                tracking_results_from_history,
                                                volume_of_interest_from_map)


class MageSlamTPU(SensorFacadeMixin):
    """Monocular keyframe SLAM engine (MageSlam.h:25-187 analog)."""

    def __init__(self, settings: MageSlamSettings,
                 calibration: CameraCalibration,
                 seed: int = 0, pose_prior_provider=None,
                 determinator=None):
        self.settings = settings
        # determinism checkpoints (arcana determinator.h:16-21; reference
        # sites e.g. MappingWorker.cpp:243-246): per-frame tracking hashes
        # on "TrackingThread", per-commit mapping hashes on
        # "MappingThread" — record/replay comparison via
        # utils/determinism.Determinator.save/load/compare
        self.determinator = determinator
        self.cal = calibration
        # typed event bus (TrackingEvents.h / mediator.h analog)
        self.mediator = Mediator()
        # optional IPosePriorProvider (tracking/pose_priors.py); None ->
        # built-in constant-velocity model
        self._prior_provider = pose_prior_provider
        cap = settings.capacity
        self._map = ms.empty_map(cap.max_keyframes, cap.max_features,
                                 cap.max_map_points)
        self._history = ph.empty_history(cap.pose_history_size)
        self._key = jax.random.key(seed)
        self._initialized = False
        self._frame_id = 0
        self._init_buffer: list = []    # [(frame_id, ts, feats)]
        self._pose_prev: Optional[jnp.ndarray] = None
        self._pose_prev2: Optional[jnp.ndarray] = None
        self._last_kf: int = 0
        self._frames_since_kf = 0
        self._frames_since_reloc = 10_000
        self._lost_count = 0
        self._lam = float(settings.mapping.min_lambda)
        self._covis_threshold = float(settings.covisibility
                                      .covis_min_threshold)
        self._results: dict[int, TrackingResult] = {}
        self._kf_frame_ids: list[int] = []
        # BoW: vocabulary trained online from the first TrainingFrames
        # frames' descriptors (reference gates on training completion,
        # Runtime.cpp:247-250 — here only reloc/loop need it, so tracking
        # proceeds while training accumulates)
        self._bow = bdb.empty_database(cap.max_keyframes)
        self._bow_training: list = []
        self._bow_trained = False
        self._loops_closed = 0
        self._ba_converged = False   # last window reached its error floor
        self._init_probation = False  # third-frame confirmation pending
        self._init_points = 0

    def _det(self, channel: str, fid, *values):
        """Determinism checkpoint (DETERMINISTIC_CHECK analog): no-op
        without a determinator.  The host engine checkpoints every
        pipeline stage — the densified equivalent of the reference's ~40
        per-thread sites (MappingWorker.cpp:243-246,
        ImageAnalyzer.cpp:96,122)."""
        if self.determinator is not None:
            self.determinator.check(channel, fid, *values)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def process_frame(self, img, timestamp: Optional[float] = None
                      ) -> TrackingResult:
        """Track one frame (MAGESlam::ProcessFrame, MageSlam.h:150).

        img: (H, W) grayscale (uint8 or float) or (H, W, 3) BGR.
        """
        fid = self._frame_id
        self._frame_id += 1
        ts = timestamp if timestamp is not None else fid / 30.0

        gray = pyramid.to_gray_f32(img)
        feats = extract_for_settings(
            gray, self.cal, self.settings.mono.camera,
            self.settings.capacity.max_features)
        self._feed_bow_training(feats)
        self._det("Frontend", fid, np.asarray(feats.uv),
                  np.asarray(feats.desc), np.asarray(feats.valid))
        self.mediator.send(AnalysisCompleted(fid, int(feats.count)))

        if not self._initialized:
            result = self._try_initialize(fid, ts, feats)
        else:
            result = self._track(fid, ts, feats)
        self._results[fid] = result
        self._drive_fuser(ts, result)
        return result

    def fossilize(self):
        """Stop, final global BA, immutable trajectory
        (MAGESlam::Fossilize, MAGESlam.cpp:322-383)."""
        from mageslam_tpu.runtime.fossilized import FossilizedMap
        s = self.settings
        chunk = max(int(s.graph_optimization.num_steps), 10)
        if self._initialized:
            # final BA to its error floor (see fused.fossilize note)
            self._map, _ = global_ba.global_ba_to_floor(
                self._map, s, float(self.cal.fx), lam0=self._lam,
                chunk_steps=chunk)
        return FossilizedMap.from_engine(self)

    def get_tracking_results_for_frames(self, frame_ids):
        """Re-read per-frame results with poses updated by all later
        optimization (MAGESlam::GetTrackingResultsForFrames)."""
        return tracking_results_from_history(
            self._history, self._map.kf_pose, self._map.kf_valid,
            self._results, frame_ids)

    # ------------------------------------------------------------------
    # stereo / VOI API parity (MageSlam.h:156-182); sensor samples +
    # gravity/scale live in SensorFacadeMixin
    # ------------------------------------------------------------------

    def process_stereo_frames(self, img1, img2, extrinsics,
                              timestamp: Optional[float] = None):
        """MAGESlam::ProcessStereoFrames (MageSlam.h:156): bootstrap the map
        METRICALLY from one calibrated pair (StereoInitializationWorker),
        then track on the primary camera.  extrinsics: (7,) pose taking
        camera-1 coords to camera-2 coords.  Returns a (primary, secondary)
        TrackingResult pair — one per stereo frame like the reference's
        per-frame futures."""
        from mageslam_tpu.tracking import stereo
        fid = self._frame_id
        ts = timestamp if timestamp is not None else fid / 30.0
        if self._initialized:
            r1 = self.process_frame(img1, timestamp)
            r2 = TrackingResult(r1.frame_id, r1.timestamp, r1.state,
                                None if r1.pose is None else np.asarray(
                                    se3.pose_compose(
                                        jnp.asarray(extrinsics),
                                        jnp.asarray(r1.pose))))
            return r1, r2
        self._frame_id += 1
        g1 = pyramid.to_gray_f32(img1)
        g2 = pyramid.to_gray_f32(img2)
        f1 = extract_for_settings(g1, self.cal, self.settings.mono.camera,
                                  self.settings.capacity.max_features)
        f2 = extract_for_settings(g2, self.cal, self.settings.mono.camera,
                                  self.settings.capacity.max_features)
        self._feed_bow_training(f1)
        res = stereo.stereo_initialize(
            f1, f2, jnp.asarray(extrinsics),
            self.settings.stereo.map_init, float(self.cal.fx))
        if not bool(res.success):
            r = TrackingResult(fid, ts, TrackingState.INITIALIZING)
            self._results[fid] = r
            return r, r
        self._map, self._history, s0, s1 = seed_map_from_stereo(
            self._map, self._history, f1, f2, res, extrinsics, fid, ts)
        self._initialized = True
        self._pose_prev = se3.pose_identity()
        self._pose_prev2 = se3.pose_identity()
        self._last_kf = int(s0)
        self._frames_since_kf = 0
        self._kf_frame_ids = [fid]
        r1 = TrackingResult(fid, ts, TrackingState.TRACKING,
                            np.asarray(se3.pose_identity()))
        r2 = TrackingResult(fid, ts, TrackingState.TRACKING,
                            np.asarray(extrinsics, np.float32))
        self._results[fid] = r1
        return r1, r2

    def try_get_volume_of_interest(self):
        """MAGESlam::TryGetVolumeOfInterest (MageSlam.h:178)."""
        return volume_of_interest_from_map(self._map, self.cal,
                                           self.settings)

    @property
    def map_state(self) -> ms.MapState:
        return self._map

    @property
    def num_keyframes(self) -> int:
        return int(jnp.sum(self._map.kf_valid))

    @property
    def num_map_points(self) -> int:
        return int(jnp.sum(self._map.mp_valid))

    @property
    def loops_closed(self) -> int:
        return self._loops_closed

    # ------------------------------------------------------------------
    # initialization (InitializationWorker.cpp:40-95)
    # ------------------------------------------------------------------

    def _try_initialize(self, fid, ts, feats) -> TrackingResult:
        s = self.settings.mono.map_init
        self._init_buffer.append((fid, ts, feats))
        # drop buffered frames beyond the max interval
        self._init_buffer = [
            (f, t, ft) for (f, t, ft) in self._init_buffer
            if ts - t <= s.max_initialization_interval_ms / 1000.0]

        # pick the newest frame satisfying the min interval (smallest
        # eligible baseline — wide pairs lose matchability fastest)
        partner = None
        for (f, t, ft) in self._init_buffer:
            if ts - t >= s.min_initialization_interval_ms / 1000.0:
                partner = (f, t, ft)
        if partner is None:
            return TrackingResult(fid, ts, TrackingState.INITIALIZING)

        self._key, sub = jax.random.split(self._key)
        res = initialization.attempt_initialization(
            sub, partner[2], feats, s, float(self.cal.fx))
        if not bool(res.success):
            return TrackingResult(fid, ts, TrackingState.INITIALIZING)

        self._seed_map(partner, (fid, ts, feats), res)
        return TrackingResult(fid, ts, TrackingState.TRACKING,
                              np.asarray(res.pose1))

    def _seed_map(self, frame0, frame1, res: initialization.InitResult):
        (fid0, ts0, f0), (fid1, ts1, f1) = frame0, frame1
        F = f0.valid.shape[0]
        desc = f0.desc
        # mean viewing direction = camera->point unit vector (camera 0 is at
        # the origin), matching the visibility gate in tracking/track.py
        d0 = jnp.linalg.norm(res.points, axis=-1)
        normal = res.points / jnp.maximum(d0, 1e-9)[:, None]
        sf = float(self.settings.mono.camera.features.scale_factor)
        self._map, mp_ids = ms.allocate_map_points(
            self._map, res.points, desc, normal, 0, res.point_valid,
            octave=f0.octave,
            max_dist=d0 * sf ** f0.octave.astype(jnp.float32))
        created = mp_ids >= 0
        # keyframe 0 at identity (immortal — the gauge origin)
        assoc0 = jnp.where(created, mp_ids, -1)
        self._map, s0 = ms.insert_keyframe(
            self._map, se3.pose_identity(), f0, assoc0, fid0, immortal=True)
        # keyframe 1 associations via the match index
        feat1 = jnp.clip(res.match_idx, 0)
        assoc1 = jnp.full(F + 1, -1, jnp.int32).at[
            jnp.where(created & (res.match_idx >= 0), feat1, F)
        ].set(jnp.where(created, mp_ids, -1))[:F]
        self._map, s1 = ms.insert_keyframe(
            self._map, res.pose1, f1, assoc1, fid1, immortal=True)

        self._history = ph.add_pose(self._history, fid0, ts0,
                                    se3.pose_identity(),
                                    jnp.stack([jnp.asarray(s0),
                                               jnp.asarray(s1)])
                                    .astype(jnp.int32),
                                    self._map.kf_pose)
        self._history = ph.add_pose(self._history, fid1, ts1, res.pose1,
                                    jnp.stack([jnp.asarray(s1),
                                               jnp.asarray(s0)])
                                    .astype(jnp.int32),
                                    self._map.kf_pose)
        self._initialized = True
        self._init_probation = True
        self._init_points = int(res.num_points)
        self._init_buffer.clear()
        self._pose_prev = res.pose1
        # zero-velocity prior: the init pair spans several frames, so
        # extrapolating its delta per-frame would overshoot wildly
        self._pose_prev2 = res.pose1
        self._last_kf = int(s1)
        self._frames_since_kf = 0
        self._kf_frame_ids = [fid0, fid1]
        if self._prior_provider is not None:
            self._prior_provider.on_tracking_pose(ts1, res.pose1)
        self.mediator.send(InitCompleted(fid1, 2, self.num_map_points))

    # ------------------------------------------------------------------
    # steady-state tracking (Runtime.cpp:165-232 TrackFrame)
    # ------------------------------------------------------------------

    def _motion_prior(self) -> jnp.ndarray:
        if self._pose_prev2 is None:
            return self._pose_prev
        return se3.constant_velocity_extrapolate(self._pose_prev2,
                                                 self._pose_prev)

    def _track(self, fid, ts, feats) -> TrackingResult:
        s = self.settings
        prior = None
        if self._prior_provider is not None:
            prior = self._prior_provider.get_pose_for_time(ts)
        if prior is None:
            prior = self._motion_prior()
        self._det("Tracking/prior", fid, np.asarray(prior))
        tres = track.track_frame(self._map, feats, prior, self._last_kf,
                                 self.cal, s,
                                 max_local_kf=s.capacity.local_ba_keyframes)
        self._det("Tracking/assoc", fid, np.asarray(tres.assoc),
                  int(tres.num_matched))
        # third-frame confirmation (MinThirdFrameMatchPercentage,
        # MageSettings.h:102): the first tracked frame after init must
        # re-find enough of the init map points or the init was a bad
        # draw — wipe and re-bootstrap (see device_engine.track_branch)
        if self._init_probation:
            self._init_probation = False
            need = int(np.ceil(
                s.mono.map_init.min_third_frame_match_percentage
                * self._init_points))
            px = 1.0 / float(self.cal.fx)
            mse_ok = float(tres.mean_sq_error) \
                <= s.mono.map_init.third_frame_max_mse_px2 * px * px
            if not (bool(tres.success) and int(tres.num_inliers) >= need
                    and mse_ok):
                self._reset_map()
                return TrackingResult(fid, ts, TrackingState.INITIALIZING)
        if not bool(tres.success):
            self._lost_count += 1
            if self._lost_count >= s.track_local_map \
                    .tracking_lost_count_until_reloc:
                self.mediator.send(TrackingLost(fid, self._lost_count))
                return self._relocalize(fid, ts, feats)
            return TrackingResult(fid, ts, TrackingState.SKIPPED)

        self._lost_count = 0
        pose = tres.pose
        ref_kf = int(tres.ref_kf)
        if self.determinator is not None:
            self.determinator.check("TrackingThread", fid,
                                    np.asarray(pose),
                                    int(tres.num_inliers))

        # N-anchor pose history: nearest keyframe (last_kf) leads (its
        # inverse-distance weight dominates — short lever arm), plus the
        # top covisible keyframes (PoseHistory.cpp:34-52; see
        # device_engine.track_branch note)
        anchors = jnp.concatenate(
            [jnp.asarray([self._last_kf], jnp.int32),
             tres.anchor_kf[:ph.N_ANCHORS - 1]])
        aok = jnp.concatenate(
            [jnp.ones(1, bool), tres.anchor_ok[:ph.N_ANCHORS - 1]])
        self._history = ph.add_pose(self._history, fid, ts, pose,
                                    anchors, self._map.kf_pose,
                                    anchor_ok=aok)
        # recent-point stats
        self._map = culling.accumulate_tracking_stats(
            self._map, tres.local_mp_mask, tres.found_mp_mask)

        # idle-time polish (device_engine.reopen_window parity): keep
        # refining the last window between keyframes until its error
        # floor — the infant map right after initialization depends on
        # this (tracking against an unpolished 2-view map bakes errors
        # into the early trajectory)
        if not self._ba_converged:
            self._idle_polish()

        # keyframe decision
        self._frames_since_kf += 1
        self._frames_since_reloc += 1
        mem_ref = int(jnp.sum(ms.member_matrix(self._map)[ref_kf]))
        cam_c = se3.camera_center(pose)
        ref_c = se3.camera_center(self._map.kf_pose[ref_kf])
        y = se3.pose_apply(pose[None], self._map.mp_pos)
        depths = jnp.where(tres.found_mp_mask & (y[:, 2] > 0), y[:, 2],
                           jnp.inf)
        min_depth = float(jnp.min(depths))
        pc = s.mono.camera
        dense = keyframe_decision.densely_connected(
            np.asarray(feats.uv), np.asarray(tres.assoc >= 0),
            self.cal.width, self.cal.height,
            pc.keyframe_decision_grid_width,
            pc.keyframe_decision_grid_height,
            pc.keyframe_decision_min_map_points_per_grid_cell,
            pc.keyframe_decision_allowed_empty_cell_percentage)
        decision = should_add_keyframe(s.keyframe, KeyframeDecisionInputs(
            frames_since_keyframe=self._frames_since_kf,
            frames_since_reloc=self._frames_since_reloc,
            num_tracked_points=int(tres.num_inliers),
            ref_kf_point_count=mem_ref,
            num_matches=int(tres.num_matched),
            mapping_idle=True,  # synchronous mapping: always idle
            motion_distance=float(jnp.linalg.norm(cam_c - ref_c)),
            min_scene_depth=min_depth if np.isfinite(min_depth) else 1.0,
            densely_connected=dense,
        ))
        prev_for_model = self._pose_prev
        if decision:
            slot = self._mapping_step(fid, feats, pose, tres.assoc)
            if slot is not None:
                # motion-prior re-basing (TrackLocalMapWorker.cpp:121-204):
                # local BA / loop closure may have moved the just-inserted
                # keyframe; extrapolating the pre-correction pose against
                # the corrected map would cause a tracking dropout right
                # after every correction.  after = before ∘ D, so apply D
                # to both motion-model poses to preserve velocity.
                corrected = self._map.kf_pose[slot]
                D = se3.pose_compose(se3.pose_inverse(pose), corrected)
                pose = corrected
                if prev_for_model is not None:
                    prev_for_model = se3.pose_compose(
                        jnp.asarray(prev_for_model), D)

        self._pose_prev2 = prev_for_model
        self._pose_prev = pose
        if self._prior_provider is not None:
            self._prior_provider.on_tracking_pose(ts, pose)
        self.mediator.send(PoseRefined(fid, np.asarray(pose),
                                       is_keyframe=bool(decision),
                                       num_inliers=int(tres.num_inliers)))
        return TrackingResult(fid, ts, TrackingState.TRACKING,
                              np.asarray(pose))

    def _idle_polish(self):
        """One LM chunk on a rebuilt window around the last keyframe —
        the synchronous equivalent of the fused engine's idle-time BA
        (device_engine.reopen_window)."""
        s = self.settings
        cap = s.capacity
        px = 1.0 / float(self.cal.fx)
        from mageslam_tpu.solvers.bundle_adjust import bundle_adjust
        win = local_ba.build_local_window(
            self._map, self._last_kf, jnp.int32(self._covis_threshold),
            window_size=cap.local_ba_keyframes, num_fixed=8,
            max_points=cap.local_ba_points)
        chunk = max(int(s.bundle_adjust.num_steps_per_run), 1) * 8
        mse_floor = float(s.bundle_adjust.min_mean_square_error) * px * px
        res = bundle_adjust(
            win.problem,
            jnp.float32(s.bundle_adjust.huber_width * px),
            jnp.float32(s.bundle_adjust.max_outlier_error * px),
            num_steps=chunk,
            lam0=self._lam if s.mapping.persist_lambda else 1e-4)
        win = win._replace(problem=win.problem._replace(
            kf_poses=res.kf_poses, points=res.points))
        if s.mapping.persist_lambda:
            self._lam = max(float(res.lam), s.mapping.min_lambda)
        self._map = local_ba.apply_window_result(self._map, win, res)
        self._ba_converged = (float(res.mean_sq_error) <= mse_floor
                              or float(res.lam) >= 100.0)

    def _feed_bow_training(self, feats):
        """Accumulate descriptors and train the vocabulary once enough
        frames arrived (ImageAnalyzer.cpp:124 BoW.AddTrainingDescriptors +
        OnlineBow online training)."""
        s = self.settings.bag_of_words
        if self._bow_trained:
            return
        self._bow_training.append((feats.desc, feats.valid))
        if len(self._bow_training) >= s.training_frames:
            desc = jnp.concatenate([d for d, _ in self._bow_training])
            valid = jnp.concatenate([v for _, v in self._bow_training])
            if int(jnp.sum(valid)) >= min(s.min_training_size, 256):
                self._key, sub = jax.random.split(self._key)
                vocab = bv.train_vocabulary(
                    sub, desc, valid, iters=s.max_training_iteration)
                self._bow = self._bow._replace(vocab=vocab)
                self._bow_trained = True
                self._bow_training.clear()
                # backfill signatures for keyframes inserted pre-training
                kf_ok = np.asarray(self._map.kf_valid)
                for slot in np.nonzero(kf_ok)[0]:
                    self._bow = bdb.add_keyframe(
                        self._bow, int(slot), self._map.kf_desc[slot],
                        self._map.kf_feat_valid[slot])
            else:
                self._bow_training.pop(0)

    def _relocalize(self, fid, ts, feats) -> TrackingResult:
        """Lost-mode recovery: BoW candidates -> PnP (reference
        PoseEstimationWorker.cpp:74-97 lost path).

        Infant-map reset: if tracking dies while the map is still tiny
        (<= 3 keyframes), the initialization was weak — wipe and
        re-bootstrap rather than stay lost forever.
        """
        if self.num_keyframes <= 3:
            self._reset_map()
            return TrackingResult(fid, ts, TrackingState.RELOCALIZING)
        if self._bow_trained:
            s = self.settings
            cand_idx, _, cand_ok = bdb.query(
                self._bow, feats.desc, feats.valid,
                jnp.zeros_like(self._map.kf_valid),
                qualifying_score=s.bag_of_words.qualifying_candidate_score,
                max_results=s.mapping.max_reloc_query_results)
            # always include the most recent keyframe (see
            # device_engine.py reloc: the online vocabulary's ranking is
            # too noisy to guarantee the map-frontier keyframe surfaces)
            cand_idx = jnp.concatenate(
                [jnp.asarray(self._last_kf, jnp.int32)[None], cand_idx])
            cand_ok = jnp.concatenate(
                [self._map.kf_valid[self._last_kf][None], cand_ok])
            self._key, sub = jax.random.split(self._key)
            rres = relocalization.relocalize(
                sub, self._map, feats, cand_idx, cand_ok,
                s.relocalization, float(self.cal.fx))
            if bool(rres.success):
                # re-track from the recovered prior to refine + associate
                tres = track.track_frame(self._map, feats, rres.pose,
                                         int(rres.candidate_kf),
                                         self.cal, s)
                if bool(tres.success):
                    self._lost_count = 0
                    self._frames_since_reloc = 0
                    pose = tres.pose
                    ref_kf = int(tres.ref_kf)
                    self._history = ph.add_pose(
                        self._history, fid, ts, pose, tres.anchor_kf,
                        self._map.kf_pose, anchor_ok=tres.anchor_ok)
                    self._pose_prev = pose
                    self._pose_prev2 = pose  # zero-velocity restart
                    # re-anchor the frontier: recovered frame becomes a
                    # keyframe immediately (see device_engine.py reloc-ok
                    # path for the rationale / reference deviation note)
                    self._mapping_step(fid, feats, pose, tres.assoc)
                    return TrackingResult(fid, ts, TrackingState.TRACKING,
                                          np.asarray(pose))
        return TrackingResult(fid, ts, TrackingState.RELOCALIZING)

    def _reset_map(self):
        cap = self.settings.capacity
        self._map = ms.empty_map(cap.max_keyframes, cap.max_features,
                                 cap.max_map_points)
        self._history = ph.empty_history(cap.pose_history_size)
        self._initialized = False
        self._init_buffer.clear()
        self._pose_prev = None
        self._pose_prev2 = None
        self._lost_count = 0
        self._kf_frame_ids = []

    # ------------------------------------------------------------------
    # mapping (MappingWorker.cpp:147-372)
    # ------------------------------------------------------------------

    def _mapping_step(self, fid, feats, pose, assoc):
        s = self.settings
        px = 1.0 / float(self.cal.fx)

        # capacity guard: when keyframe slots are exhausted, force-cull the
        # most redundant non-immortal keyframe first (insert would otherwise
        # clobber slot 0)
        if self.num_keyframes >= self._map.kf_valid.shape[0]:
            cres = culling.cull_keyframes(
                self._map, self._last_kf, jnp.float32(0.0), jnp.int32(1))
            if int(cres.num_keyframes_culled) == 0:
                return None  # nothing cullable; drop this keyframe
            dead = cres.kf_culled_mask
            targets = ph.nearest_valid_kf(self._map.kf_valid, dead,
                                          self._map.kf_frame_id)
            self._history = ph.reanchor(self._history, self._map.kf_pose,
                                        self._map.kf_valid, dead, targets)
            self._bow = bdb.remove_keyframes(self._bow, dead)
            self._map = cres.map

        # 1. insert keyframe with tracked associations (+ BoW AddImage)
        self._map, slot = ms.insert_keyframe(self._map, pose, feats, assoc,
                                             fid)
        slot = int(slot)
        # the promoted frame's trajectory pose now lives on its own
        # keyframe (identity offset) so later BA refinements reach it
        self._history = ph.anchor_frame_to_kf(self._history, fid, slot)
        self._ba_converged = False
        self._last_kf = slot
        self._frames_since_kf = 0
        self._kf_frame_ids.append(fid)
        if self._bow_trained:
            self._bow = bdb.add_keyframe(self._bow, slot, feats.desc,
                                         feats.valid)

        # 1.5 cheap loop closure: re-associate distant map points into the
        # new keyframe (MappingWorker.cpp:30-75,160-165)
        if s.mapping.use_cheap_loop_closure:
            from mageslam_tpu.mapping.cheap_loop_closure import \
                cheap_loop_closure
            clr = cheap_loop_closure(self._map, slot, self.cal,
                                     s.loop_closure)
            self._map = clr.map
            self._det("Mapping/cheap_lc", fid,
                      np.asarray(self._map.kf_assoc[slot]))

        # 2. recent-map-point culling
        self._map, _ = culling.cull_recent_map_points(
            self._map,
            jnp.float32(s.track_local_map.recent_map_point_pct_success),
            jnp.int32(s.mapping.min_num_keyframes_for_map_point_culling))
        self._det("Mapping/cull_recent", fid, self.num_map_points)

        # 3. new map points
        npres = new_points.create_new_map_points(
            self._map, slot, self.cal, s.mapping.new_map_points,
            float(self.cal.fx),
            num_candidates=int(s.mapping.new_map_points
                               .max_frames_for_new_points_creation),
            scale_factor=float(s.mono.camera.features.scale_factor))
        self._map = npres.map
        self._det("Mapping/new_points", fid, int(npres.num_created),
                  np.asarray(self._map.mp_pos))

        # 4. local BA with adaptive covis threshold + persisted lambda
        cap = s.capacity
        win = local_ba.build_local_window(
            self._map, slot, jnp.int32(self._covis_threshold),
            window_size=cap.local_ba_keyframes,
            num_fixed=8, max_points=cap.local_ba_points)
        n_conn = int(jnp.sum(win.problem.obs_valid))
        cv = s.covisibility
        if n_conn > cv.upper_connections_for_ba:
            self._covis_threshold += cv.covis_ba_step_threshold
        elif n_conn < cv.lower_connections_for_ba:
            self._covis_threshold = max(
                cv.covis_min_threshold,
                self._covis_threshold - cv.covis_ba_step_threshold)

        # IterateBA (MappingWorker.cpp:330-372): the reference runs LM in
        # NumSteps-sized chunks and KEEPS ITERATING until the error floor
        # is reached (or new keyframes queue up).  Under-iterating here is
        # catastrophic: un-converged point depths bias the next frame's
        # pose toward rotation, whose error biases the next triangulation
        # — a scale-collapse feedback loop on exploratory trajectories.
        from mageslam_tpu.solvers.bundle_adjust import bundle_adjust
        chunk = max(int(s.bundle_adjust.num_steps_per_run), 1) * 8
        max_total = max(10 * chunk, 80)
        mse_floor = float(s.bundle_adjust.min_mean_square_error) * px * px

        def run_window(win):
            lam = self._lam if s.mapping.persist_lambda else 1e-4
            problem = win.problem
            res = None
            for _ in range(max_total // chunk):
                res = bundle_adjust(
                    problem,
                    jnp.float32(s.bundle_adjust.huber_width * px),
                    jnp.float32(s.bundle_adjust.max_outlier_error * px),
                    num_steps=chunk, lam0=lam)
                problem = problem._replace(kf_poses=res.kf_poses,
                                           points=res.points)
                lam = res.lam
                if float(res.mean_sq_error) <= mse_floor:
                    break
            win = win._replace(problem=problem)
            if s.mapping.persist_lambda:
                self._lam = max(float(res.lam), s.mapping.min_lambda)
            self._map = local_ba.apply_window_result(self._map, win, res)
            return win, res

        win, res = run_window(win)
        # second pass on a REBUILT window (the fused engine's idle-time
        # polish, device_engine.reopen_window): outlier unassociation and
        # the first pass's pose/point moves change which observations the
        # window should contain; a rebuilt window converges measurably
        # tighter than iterating the stale one
        if s.track_local_map.unassociate_outliers:
            self._map = local_ba.unassociate_outliers(self._map, win, res)
        win2 = local_ba.build_local_window(
            self._map, slot, jnp.int32(self._covis_threshold),
            window_size=cap.local_ba_keyframes,
            num_fixed=8, max_points=cap.local_ba_points)
        win2, res2 = run_window(win2)
        if s.track_local_map.unassociate_outliers:
            self._map = local_ba.unassociate_outliers(self._map, win2, res2)
        self._det("Mapping/ba", fid, float(res2.mean_sq_error),
                  float(res2.lam), np.asarray(self._map.kf_pose))
        self.mediator.send(HistoryUpdated("local_ba"))

        # 5. keyframe culling + history re-anchoring
        cres = culling.cull_keyframes(
            self._map, slot,
            jnp.float32(s.keyframe.mapping_max_tracking_point_overlap),
            jnp.int32(s.keyframe.min_keyframe_covisibility_count))
        if int(cres.num_keyframes_culled) > 0:
            dead = cres.kf_culled_mask
            targets = ph.nearest_valid_kf(self._map.kf_valid, dead,
                                          self._map.kf_frame_id)
            self._history = ph.reanchor(self._history, self._map.kf_pose,
                                        self._map.kf_valid, dead, targets)
            self._bow = bdb.remove_keyframes(self._bow, dead)
        # representative-descriptor + viewing-direction refresh
        # (MapPoint.cpp:80-131) once per mapping commit
        self._map = ms.refresh_point_representatives(cres.map)

        if self.determinator is not None:
            self.determinator.check(
                "MappingThread", fid,
                np.asarray(self._map.kf_pose[slot]),
                self.num_keyframes, self.num_map_points)

        # 6. loop closure per keyframe (LoopClosureWorker::AttemptLoopClosure
        # scheduled after each mapping pass, Runtime.cpp:527-529)
        if (s.loop_closure.enable_loop_closure and self._bow_trained
                and self.num_keyframes >= s.loop_closure.min_keyframe):
            self._attempt_loop_closure(slot)
            self._det("Mapping/loop", fid, self._loops_closed,
                      np.asarray(self._map.kf_pose[slot]))
        return slot

    def _attempt_loop_closure(self, slot: int):
        s = self.settings
        px = 1.0 / float(self.cal.fx)
        self._key, sub = jax.random.split(self._key)
        det = loop_closure.detect_loop(
            sub, self._map, self._bow, slot,
            s.loop_closure, s.relocalization, float(self.cal.fx))
        if not bool(det.found):
            return
        # CloseLoop: similarity correction (optionally propagated through
        # the essential graph) + merge + global polish
        if s.loop_closure.use_pose_graph:
            self._map = loop_closure.pose_graph_loop_correction(
                self._map, slot, det,
                num_steps=int(s.loop_closure.pose_graph_steps),
                min_covis=int(s.loop_closure.pose_graph_min_covis))
        else:
            self._map = loop_closure.apply_similarity_correction(
                self._map, slot, det)
        self._map = loop_closure.merge_loop_points(
            self._map, slot, det, self.cal, s.loop_closure)
        lc_ba = s.loop_closure.bundle_adjust
        # FRESH lambda for the post-correction global BA: the persisted
        # local-BA lambda is a warm restart for the SAME window, but
        # after a similarity correction the problem changed entirely —
        # a large carried-over lambda turns the 25-step repair into a
        # no-op and leaves the correction seam unreconciled (measured on
        # the injected-drift ring: ATE 1.95 with carried lambda vs 0.08
        # with a fresh one, tests/test_loop_closure_wins.py)
        self._map, _ = global_ba.engine_global_bundle_adjust(
            self._map, s, float(self.cal.fx),
            num_steps=max(int(lc_ba.num_steps), 5), lam0=1e-4,
            huber_width_px=float(lc_ba.huber_width),
            max_outlier_px=float(lc_ba.max_outlier_error))
        self._loops_closed += 1
        self.mediator.send(HistoryUpdated("loop_closure"))
