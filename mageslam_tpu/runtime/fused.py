"""Host wrapper for the fused device engine: async pipeline + batched fetch.

The public façade equivalent of MageSlamTPU (runtime/slam.py) but built on
runtime/device_engine.py: ``process_frame`` dispatches one fused device step
(non-blocking — JAX async dispatch) and returns a *pending* TrackingResult;
outputs are fetched from the device in batches every ``fetch_every`` frames,
so host<->device round-trips amortize to ~25ms / fetch_every per frame on
the axon relay.  This mirrors the reference API exactly: MAGESlam::
ProcessFrame returns a std::future<Tracking> (MageSlam.h:150) — results
there are asynchronous too.

Full API parity with the host engine (MageSlam.h:156-182): stereo init,
sensor samples + fuser, pose-prior providers, VOI, tracking-results
queries, mediator events (fired when results materialize — the reference's
events are asynchronous on the tracking dispatcher too).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.camera import CameraCalibration
from mageslam_tpu.mapping import global_ba
from mageslam_tpu.mapstore import pose_history as ph
from mageslam_tpu.ops import pyramid
from mageslam_tpu.runtime import device_engine as de
from mageslam_tpu.runtime.facade_common import (SensorFacadeMixin,
                                                seed_map_from_stereo,
                                                tracking_results_from_history,
                                                volume_of_interest_from_map)
from mageslam_tpu.runtime.slam import TrackingResult, TrackingState
from mageslam_tpu.utils.mediator import (AnalysisCompleted, Mediator,
                                         PoseRefined, TrackingLost)

_CODE_TO_STATE = {
    de.CODE_SKIPPED: TrackingState.SKIPPED,
    de.CODE_INITIALIZING: TrackingState.INITIALIZING,
    de.CODE_TRACKING: TrackingState.TRACKING,
    de.CODE_RELOCALIZING: TrackingState.RELOCALIZING,
}


class MageSlamTPUFused(SensorFacadeMixin):
    """Fused-pipeline SLAM engine; results resolve within fetch_every
    frames (call flush() to resolve immediately)."""

    def __init__(self, settings: MageSlamSettings,
                 calibration: CameraCalibration, seed: int = 0,
                 fetch_every: int = 8, pose_prior_provider=None,
                 busy_fn=None, determinator=None):
        self.settings = settings
        self.cal = calibration
        self.mediator = Mediator()
        self._prior_provider = pose_prior_provider
        # determinism checkpoints (arcana determinator.h:16-21 analog,
        # reference wires ~40 sites e.g. MappingWorker.cpp:243-246): the
        # fused engine hashes each frame's packed output-ring row as it
        # materializes — the row carries state/pose/inlier/map-stat values
        # and is ALREADY on host, so checkpointing costs no extra device
        # round-trips
        self.determinator = determinator
        self._state, self._step, self._drain_mapping = \
            de.make_engine(settings, calibration)
        self._state = self._state._replace(key=jax.random.key(seed))
        self._fetch_every = max(1, fetch_every)
        self._pending: list = []      # [(fid, ts, device_out)]
        self._inflight = None         # (meta, stacked) copy in flight
        self._results: dict[int, TrackingResult] = {}
        self._frame_id = 0
        # drop-frame pacing (Runtime.cpp:107-121 OneAtATime): hold the
        # newest not-yet-dispatched frame while the device pipeline is
        # deeper than max_pipeline_depth; an even newer arrival replaces
        # (drops) the held one as SKIPPED.  busy_fn overrides the "is the
        # pipeline behind" probe (tests inject a fake; default counts
        # dispatched outputs that have not materialized on host yet).
        self._held = None             # (fid, ts, gray, prior)
        self._dropped = 0
        self._busy_fn = busy_fn if busy_fn is not None else \
            self._pipeline_depth

    # ------------------------------------------------------------------
    def reset(self, seed: int = 0):
        """Fresh SLAM session on the same compiled engine (compile caches
        keyed on the step closure survive, so a reset drive never pays
        tracing again — used by bench.py's repeated-drive variance
        estimate and by restart-style applications)."""
        self._state = de.empty_state(self.settings, seed=0)._replace(
            key=jax.random.key(seed))
        self._pending.clear()
        self._inflight = None
        self._results = {}
        self._frame_id = 0
        self._held = None
        self._dropped = 0

    # ------------------------------------------------------------------
    def _pipeline_depth(self) -> int:
        """Dispatched engine steps whose outputs are still on device."""
        n = 0
        for _, _, o in self._pending:
            ready = getattr(o, "is_ready", None)
            if ready is not None and not ready():
                n += 1
        return n

    def _dispatch(self, fid, ts, gray, prior):
        # python scalars: converted inside the ONE jit dispatch instead of
        # two separate per-frame device_puts
        self._state, out = self._step(self._state, gray,
                                      float(ts), int(fid),
                                      ext_prior=prior)
        self._pending.append((fid, ts, out))
        if len(self._pending) >= self._fetch_every:
            self._drain()

    def process_frame(self, img, timestamp: Optional[float] = None
                      ) -> TrackingResult:
        fid = self._frame_id
        self._frame_id += 1
        ts = timestamp if timestamp is not None else fid / 30.0
        # raw-frame handoff: ONE async host->device transfer; grayscale
        # conversion runs inside the fused engine step (device_engine)
        gray = jnp.asarray(img)
        prior = None
        if self._prior_provider is not None:
            prior = self._prior_provider.get_pose_for_time(ts)

        rt = self.settings.runtime
        if rt.drop_frames_when_busy:
            if self._busy_fn() >= rt.max_pipeline_depth:
                # pipeline behind: hold this frame; drop any older held
                # frame as SKIPPED (process-latest, Runtime.cpp:107-121)
                if self._held is not None:
                    hfid, hts, _, _ = self._held
                    self._results[hfid] = TrackingResult(
                        hfid, hts, TrackingState.SKIPPED)
                    self._dropped += 1
                self._held = (fid, ts, gray, prior)
                return TrackingResult(fid, ts, TrackingState.SKIPPED)
            if self._held is not None:
                self._dispatch(*self._held)
                self._held = None
        self._dispatch(fid, ts, gray, prior)
        return self._results.get(
            fid, TrackingResult(fid, ts, TrackingState.SKIPPED))

    @property
    def frames_dropped(self) -> int:
        """Frames discarded by drop-frame pacing."""
        return self._dropped

    def process_sequence(self, imgs, timestamps=None, chunk: int = 8):
        """File-driven sequence processing (the reference golden path
        reads a pre-recorded video too, console.cpp:291-341): frames are
        uploaded in `chunk`-sized batches (one host->device transfer per
        batch) and each engine step selects its frame ON DEVICE — the
        per-frame compute path and results are identical to
        process_frame, only the upload is amortized (the axon relay
        charges ~0.9 ms per host<->device op in post-readback sync mode).
        Drop-frame pacing does not apply (offline mode).  Results resolve
        via flush()/result_for as usual."""
        n = len(imgs)
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            batch = np.stack([np.asarray(im) for im in imgs[a:b]])
            if b - a < chunk:   # pad: keep ONE chunk shape -> one trace
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], chunk - (b - a), 0)])
            dev = jnp.asarray(batch)
            for j in range(b - a):
                fid = self._frame_id
                self._frame_id += 1
                ts = timestamps[a + j] if timestamps is not None \
                    else fid / 30.0
                prior = None
                if self._prior_provider is not None:
                    prior = self._prior_provider.get_pose_for_time(ts)
                self._state, out = self._step(self._state, dev, ts, fid,
                                              ext_prior=prior,
                                              chunk_idx=j)
                self._pending.append((fid, ts, out))
                if len(self._pending) >= self._fetch_every:
                    self._drain()

    def _materialize(self, batch):
        """Resolve one in-flight (meta, stacked device array) batch and
        fire the deferred per-frame plumbing: mediator events, fuser image
        fences, prior-provider updates.  (In the reference these run on
        the tracking dispatcher thread — asynchronous to the caller too.)
        """
        meta, stacked = batch
        outs = np.asarray(stacked)
        for (fid, ts), row in zip(meta, outs):
            if self.determinator is not None:
                det = self.determinator
                # whole-row stream (r3 behavior) + per-STAGE streams from
                # the packed fingerprints (device_engine._step): a replay
                # divergence now localizes to the stage whose stream
                # diverges first at that frame — the densified analog of
                # the reference's ~40 DETERMINISTIC_CHECK sites spread
                # over the tracking/mapping threads
                det.check("FusedEngine", fid, row)
                det.check("Frontend", fid, row[13:15])
                det.check("Mapping/kf_poses", fid, row[15])
                det.check("Mapping/points", fid, row[16])
                det.check("Mapping/assoc", fid, row[17])
                det.check("Mapping/ba", fid, row[18])
                det.check("Tracking/pose", fid, row[0:8])
                det.check("Tracking/inliers", fid, row[8])
                det.check("Tracking/assoc", fid, row[19])
                det.check("Scheduler", fid, row[20])
            code = int(row[0])
            state = _CODE_TO_STATE.get(code, TrackingState.SKIPPED)
            pose = row[1:8].copy() if state == TrackingState.TRACKING \
                else None
            result = TrackingResult(fid, ts, state, pose)
            self._results[fid] = result
            self.mediator.send(AnalysisCompleted(fid, int(row[13])))
            if state == TrackingState.TRACKING:
                if self._prior_provider is not None:
                    self._prior_provider.on_tracking_pose(ts, pose)
                self.mediator.send(PoseRefined(
                    fid, pose, is_keyframe=bool(row[12] > 0),
                    num_inliers=int(row[8])))
            elif state == TrackingState.RELOCALIZING:
                self.mediator.send(TrackingLost(fid, 0))
            self._drive_fuser(ts, result)

    def _drain(self, final: bool = False):
        # double-buffered fetch: stack this window's outputs into ONE
        # array, start its device->host copy, and materialize it on the
        # NEXT drain — the ~25 ms relay RTT overlaps the next
        # fetch_every frames of device compute instead of blocking the
        # pipeline (measured: blocking fetch cost ~3 ms/frame of the
        # 8 ms/frame total at fetch_every=8)
        if self._pending:
            stacked = jnp.stack([o for _, _, o in self._pending])
            try:
                stacked.copy_to_host_async()
            except AttributeError:
                pass
            meta = [(fid, ts) for fid, ts, _ in self._pending]
            self._pending.clear()
            if self._inflight is not None:
                self._materialize(self._inflight)
            self._inflight = (meta, stacked)
        if final and self._inflight is not None:
            self._materialize(self._inflight)
            self._inflight = None

    def flush(self):
        """Resolve all pending results (one device fetch)."""
        if self._held is not None:
            self._dispatch(*self._held)
            self._held = None
        self._drain(final=True)
        return self._results

    def result_for(self, fid: int) -> Optional[TrackingResult]:
        if fid not in self._results:
            self._drain(final=True)
        return self._results.get(fid)

    def get_tracking_results_for_frames(self, frame_ids):
        """Per-frame poses updated by all later optimization
        (MAGESlam::GetTrackingResultsForFrames, MageSlam.h:161)."""
        self._drain(final=True)
        st = self._state
        return tracking_results_from_history(
            st.history, st.map.kf_pose, st.map.kf_valid, self._results,
            frame_ids)

    # ------------------------------------------------------------------
    # stereo / VOI parity (MageSlam.h:156-182)
    # ------------------------------------------------------------------

    def process_stereo_frames(self, img1, img2, extrinsics,
                              timestamp: Optional[float] = None):
        """MAGESlam::ProcessStereoFrames (MageSlam.h:156): bootstrap the
        map METRICALLY from one calibrated pair, then track monocularly on
        the primary camera.  Returns a (primary, secondary) TrackingResult
        pair — one result per stereo frame, like the reference's
        per-frame futures."""
        from mageslam_tpu.tracking import stereo
        from mageslam_tpu.tracking.frontend import extract_for_settings
        if bool(self._state.initialized):
            r1 = self.process_frame(img1, timestamp)
            r2 = TrackingResult(r1.frame_id, r1.timestamp, r1.state,
                                None if r1.pose is None else np.asarray(
                                    se3.pose_compose(
                                        jnp.asarray(extrinsics),
                                        jnp.asarray(r1.pose))))
            return r1, r2
        fid = self._frame_id
        self._frame_id += 1
        ts = timestamp if timestamp is not None else fid / 30.0
        g1 = pyramid.to_gray_f32(img1)
        g2 = pyramid.to_gray_f32(img2)
        f1 = extract_for_settings(g1, self.cal, self.settings.mono.camera,
                                  self.settings.capacity.max_features)
        f2 = extract_for_settings(g2, self.cal, self.settings.mono.camera,
                                  self.settings.capacity.max_features)
        res = stereo.stereo_initialize(
            f1, f2, jnp.asarray(extrinsics),
            self.settings.stereo.map_init, float(self.cal.fx))
        if not bool(res.success):
            r = TrackingResult(fid, ts, TrackingState.INITIALIZING)
            self._results[fid] = r
            return r, r
        st = self._state
        m, h, s0, s1 = seed_map_from_stereo(
            st.map, st.history, f1, f2, res, extrinsics, fid, ts)
        self._state = st._replace(
            map=m, history=h, initialized=jnp.asarray(True),
            pose_prev=se3.pose_identity(), pose_prev2=se3.pose_identity(),
            last_kf=jnp.asarray(s0, jnp.int32),
            frames_since_kf=jnp.int32(0))
        r1 = TrackingResult(fid, ts, TrackingState.TRACKING,
                            np.asarray(se3.pose_identity()))
        r2 = TrackingResult(fid, ts, TrackingState.TRACKING,
                            np.asarray(extrinsics, np.float32))
        self._results[fid] = r1
        return r1, r2

    def try_get_volume_of_interest(self):
        """MAGESlam::TryGetVolumeOfInterest (MageSlam.h:178)."""
        self._settle()
        return volume_of_interest_from_map(self._state.map, self.cal,
                                           self.settings)

    # ------------------------------------------------------------------
    def _settle(self):
        """Finish any deferred mapping work (pending keyframes / active
        BA window) so map queries see a consistent final state."""
        self._state = self._drain_mapping(self._state)

    @property
    def map_state(self):
        return self._state.map

    @property
    def num_keyframes(self) -> int:
        return int(jnp.sum(self._state.map.kf_valid))

    @property
    def num_map_points(self) -> int:
        return int(jnp.sum(self._state.map.mp_valid))

    @property
    def loops_closed(self) -> int:
        return int(self._state.loops_closed)

    def fossilize(self):
        """Final global BA + immutable trajectory (MAGESlam::Fossilize:
        stop workers -> final BA -> immutable queryable trajectory,
        MAGESlam.cpp:322-383)."""
        from mageslam_tpu.runtime.fossilized import FossilizedMap
        self._drain(final=True)
        self._settle()
        s = self.settings
        if bool(self._state.initialized):
            chunk = max(int(s.graph_optimization.num_steps), 10)
            # iterate the final BA to its error floor — after a loop
            # correction a fixed small budget under-repairs the map
            # (VERDICT r4 #1; the reference budgets 25 closure BA steps,
            # console.cpp:116-120)
            m, _ = global_ba.global_ba_to_floor(
                self._state.map, s, float(self.cal.fx),
                lam0=self._state.lam, chunk_steps=chunk)
            self._state = self._state._replace(map=m)
        return FossilizedMap.from_state(self._state.map,
                                        self._state.history)
