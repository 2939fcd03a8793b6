"""Host wrapper for the fused device engine: async pipeline + batched fetch.

The public façade equivalent of MageSlamTPU (runtime/slam.py) but built on
runtime/device_engine.py: ``process_frame`` dispatches one fused device step
(non-blocking — JAX async dispatch) and returns a *pending* TrackingResult;
outputs are fetched from the device in batches every ``fetch_every`` frames,
so host<->device round-trips amortize to ~25ms / fetch_every per frame on
the axon relay.  This mirrors the reference API exactly: MAGESlam::
ProcessFrame returns a std::future<Tracking> (MageSlam.h:150) — results
there are asynchronous too.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.geometry.camera import CameraCalibration
from mageslam_tpu.mapping import global_ba
from mageslam_tpu.ops import pyramid
from mageslam_tpu.runtime import device_engine as de
from mageslam_tpu.runtime.slam import TrackingResult, TrackingState

_CODE_TO_STATE = {
    de.CODE_SKIPPED: TrackingState.SKIPPED,
    de.CODE_INITIALIZING: TrackingState.INITIALIZING,
    de.CODE_TRACKING: TrackingState.TRACKING,
    de.CODE_RELOCALIZING: TrackingState.RELOCALIZING,
}


class MageSlamTPUFused:
    """Fused-pipeline SLAM engine; results resolve within fetch_every
    frames (call flush() to resolve immediately)."""

    def __init__(self, settings: MageSlamSettings,
                 calibration: CameraCalibration, seed: int = 0,
                 fetch_every: int = 8):
        self.settings = settings
        self.cal = calibration
        self._state, self._step = de.make_engine(settings, calibration)
        self._state = self._state._replace(key=jax.random.key(seed))
        self._fetch_every = max(1, fetch_every)
        self._pending: list = []      # [(fid, ts, device_out)]
        self._inflight = None         # (meta, stacked) copy in flight
        self._results: dict[int, TrackingResult] = {}
        self._frame_id = 0

    # ------------------------------------------------------------------
    def process_frame(self, img, timestamp: Optional[float] = None
                      ) -> TrackingResult:
        fid = self._frame_id
        self._frame_id += 1
        ts = timestamp if timestamp is not None else fid / 30.0
        gray = pyramid.to_gray_f32(img)
        self._state, out = self._step(self._state, gray,
                                      jnp.float32(ts), jnp.int32(fid))
        self._pending.append((fid, ts, out))
        if len(self._pending) >= self._fetch_every:
            self._drain()
        return self._results.get(
            fid, TrackingResult(fid, ts, TrackingState.SKIPPED))

    def _materialize(self, batch):
        """Resolve one in-flight (meta, stacked device array) batch."""
        meta, stacked = batch
        outs = np.asarray(stacked)
        for (fid, ts), row in zip(meta, outs):
            code = int(row[0])
            state = _CODE_TO_STATE.get(code, TrackingState.SKIPPED)
            pose = row[1:8].copy() if state == TrackingState.TRACKING \
                else None
            self._results[fid] = TrackingResult(fid, ts, state, pose)

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
        self._drain(final=True)
        return self._results

    def result_for(self, fid: int) -> Optional[TrackingResult]:
        if fid not in self._results:
            self._drain(final=True)
        return self._results.get(fid)

    # ------------------------------------------------------------------
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
        """Final global BA + immutable trajectory (MAGESlam::Fossilize)."""
        from mageslam_tpu.runtime.fossilized import FossilizedMap
        self._drain()
        s = self.settings
        px = 1.0 / float(self.cal.fx)
        if bool(self._state.initialized):
            num_steps = max(int(s.graph_optimization.num_steps), 10)
            m, _ = global_ba.global_bundle_adjust(
                self._state.map,
                jnp.float32(s.bundle_adjust.huber_width * px),
                jnp.float32(s.graph_optimization.max_outlier_error * px),
                num_steps=num_steps, lam0=self._state.lam)
            self._state = self._state._replace(map=m)

        class _Adapter:
            pass

        a = _Adapter()
        a.map_state = self._state.map
        a._history = self._state.history
        return FossilizedMap.from_engine(a)
