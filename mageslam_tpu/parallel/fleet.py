"""Data-parallel SLAM fleet: one stream per device over a jax Mesh.

The reference is a single-process library with no distributed compute
(SURVEY.md §2.2); the data-parallelism analog for production serving is a
FLEET of independent SLAM sessions — one video stream per chip — running
the fused device engine (runtime/device_engine.py) in SPMD.

Design: `shard_map` over a 1-D mesh axis "dp". Each device holds ONE
stream's full EngineState and executes the unbatched fused step — unlike
`vmap`, `lax.cond` branches stay real branches per device (a vmapped cond
becomes a select that executes BOTH branches; shard_map keeps the
init/track/mapping branch selection cheap on every device independently).
No collectives are needed (streams are independent) — scaling efficiency is
bounded only by per-device dispatch, which is shared (one XLA program for
the whole fleet).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mageslam_tpu.config import MageSlamSettings
from mageslam_tpu.geometry.camera import CameraCalibration
from mageslam_tpu.ops import pyramid
from mageslam_tpu.runtime import device_engine as de


def default_mesh(n: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n or len(devs)
    return Mesh(np.array(devs[:n]), ("dp",))


class SlamFleet:
    """N independent SLAM streams, one per device on mesh axis "dp".

    process_frames(imgs (N, H, W), timestamps (N,)) dispatches one fused
    step per stream; outputs resolve in batches like MageSlamTPUFused.
    """

    def __init__(self, settings: MageSlamSettings,
                 calibration: CameraCalibration,
                 mesh: Optional[Mesh] = None, seed: int = 0):
        self.settings = settings
        self.cal = calibration
        self.mesh = mesh or default_mesh()
        self.n_streams = self.mesh.devices.size

        st0, step, _drain = de.make_engine(settings, calibration)

        # per-stream state: stacked leaves, distinct RNG keys
        keys = jax.random.split(jax.random.key(seed), self.n_streams)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_streams,) + x.shape),
            st0)
        stacked = stacked._replace(key=keys)

        state_spec = jax.tree.map(lambda _: P("dp"), st0)

        def fleet_step(st, img, ts, fid):
            # local shard has leading dim 1: run the UNBATCHED step
            st1 = jax.tree.map(lambda x: x[0], st)
            out_st, out = step(st1, img[0], ts[0], fid[0])
            return (jax.tree.map(lambda x: x[None], out_st), out[None])

        self._step = jax.jit(shard_map(
            fleet_step, mesh=self.mesh,
            in_specs=(state_spec, P("dp"), P("dp"), P("dp")),
            out_specs=(state_spec, P("dp")),
            check_vma=False))
        self._sharding = NamedSharding(self.mesh, P("dp"))
        self._state = jax.device_put(
            stacked, jax.tree.map(lambda _: self._sharding, st0))
        self._frame = 0
        self._pending: list = []
        self._results: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    def process_frames(self, imgs, timestamps=None, fetch_every: int = 8):
        """One frame per stream: imgs (N, H, W) uint8/float."""
        fid = self._frame
        self._frame += 1
        ts = (jnp.full((self.n_streams,), fid / 30.0, jnp.float32)
              if timestamps is None
              else jnp.asarray(timestamps, jnp.float32))
        gray = jnp.stack([pyramid.to_gray_f32(i) for i in imgs]) \
            if not isinstance(imgs, jnp.ndarray) else imgs
        gray = jax.device_put(gray, self._sharding)
        fids = jnp.full((self.n_streams,), fid, jnp.int32)
        self._state, out = self._step(self._state, gray, ts, fids)
        self._pending.append((fid, out))
        if len(self._pending) >= fetch_every:
            self.flush()
        return fid

    def flush(self):
        for fid, out in self._pending:
            self._results[fid] = np.asarray(out)
        self._pending.clear()
        return self._results

    # ------------------------------------------------------------------
    def stream_state(self, i: int) -> de.EngineState:
        """Materialize stream i's EngineState (host copy)."""
        return jax.tree.map(lambda x: jnp.asarray(x[i]), self._state)

    @property
    def num_keyframes(self) -> np.ndarray:
        return np.asarray(jnp.sum(self._state.map.kf_valid, axis=1))

    @property
    def num_map_points(self) -> np.ndarray:
        return np.asarray(jnp.sum(self._state.map.mp_valid, axis=1))

    def codes(self, fid: int) -> np.ndarray:
        """(N,) tracking state codes for frame fid (after flush)."""
        return self._results[fid][:, 0].astype(np.int32)

    def poses(self, fid: int) -> np.ndarray:
        return self._results[fid][:, 1:8]
