"""Data-parallel SLAM fleet on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       orbit_trajectory)
from mageslam_tpu.parallel.fleet import SlamFleet, default_mesh
from mageslam_tpu.runtime import device_engine as de

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent))
from test_slam_e2e import fast_settings  # noqa: E402

N_FRAMES = 14


@pytest.fixture(scope="module")
def fleet_run():
    cal = default_calibration()
    n = len(jax.devices())
    assert n == 8
    # distinct worlds + trajectories per stream
    worlds = [SyntheticWorld.create(450, seed=20 + i) for i in range(n)]
    trajs = [orbit_trajectory(N_FRAMES, radius=2.0, forward=0.01,
                              sweep=0.5 + 0.05 * i) for i in range(n)]
    fleet = SlamFleet(fast_settings(), cal, mesh=default_mesh(), seed=3)
    for f in range(N_FRAMES):
        imgs = np.stack([worlds[i].render(cal, trajs[i][f], seed=1000 + i * 100 + f)
                         for i in range(n)])
        fleet.process_frames(imgs, timestamps=np.full(n, f / 30.0))
    fleet.flush()
    return fleet, worlds, trajs, cal


class TestFleet:
    def test_all_streams_track_independently(self, fleet_run):
        fleet, worlds, trajs, cal = fleet_run
        # by the last frame most streams must be tracking
        codes = fleet.codes(N_FRAMES - 1)
        n_tracking = int((codes == de.CODE_TRACKING).sum())
        assert n_tracking >= 6, codes
        # each stream built its own map
        kfs = fleet.num_keyframes
        assert (kfs >= 2).sum() >= 6
        # maps differ across streams (different worlds)
        mps = fleet.num_map_points
        assert len(set(mps.tolist())) > 1

    def test_matches_single_engine(self, fleet_run):
        """Stream 0 of the fleet must equal a solo fused engine fed the
        same frames with the same seed-derived key."""
        fleet, worlds, trajs, cal = fleet_run
        from mageslam_tpu.ops import pyramid

        st, step, _ = de.make_engine(fast_settings(), cal)
        key0 = jax.random.split(jax.random.key(3), 8)[0]
        st = st._replace(key=key0)
        outs = []
        for f in range(N_FRAMES):
            img = pyramid.to_gray_f32(
                worlds[0].render(cal, trajs[0][f], seed=1000 + f))
            st, out = step(st, img, jnp.float32(f / 30.0), jnp.int32(f))
            outs.append(np.asarray(out))
        for f in (5, N_FRAMES - 1):
            # slots 14-20 are the per-stage determinism HASHES (r5,
            # device_engine._hash_fold): vmapped-fleet vs solo execution
            # reorders float reductions by ~1 ulp, and the content hash
            # amplifies any ulp difference to a different 24-bit value BY
            # DESIGN (that is its job within one program).  Cross-PROGRAM
            # equality is only meaningful for the semantic slots.
            np.testing.assert_allclose(fleet._results[f][0][:14],
                                       outs[f][:14], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(fleet._results[f][0][21:],
                                       outs[f][21:], rtol=1e-5, atol=1e-5)

    def test_stream_state_extraction(self, fleet_run):
        fleet, *_ = fleet_run
        st0 = fleet.stream_state(0)
        assert st0.map.kf_valid.ndim == 1
        assert int(jnp.sum(st0.map.kf_valid)) == fleet.num_keyframes[0]
