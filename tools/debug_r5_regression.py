"""Bisect the r5 healthy-ring LC-on fossil ATE regression (2.2% -> 6.2%).

Drives the test_e2e_loop_reloc loop fixture and prints loops_closed +
fossil ATE, with env toggles to isolate the responsible r5 change:
  MAGESLAM_DBG_KF_ATE=1     also print keyframe-map ATE (pre/post fossil)
Usage: python tools/debug_r5_regression.py [lc_on=1]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize pins JAX_PLATFORMS=axon at interpreter startup, so the
# env var is too late — force CPU the way tests/conftest.py does unless
# the caller asks for TPU explicitly
if os.environ.get("MAGESLAM_TOOL_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from mageslam_tpu.io.evaluation import ate_rmse
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused
from mageslam_tpu.runtime.slam import TrackingState

from test_e2e_loop_reloc import loop_settings, _ate

N = 150


def kf_ate(m, poses_gt):
    fid = np.asarray(m.kf_frame_id)
    v = np.asarray(m.kf_valid)
    est = [np.asarray(m.kf_pose[k]) for k in np.nonzero(v)[0]]
    gt = [poses_gt[fid[k]] for k in np.nonzero(v)[0]]
    return ate_rmse(np.asarray(est), np.asarray(gt))[0]


def main(lc_on=True):
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N, radius=3.0)
    imgs = [world.render(cal, p, seed=100 + i)
            for i, p in enumerate(poses_gt)]
    s = loop_settings()
    if not lc_on:
        s = s.replace(loop_closure=s.loop_closure.__class__(
            enable_loop_closure=False,
            bundle_adjust=s.loop_closure.bundle_adjust))
    eng = MageSlamTPUFused(s, cal, seed=1)
    for i, img in enumerate(imgs):
        eng.process_frame(img, timestamp=i / 30.0)
    results = eng.flush()
    eng._settle()
    print(f"loops_closed={eng.loops_closed} "
          f"kf_ate_pre_fossil={kf_ate(eng._state.map, poses_gt):.4f}")
    fossil = eng.fossilize()
    print(f"kf_ate_post_fossil={kf_ate(eng._state.map, poses_gt):.4f}")
    rmse, extent = _ate(results, fossil, poses_gt)
    print(f"fossil_ate={rmse:.4f} extent={extent:.2f} "
          f"pct={100*rmse/extent:.2f}%")


if __name__ == "__main__":
    main(lc_on=(len(sys.argv) < 2 or sys.argv[1] != "0"))
