"""Compare slot-adjacent vs temporal keyframe spacing on the healthy-ring
final map, to size the near-identity loop-closure guard regression."""

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

import jax
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import se3
from mageslam_tpu.io.synthetic import (SyntheticWorld, default_calibration,
                                       loop_trajectory)
from mageslam_tpu.runtime.fused import MageSlamTPUFused

from test_e2e_loop_reloc import loop_settings

N = 150


def main():
    world = SyntheticWorld.create_ring(900, seed=5)
    cal = default_calibration()
    poses_gt = loop_trajectory(N, radius=3.0)
    s = loop_settings()
    s = s.replace(loop_closure=s.loop_closure.__class__(
        enable_loop_closure=False,
        bundle_adjust=s.loop_closure.bundle_adjust))
    eng = MageSlamTPUFused(s, cal, seed=1)
    for i, p in enumerate(poses_gt):
        eng.process_frame(world.render(cal, p, seed=100 + i),
                          timestamp=i / 30.0)
    eng.flush()
    eng._settle()
    m = eng._state.map
    c = np.asarray(jax.vmap(se3.camera_center)(m.kf_pose))
    v = np.asarray(m.kf_valid)
    fid = np.asarray(m.kf_frame_id)

    # slot-adjacent (r4 definition)
    d_slot = np.linalg.norm(c[1:] - c[:-1], axis=-1)
    ok_slot = v[1:] & v[:-1]
    # temporal (r5 definition)
    order = np.argsort(np.where(v, fid, 2**31 - 1))
    cs, vs = c[order], v[order]
    d_t = np.linalg.norm(cs[1:] - cs[:-1], axis=-1)
    ok_t = vs[1:] & vs[:-1]
    print(f"kf alive={v.sum()} fid_range={fid[v].min()}-{fid[v].max()}")
    print(f"slot-adjacent median spacing: {np.median(d_slot[ok_slot]):.4f}")
    print(f"temporal     median spacing: {np.median(d_t[ok_t]):.4f}")
    # ground-truth revisit drift: distance between first-lap and
    # second-lap keyframes at the same ring angle is what dt measures
    print("per-kf spacings (temporal):",
          np.round(np.sort(d_t[ok_t]), 3).tolist())


if __name__ == "__main__":
    main()
