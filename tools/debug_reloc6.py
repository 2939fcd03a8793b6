"""Fast reloc iteration on the saved frame-55 state."""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

from mageslam_tpu.io.synthetic import default_calibration  # noqa: E402
from mageslam_tpu.io import serialization  # noqa: E402
from mageslam_tpu.mapstore import map_state as ms  # noqa: E402
from mageslam_tpu.ops import matching, pyramid  # noqa: E402
from mageslam_tpu.runtime import device_engine as de  # noqa: E402
from mageslam_tpu.solvers import pnp  # noqa: E402
from mageslam_tpu.tracking.frontend import extract_for_settings  # noqa: E402

from test_e2e_loop_reloc import loop_settings  # noqa: E402

cal = default_calibration()
s = loop_settings()
s = s.replace(loop_closure=s.loop_closure.__class__(
    enable_loop_closure=False, bundle_adjust=s.loop_closure.bundle_adjust))
st = serialization.load_state("/tmp/occ_state55.npz", de.empty_state(s))
seq = np.load("/tmp/occ_seq.npy")
px = 1.0 / float(cal.fx)
K, F, L = ms.capacities(st.map)
lk = int(st.last_kf)

fidx = int(sys.argv[1]) if len(sys.argv) > 1 else 55
feats = extract_for_settings(pyramid.to_gray_f32(seq[fidx]), cal,
                             s.mono.camera, s.capacity.max_features)
kf = jnp.int32(lk)
kf_idx, kf_ok = ms.connected_keyframes(st.map, kf, min_shared=1,
                                       max_connected=7)
kf_list = jnp.concatenate([kf[None], kf_idx])
kf_okl = jnp.concatenate([jnp.array([True]), kf_ok])
pool = ms.local_map_points(st.map, kf_list, kf_okl) & st.map.mp_valid
idx_mp, dist_mp = matching.match(
    feats.desc, st.map.mp_desc, feats.valid, pool,
    max_distance=s.relocalization.matcher.max_hamming_distance,
    min_difference=s.relocalization.matcher.min_hamming_difference)
kf_has_mp = st.map.kf_feat_valid[lk] & (st.map.kf_assoc[lk] >= 0)
idx_kf, dist_kf = matching.match(
    feats.desc, st.map.kf_desc[lk], feats.valid, kf_has_mp,
    max_distance=s.relocalization.matcher.max_hamming_distance,
    min_difference=s.relocalization.matcher.min_hamming_difference)
mp_from_kf = st.map.kf_assoc[lk][jnp.clip(idx_kf, 0)]
use_kf = (idx_kf >= 0) & (mp_from_kf >= 0)
idx = jnp.where(use_kf, mp_from_kf, idx_mp)
dist = jnp.where(use_kf, dist_kf, dist_mp)
good = use_kf | (idx_mp >= 0)
idx = jnp.where(good, idx, -1)
pts = st.map.mp_pos[jnp.clip(idx, 0, L - 1)]
n_corr = int(jnp.sum(good))
print(f"frame {fidx} vs kf slot {lk} (f{int(st.map.kf_frame_id[lk])}): "
      f"kf-pool hits={int(jnp.sum(use_kf))} mp-pool={int(jnp.sum(idx_mp >= 0))} "
      f"n_corr={n_corr}")

quality = jnp.exp(-dist.astype(jnp.float32) / 12.0)
thr = jnp.float32(s.relocalization.max_pnp_reprojection_error * px)
for trial in range(3):
    res = pnp.pnp_ransac(
        jax.random.key(trial), pts, feats.xn_undist, good,
        inlier_thresh=thr, huber_delta=thr * 0.5,
        num_hypotheses=256, quality=quality,
        init_pose=st.map.kf_pose[lk])
    need_pct = s.relocalization.ransac_inliers_pct_required * n_corr
    print(f"  trial {trial}: inl={int(res.num_inliers)} "
          f"(need >= {max(5, s.relocalization.min_map_points//2)} and "
          f">= {need_pct:.1f})")

# ground truth: how many of the combined correspondences are correct?
# (project map points through the re-track pose of the last tracked frame
# is unavailable; instead check reprojection under the KF pose prior is
# within the wide radius -> a proxy for plausibility)
r, z = pnp.reprojection_residuals(st.map.kf_pose[lk], pts, feats.xn_undist)
err_px = np.asarray(jnp.linalg.norm(r, axis=-1) * float(cal.fx))
print("  corr reproj-at-kf-pose px (valid):",
      np.percentile(err_px[np.asarray(good)], [10, 25, 50, 75, 90]).round(1))
