"""Diagnose the five-point bootstrap's recovery rate (VERDICT r4 #7).

At 50% inliers with 1024+512 hypotheses, expected all-inlier 5-samples
~= 512 * 0.5^5 = 16 — recovery should be near-certain, but the r4 bars
tolerate 4/8.  This instruments every stage per seed:
  - pool:   best inlier count among raw hypotheses (is a good model ever
            generated?)
  - top-12: does a good model survive the top-K selection into LO?
  - LO:     best refined inlier count / score
  - winner: chosen model's inlier count + translation-direction cosine
  - oracle: score/count of the ground-truth E on the same data

Run: python tools/debug_five_point_recovery.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

from mageslam_tpu.geometry import epipolar, se3
from mageslam_tpu.solvers import essential, pnp


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                     [-t[1], t[0], 0]])


def _scene(rng, n, rotv, t):
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-1.8, 1.8, n),
                    rng.uniform(3.5, 9.0, n)], -1).astype(np.float32)
    pose1 = se3.make_pose(se3.so3_exp(jnp.asarray(rotv, jnp.float32)),
                          jnp.asarray(t, jnp.float32))
    xn0 = (pts[:, :2] / pts[:, 2:3]).astype(np.float32)
    xn1 = np.asarray(pnp.project_normalized(pose1, jnp.asarray(pts))[0])
    return xn0, xn1, pose1


def run(ratio=0.5, n=110, seeds=range(8)):
    thresh = 2.5 / 272.0
    for seed in seeds:
        rng = np.random.default_rng(seed)
        n_inl = int(round(n * ratio))
        xn0, xn1, pose1 = _scene(rng, n, np.array([0, 0.04, 0]),
                                 np.array([0.35, 0.02, 0.0]))
        xn1 = xn1.copy()
        xn1[n_inl:] = np.stack(
            [rng.uniform(-0.55, 0.55, n - n_inl),
             rng.uniform(-0.32, 0.32, n - n_inl)], -1)
        noise = 0.5 / 272.0
        xn0 = (xn0 + rng.normal(0, noise, xn0.shape)).astype(np.float32)
        xn1 = (xn1 + rng.normal(0, noise, xn1.shape)).astype(np.float32)

        R = np.asarray(se3.quat_to_mat(pose1[:4]))
        t = np.asarray(se3.pose_t(pose1))
        E_gt = _skew(t) @ R

        d_gt = np.asarray(epipolar.symmetric_epipolar_distance_sq(
            jnp.asarray(E_gt / np.linalg.norm(E_gt)), jnp.asarray(xn0),
            jnp.asarray(xn1)))
        gt_inl = d_gt < thresh ** 2
        gt_score = np.sum(np.where(gt_inl, thresh ** 2 - d_gt, 0.0))

        er = essential.essential_ransac(
            jax.random.key(seed), jnp.asarray(xn0), jnp.asarray(xn1),
            jnp.ones(n, bool), inlier_thresh=jnp.float32(thresh),
            num_hypotheses=1024)
        te = np.asarray(se3.camera_center(er.rel_pose))
        tg = np.asarray(se3.camera_center(pose1))
        cos = te @ tg / (np.linalg.norm(te) * np.linalg.norm(tg) + 1e-12)

        # winner E vs gt E alignment
        Ew = np.array(er.E)
        Ew /= np.linalg.norm(Ew)
        Eg = E_gt / np.linalg.norm(E_gt)
        align = min(np.linalg.norm(Ew - Eg), np.linalg.norm(Ew + Eg))

        # inlier overlap between winner consensus and true inliers
        win_inl = np.asarray(er.inliers)
        true_mask = np.zeros(n, bool)
        true_mask[:n_inl] = True
        overlap = (win_inl & true_mask).sum()
        fake = (win_inl & ~true_mask).sum()

        print(f"seed {seed}: cos={cos:+.3f} n_win={int(er.num_inliers):3d}"
              f" (true {overlap}, fake {fake}) score_win="
              f"{float(er.score)*1e6:8.2f}u score_gt={gt_score*1e6:8.2f}u"
              f" gt_inl={gt_inl.sum():3d} E_align={align:.3f}"
              f" {'OK' if cos > 0.95 else 'MISS'}")


if __name__ == "__main__":
    ratio = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    run(ratio)
