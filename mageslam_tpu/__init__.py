"""mageslam_tpu — a TPU-native keyframe-based visual SLAM engine.

A from-scratch JAX/XLA/Pallas redesign of the capabilities of MAGE-SLAM
(Microsoft's C++ keyframe-based monocular/stereo visual SLAM library,
see /root/reference; public API reference:
Core/MAGESLAM/Source/MageSlam.h:25-187).

Architecture (TPU-first, NOT a port):
  - Functional state: the world map (keyframe poses, landmarks, association
    tables, covisibility) is a pytree of fixed-capacity padded device arrays
    (``mapstore.MapState``); all updates are pure jitted functions returning
    new state.  The reference's shared_mutex/proxy/state-machine concurrency
    machinery (ThreadSafeMap.h, Proxies/Proxy.h, Tasks/Schedule.cpp) becomes
    explicit state-version handoff in a host-side scheduler.
  - Batched kernels: FAST+BRIEF feature extraction, Hamming matching, RANSAC
    hypothesis scoring are fixed-shape batched ops (Pallas kernels on the hot
    paths) instead of per-feature scalar loops.
  - First-class JAX solvers: Levenberg-Marquardt bundle adjustment with
    sparse Schur complement, PnP, essential-matrix RANSAC, and Sim3
    pose-graph optimization replace the g2o/BundlerLib backend.
  - Scaling: keyframe-block sharding over a ``jax.sharding.Mesh`` with
    collective Schur reduction for distributed BA (``parallel``).
"""

__version__ = "0.1.0"

from mageslam_tpu.config import MageSlamSettings  # noqa: F401
