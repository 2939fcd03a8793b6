"""Distributed bundle adjustment over a device mesh.

The multi-chip scaling path (BASELINE.json config 5; SURVEY.md §2.2): the
reference is a single-process library, so this subsystem is new TPU-native
design — keyframe/landmark-block sharding over a ``jax.sharding.Mesh`` with
collective Schur reduction:

  - The landmark-major observation table is sharded along L across the
    ``shard`` mesh axis (landmark blocks per device); keyframe poses are
    replicated (cameras are few — the dense (6K, 6K) camera system is the
    coupling term).
  - Each device linearizes its landmark block, reduces its landmarks
    analytically (local V^-1), and builds a *partial* camera system; one
    ``psum`` per LM iteration reduces {S, b} over ICI.
  - Every device solves the reduced camera system identically (replicated
    compute beats a gather/scatter for K<=256) and back-substitutes its own
    landmarks locally.  No other communication is needed.

Communication per LM step: one psum of (K+1)^2*36 + (K+1)*6 floats —
independent of landmark count, so scaling efficiency approaches the
landmark-linearization fraction of the step (the solve is the replicated
constant term).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mageslam_tpu.solvers.bundle_adjust import (BAProblem, BAResult,
                                                bundle_adjust_impl)

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (AXIS,))


def replicated_host_copy(arr, mesh: Mesh):
    """Full host copy of a mesh-resident array in BOTH deployment modes.

    Single-process: plain device_get.  Multi-controller (jax.distributed):
    the array may span non-addressable devices, so all-gather it to a
    replicated layout first — then every process's local shard 0 IS the
    complete array."""
    if arr.is_fully_addressable:
        return jax.device_get(arr)
    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))(arr)
    import numpy as np
    return np.asarray(rep.addressable_data(0))


def shard_problem(problem: BAProblem, mesh: Mesh) -> BAProblem:
    """Place the problem: L-dim arrays sharded over the mesh axis, keyframe
    and tether arrays replicated.  L must be divisible by the shard count
    (pad with invalid landmarks otherwise).

    Multi-controller mode (jax.process_count() > 1): the mesh spans
    non-addressable devices, so arrays are assembled per-process from the
    (identical, SPMD-replicated) host data via make_array_from_callback —
    each process materializes only its addressable shards."""
    import numpy as np
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1

    def put(x, s):
        if multiprocess:
            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, s, lambda idx, xnp=xnp: xnp[idx])
        return jax.device_put(x, s)

    return BAProblem(
        kf_poses=put(problem.kf_poses, repl),
        kf_fixed=put(problem.kf_fixed, repl),
        points=put(problem.points, sharded),
        point_valid=put(problem.point_valid, sharded),
        obs_kf=put(problem.obs_kf, sharded),
        obs_xn=put(problem.obs_xn, sharded),
        obs_valid=put(problem.obs_valid, sharded),
        tether_i=put(problem.tether_i, repl),
        tether_j=put(problem.tether_j, repl),
        tether_type=put(problem.tether_type, repl),
        tether_pose=put(problem.tether_pose, repl),
        tether_dist=put(problem.tether_dist, repl),
        tether_weight=put(problem.tether_weight, repl),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "num_steps"))
def distributed_bundle_adjust(problem: BAProblem,
                              huber_delta,
                              max_outlier_error,
                              mesh: Mesh,
                              num_steps: int = 5,
                              lam0=1e-4) -> BAResult:
    """shard_map'd LM-BA: landmark blocks per device, collective Schur
    reduction, replicated camera solve."""
    lp = P(AXIS)
    rp = P()
    in_specs = (
        BAProblem(
            kf_poses=rp, kf_fixed=rp,
            points=lp, point_valid=lp,
            obs_kf=lp, obs_xn=lp, obs_valid=lp,
            tether_i=rp, tether_j=rp, tether_type=rp,
            tether_pose=rp, tether_dist=rp, tether_weight=rp,
        ),
        rp, rp, rp,
    )
    out_specs = BAResult(
        kf_poses=rp,      # identical on all shards
        points=lp,        # local landmark blocks
        mean_sq_error=rp,
        lam=rp,
        outliers=lp,
        num_inlier_obs=rp,
    )

    def body(pr, hd, moe, l0):
        return bundle_adjust_impl(pr, hd, moe, num_steps=num_steps,
                                  lam0=l0, axis_name=AXIS)

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return fn(problem, jnp.asarray(huber_delta, jnp.float32),
              jnp.asarray(max_outlier_error, jnp.float32),
              jnp.asarray(lam0, jnp.float32))
