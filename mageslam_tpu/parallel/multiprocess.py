"""Multi-process (multi-controller) distributed execution harness.

The reference is a single-process library (SURVEY.md §2.2); the TPU
build's distributed-BA target (BASELINE.json config 5) is ">=80% scaling
at >=2 HOSTS", which means ``jax.distributed`` multi-controller SPMD:
every host runs the same program, the mesh spans processes, and the
collectives (the one psum/LM-step of distributed_ba.py) ride the
cross-host fabric (ICI/DCN on a pod; Gloo on the CPU certification rig).

This module provides both sides of that story:

  - ``init_multiprocess`` + ``run_worker``: the per-process entry.  A
    worker joins the coordination service, forms the GLOBAL mesh over
    all processes' devices, and runs (a) the standalone collective-Schur
    distributed BA and (b) the engine-wired global BA
    (``mapping.global_ba.engine_global_bundle_adjust`` — the fossilize /
    loop-closure path) on a deterministic certification payload, then
    writes its replicated results to an npz for the launcher to compare.
  - ``spawn_certification``: the launcher.  Spawns N OS processes with a
    local coordinator, waits, and verifies every process produced
    results IDENTICAL to each other and matching a single-process
    reference run.  Used by tests/test_multiprocess.py and by
    ``__graft_entry__.dryrun_multichip`` (MULTICHIP certification).

CPU rig specifics: each worker forces ``--xla_force_host_platform_device_
count=<local>`` (virtual devices) and Gloo CPU collectives.  On real TPU
pods the same code path runs with the default backend and ICI collectives
— nothing here is CPU-specific except the spawner's env vars.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

CERT_SEED = 7
CERT_K = 6          # keyframes in the certification map
CERT_NPOINTS = 96   # live landmarks
CERT_L = 512        # landmark capacity (divisible by any shard count <= 32)


def init_multiprocess(coordinator: str, num_processes: int,
                      process_id: int, platform: str = "cpu") -> None:
    """Join the jax.distributed coordination service.

    Must run before any device use.  On the CPU rig, also routes CPU
    collectives through Gloo (XLA's in-process CPU 'collectives' cannot
    cross OS processes).  NOTE on this box sitecustomize imports jax at
    interpreter startup, so the platform override must be jax.config,
    not the env var (see tests/conftest.py)."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def certification_map(settings=None):
    """Deterministic small MapState + settings for the parity check.

    Built identically in every process (SPMD: same host data, the mesh
    sharding decides which block each process materializes) and in the
    single-process reference run."""
    import dataclasses

    import jax.numpy as jnp

    from mageslam_tpu.config import MageSlamSettings
    from mageslam_tpu.geometry import se3
    from mageslam_tpu.mapstore import map_state as ms
    from mageslam_tpu.solvers import pnp
    from mageslam_tpu.tracking.frontend import FrameFeatures

    rng = np.random.default_rng(CERT_SEED)
    if settings is None:
        settings = MageSlamSettings()
    s = settings.replace(capacity=settings.capacity.__class__(
        max_features=128, max_keyframes=16, max_map_points=CERT_L,
        local_ba_keyframes=4, local_ba_points=128, pose_history_size=64))
    s = s.replace(parallel=dataclasses.replace(
        s.parallel, use_distributed_global_ba=True, min_devices=2))

    n = CERT_NPOINTS
    m = ms.empty_map(16, 128, CERT_L)
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 8, n)], -1).astype(np.float32)
    normal = (pts / np.linalg.norm(pts, axis=-1, keepdims=True)
              ).astype(np.float32)
    desc = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
    m, ids = ms.allocate_map_points(
        m, jnp.asarray(pts), jnp.asarray(desc[:n]),
        jnp.asarray(normal), 0, jnp.ones(n, bool))
    for k in range(CERT_K):
        pose = se3.make_pose(se3.so3_exp(jnp.array([0.0, 0.03 * k, 0.0])),
                             jnp.array([0.2 * k, 0.0, 0.0]))
        xn, _ = pnp.project_normalized(pose, jnp.asarray(pts))
        xn_noisy = jnp.asarray(
            np.asarray(xn) + rng.normal(0, 3e-4, (n, 2)).astype(np.float32))
        feats = FrameFeatures(
            uv=jnp.zeros((128, 2)).at[:n].set(xn * 272.0 + 160.0),
            xn_undist=jnp.zeros((128, 2)).at[:n].set(xn_noisy),
            response=jnp.ones(128), angle=jnp.zeros(128),
            octave=jnp.zeros(128, jnp.int32), desc=jnp.asarray(desc),
            valid=jnp.arange(128) < n)
        assoc = jnp.full(128, -1, jnp.int32).at[jnp.arange(n)].set(ids)
        m, _ = ms.insert_keyframe(m, pose, feats, assoc, k)
    return m, s


def run_certification(mesh=None):
    """The SPMD certification body: standalone distributed BA + the
    engine-wired global BA, both over `mesh` (defaults to all global
    devices).  Returns a dict of replicated numpy results — identical on
    every process by construction if the distributed path is correct."""
    import jax
    import jax.numpy as jnp

    from mageslam_tpu.mapping import global_ba
    from mageslam_tpu.parallel import distributed_ba as dba

    if mesh is None:
        mesh = dba.make_mesh()

    m, s = certification_map()

    # (a) standalone collective-Schur LM over the global problem
    win = global_ba.build_global_problem(m)
    sp = dba.shard_problem(win.problem, mesh)
    res = dba.distributed_bundle_adjust(
        sp, jnp.float32(0.01), jnp.float32(0.02), mesh, num_steps=6)
    standalone_poses = dba.replicated_host_copy(res.kf_poses, mesh)
    standalone_points = dba.replicated_host_copy(res.points, mesh)

    # (b) engine-wired path (fossilize / loop-closure dispatch)
    m2, res2 = global_ba.engine_global_bundle_adjust(
        m, s, 272.0, num_steps=6, lam0=1e-4)
    jax.block_until_ready(m2.kf_pose)

    return {
        "standalone_poses": np.asarray(standalone_poses),
        "standalone_points": np.asarray(standalone_points),
        "standalone_mse": np.float64(res.mean_sq_error),
        "engine_poses": np.asarray(m2.kf_pose),
        "engine_points": np.asarray(m2.mp_pos),
        "engine_mse": np.float64(res2.mean_sq_error),
        "n_global_devices": np.int64(mesh.devices.size),
    }


def worker_main(argv=None) -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    init_multiprocess(args.coordinator, args.num_processes,
                      args.process_id)
    import jax
    print(f"worker {args.process_id}: local={jax.local_device_count()} "
          f"global={jax.device_count()} "
          f"processes={jax.process_count()}", flush=True)
    out = run_certification()
    np.savez(args.out, **out)
    print(f"worker {args.process_id}: wrote {args.out}", flush=True)
    return 0


def spawn_certification(num_processes: int = 2, local_devices: int = 4,
                        timeout: float = 600.0):
    """Launcher: spawn the workers, collect their npz outputs, verify
    cross-process identity, and return the per-process result dicts.

    Raises on spawn failure, timeout, nonzero exit, or result mismatch
    between processes — callers decide whether that is skip (pytest on a
    constrained box) or hard failure (MULTICHIP certification)."""
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # worker pins cpu via jax.config
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)

    tmpdir = tempfile.mkdtemp(prefix="mageslam_mp_")
    outs = [os.path.join(tmpdir, f"worker{i}.npz")
            for i in range(num_processes)]
    procs = []
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    for i in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mageslam_tpu.parallel.multiprocess",
             "--coordinator", coord,
             "--num-processes", str(num_processes),
             "--process-id", str(i), "--out", outs[i]],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} exited rc={p.returncode}:\n{logs[i][-4000:]}")
    results = [dict(np.load(o)) for o in outs]
    r0 = results[0]
    for i, r in enumerate(results[1:], 1):
        for key in ("standalone_poses", "standalone_points",
                    "engine_poses", "engine_points"):
            if not np.array_equal(r0[key], r[key]):
                d = float(np.max(np.abs(r0[key] - r[key])))
                raise AssertionError(
                    f"process 0 vs {i} disagree on {key} (max |d|={d:g})"
                    " — multi-controller SPMD must produce identical"
                    " replicated results on every process")
    return results, logs


if __name__ == "__main__":
    sys.exit(worker_main())
