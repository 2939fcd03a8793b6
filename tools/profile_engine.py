"""Decompose the fused-engine steady frame time (VERDICT r3 next #7).

Separates, at bench shapes (reference capacities, 440 features):
  - device: pure compute of one engine step (same state re-stepped,
    block_until_ready at the end of a 50-step chain)
  - dispatch: host-side cost of ONE step call (trace-cache hit, pytree
    flatten, transfer enqueue) with no sync
  - to_gray: the per-frame host->device image feed
  - loop: the real bench loop (process_frame incl. pacing + drain)

Usage: python tools/profile_engine.py [--cpu] [--phase device|feed|loop]

IMPORTANT (BASELINE.md timing gotcha): any measurement taken in the same
process after an engine drive is inflated by relay queueing — run one
--phase per process for honest numbers; with no --phase, this script
spawns itself once per phase.
"""

import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    phase = None
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
    else:
        for ph in ("loop", "device", "feed"):
            args = [sys.executable, __file__, "--phase", ph]
            if "--cpu" in sys.argv:
                args.append("--cpu")
            subprocess.run(args, timeout=900)
        return
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import ref_settings
    from mageslam_tpu.io.synthetic import (SyntheticWorld,
                                           default_calibration,
                                           orbit_trajectory)
    from mageslam_tpu.ops import pyramid
    from mageslam_tpu.runtime import device_engine as de
    from mageslam_tpu.runtime.fused import MageSlamTPUFused

    settings = ref_settings()
    cal = default_calibration()
    world = SyntheticWorld.create(700, seed=3)
    poses = orbit_trajectory(60, radius=2.0, forward=0.008, sweep=0.9)
    imgs = [world.render(cal, p, seed=500 + i) for i, p in enumerate(poses)]

    print(f"platform={jax.devices()[0].platform} phase={phase}", flush=True)
    N = 50

    if phase == "feed":
        # host->device feed costs, measured in a CLEAN process (no prior
        # engine drive — relay queueing would inflate these ~50x)
        g = jnp.asarray(imgs[0])
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(N):
            g = jnp.asarray(imgs[i % 40])
        jax.block_until_ready(g)
        print(f"frame feed (jnp.asarray) per frame: "
              f"{(time.perf_counter()-t0)/N*1e3:.2f} ms", flush=True)

        g = pyramid.to_gray_f32(imgs[0])
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(N):
            g = pyramid.to_gray_f32(imgs[i % 40])
        jax.block_until_ready(g)
        print(f"to_gray_f32 per frame (legacy): "
              f"{(time.perf_counter()-t0)/N*1e3:.2f} ms", flush=True)
        return

    # ---- drive 40 frames to reach steady state (map initialized)
    eng = MageSlamTPUFused(settings, cal, seed=1)
    for i, img in enumerate(imgs[:40]):
        eng.process_frame(img, timestamp=i / 30.0)
    eng.flush()

    if phase == "loop":
        # full loop at steady state (the bench.py measurement)
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            for i, img in enumerate(imgs[40:]):
                eng.process_frame(img, timestamp=(40 + r * 20 + i) / 30.0)
        eng.flush()
        loop_ms = (time.perf_counter() - t0) / (reps * len(imgs[40:])) * 1e3
        print(f"full loop per frame: {loop_ms:.2f} ms "
              f"({1e3/loop_ms:.1f} fps)", flush=True)
        return

    # phase == "device"
    st = eng._state
    gray = jnp.asarray(imgs[40])   # raw frame: conversion is in-jit now
    jax.block_until_ready(gray)
    step = eng._step

    def copy_state(s):
        # _step donates its state arg; experiments each need a fresh copy
        return jax.tree.map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, s)

    st2, out = step(copy_state(st), gray, 1.0, 41)
    jax.block_until_ready(out)

    s_ = copy_state(st)
    t0 = time.perf_counter()
    for _ in range(N):
        s_, o = step(s_, gray, 1.0, 41)
    jax.block_until_ready(o)
    dev_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"device step (chained, blocked): {dev_ms:.2f} ms", flush=True)

    ts_d = []
    s_ = copy_state(st)
    for _ in range(N):
        t0 = time.perf_counter()
        s_, o = step(s_, gray, 1.0, 41)
        ts_d.append(time.perf_counter() - t0)
    jax.block_until_ready(o)
    print(f"dispatch per step: median {np.median(ts_d)*1e3:.2f} ms  "
          f"p90 {np.percentile(ts_d, 90)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
