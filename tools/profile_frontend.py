"""Per-op TPU timing for the frontend + tracking hot path.

Times each stage of extract_features and the fused tracking step in
isolation (20-run steady-state mean after warmup) to direct kernel
optimization work. Run on the real TPU:  python tools/profile_frontend.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mageslam_tpu.io.synthetic import SyntheticWorld, default_calibration
    from mageslam_tpu.ops import fast, orb, pyramid, select
    from mageslam_tpu.tracking.frontend import extract_features

    cal = default_calibration()
    world = SyntheticWorld.create(700, seed=3)
    img = jnp.asarray(world.render(cal, np.asarray(
        [0, 0, 0, 1, 0, 0, 0], np.float32), seed=7).astype(np.float32))

    smooth = jax.jit(lambda i: pyramid.gaussian_blur(i, 7))
    det = jax.jit(lambda i: fast.detect(i, 20.0))
    sel = jax.jit(lambda s: select.select_gridded(s, 320, 32, 32, 4))
    s = det(img)
    kps = sel(s)
    sm = smooth(img)
    oad = jax.jit(lambda i, uv: orb.orient_and_describe(i, uv, False))
    ef = jax.jit(lambda i: extract_features(
        i, cal, 20.0, max_features=320, num_levels=1))

    print(f"image {img.shape} on {jax.devices()[0].platform}")
    print(f"gaussian_blur      {timeit(smooth, img):7.3f} ms")
    print(f"fast.detect        {timeit(det, img):7.3f} ms")
    print(f"select_gridded     {timeit(sel, s):7.3f} ms")
    print(f"orient_describe    {timeit(oad, sm, kps.uv):7.3f} ms")
    print(f"extract_features   {timeit(ef, img):7.3f} ms")

    # tracking step from the graft entry (the flagship fused step)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out.pose)
    print(f"track_frame        "
          f"{timeit(lambda: jfn(*args)):7.3f} ms")


if __name__ == "__main__":
    main()
