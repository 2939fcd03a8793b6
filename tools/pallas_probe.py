"""Minimal probe: compile + time the Pallas FAST kernel on the TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("platform:", jax.devices()[0].platform, flush=True)

from mageslam_tpu.ops import fast, fast_pallas

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (180, 320)).astype(np.float32))

t0 = time.perf_counter()
r_jnp = jax.block_until_ready(fast.detect(img, 20.0))
print(f"jnp compile+run {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
r_pal = jax.block_until_ready(fast_pallas.detect(img, 20.0))
print(f"pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)
print("max diff:", float(jnp.max(jnp.abs(r_jnp - r_pal))), flush=True)


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


print(f"jnp    {timeit(lambda: fast.detect(img, 20.0)):7.3f} ms", flush=True)
print(f"pallas {timeit(lambda: fast_pallas.detect(img, 20.0)):7.3f} ms",
      flush=True)
