"""Measure dense Hamming matching vs a simulated BoW direct-index path.

The reference accelerates feature matching with a BoW direct index
(FeatureMatcher.h:21-63 IndexedMatch: only compare descriptors quantized to
the same vocabulary node).  On TPU the trade inverts: the dense (N, M)
XOR+popcount matrix is one fused vectorized pass with NO data-dependent
control flow, while an indexed path needs dynamic gathers over ragged
per-node buckets.  This tool pins the numbers for PARITY.md.

Run on the TPU (default platform) or CPU (--cpu).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("platform:", jax.devices()[0].platform, jax.devices()[0])

    from mageslam_tpu.ops import matching

    rng = np.random.default_rng(0)
    for n in (512, 1024):
        da = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
        db = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
        va = jnp.ones(n, bool)
        vb = jnp.ones(n, bool)

        f = jax.jit(lambda a, b, x, y: matching.match(a, b, x, y))
        f(da, db, va, vb)[0].block_until_ready()
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = f(da, db, va, vb)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"dense match N=M={n}: {dt*1e3:.3f} ms "
              f"({n*n*8/dt/1e9:.1f} G popcnt-words/s)")

        # simulated direct-index: quantize to 64 nodes, mask cross-node
        # pairs (the BEST case for an index — same arithmetic savings
        # without the ragged-gather overhead a real bucketed layout pays)
        nodes_a = jnp.asarray(rng.integers(0, 64, n))
        nodes_b = jnp.asarray(rng.integers(0, 64, n))

        @jax.jit
        def indexed(a, b, x, y, na, nb):
            d = matching.hamming_matrix(a, b)
            same = na[:, None] == nb[None, :]
            d = jnp.where(same & x[:, None] & y[None, :], d, matching.BIG)
            best, second, idx = matching._top2_min(d)
            return jnp.where(best <= 50, idx, -1)

        indexed(da, db, va, vb, nodes_a, nodes_b).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out2 = indexed(da, db, va, vb, nodes_a, nodes_b)
        out2.block_until_ready()
        dt2 = (time.perf_counter() - t0) / iters
        print(f"node-masked match N=M={n}: {dt2*1e3:.3f} ms "
              f"(masking adds {100*(dt2-dt)/dt:+.0f}%)")


if __name__ == "__main__":
    main()
