"""Microbenchmark + correctness check for gmix_tpu.ops.rowmove.

Compares XLA row gather/scatter against the Pallas DMA-ring movers at the
codec's arena shapes, and asserts the pallas results equal the XLA fallback
bit-for-bit (pure memory movement, so equality is exact).

Usage: python tools/tpu_dma_bench.py [S ...]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmix_tpu.ops import rowmove

N_ITERS = 64


def timeit(name, step, init):
    def outer(c):
        def f(c, i):
            return step(c, i), ()

        c, _ = jax.lax.scan(f, c, jnp.arange(N_ITERS, dtype=jnp.int32))
        return c

    fn = jax.jit(outer, donate_argnums=(0,))
    c = fn(init)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    t0 = time.time()
    c = fn(c)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    dt = (time.time() - t0) / N_ITERS
    print(f"  {name:32s} {dt*1e6:9.1f} us/iter", flush=True)
    return dt


def check_correctness(S, N, M, W, dtype):
    rng = np.random.default_rng(1)
    tbl = jnp.asarray(rng.integers(0, 1000, (S, N, W)).astype(dtype))
    # unique per-stream indices
    idx = jnp.asarray(
        np.stack([rng.choice(N, M, replace=False) for _ in range(S)]).astype(np.int32)
    )
    upd = jnp.asarray(rng.integers(0, 1000, (S, M, W)).astype(dtype))
    g_p = jax.jit(rowmove.gather_rows)(tbl, idx)
    g_x = jax.jit(rowmove._xla_gather)(tbl, idx)
    assert np.array_equal(np.asarray(g_p), np.asarray(g_x)), "gather mismatch"
    s_p = jax.jit(rowmove.scatter_rows)(tbl, idx, upd)
    s_x = jax.jit(rowmove._xla_scatter)(tbl, idx, upd)
    assert np.array_equal(np.asarray(s_p), np.asarray(s_x)), "scatter mismatch"
    print(f"  correctness OK (S={S} N={N} M={M} W={W} {np.dtype(dtype).name})", flush=True)


def main():
    streams = [int(a) for a in sys.argv[1:]] or [64]
    for S in streams:
        for (N, M, W, dtype, tag) in (
            (31232, 41, 256, np.uint16, "ind-blocks"),
            (12924, 27, 128, np.float32, "mixer-stable"),
            (12924, 6, 128, np.float32, "mixer-vary"),
            (8448, 9, 256, np.uint16, "ppm-rows"),
        ):
            print(f"S={S} N={N} M={M} W={W} {np.dtype(dtype).name} ({tag})", flush=True)
            try:
                check_correctness(S, N, M, W, dtype)
            except Exception as e:
                print(f"  CORRECTNESS FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
                continue
            rng = np.random.default_rng(0)
            tbl0 = jnp.zeros((S, N, W), dtype)
            idx0 = jnp.asarray(rng.integers(0, N, (S, M), np.int32))
            upd0 = jnp.asarray(rng.integers(0, 100, (S, M, W)).astype(dtype))

            def rot(i):
                return (idx0 + i) % N

            def fresh():
                return (jnp.zeros((S, N, W), dtype), jnp.zeros((S, M, W), jnp.float32))

            timeit("xla gather", lambda c, i: (c[0], c[1] + rowmove._xla_gather(c[0], rot(i)).astype(jnp.float32)), fresh())
            timeit("xla scatter", lambda c, i: (rowmove._xla_scatter(c[0], rot(i), upd0), c[1]), fresh())
            if jax.default_backend() == "tpu":
                timeit("pallas gather", lambda c, i: (c[0], c[1] + rowmove.gather_rows(c[0], rot(i)).astype(jnp.float32)), fresh())
                timeit("pallas scatter", lambda c, i: (rowmove.scatter_rows(c[0], rot(i), upd0), c[1]), fresh())


if __name__ == "__main__":
    main()
