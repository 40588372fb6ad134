"""Round-4 scatter experiment 2: how does the ~85ns/row XLA:TPU scatter cost
scale with (a) row WIDTH, (b) dtype, (c) one big call vs many small calls,
(d) element scatters? Decides whether colocating same-context tables into
wide fused rows (VERDICT r3 ask #1a) actually reduces wall time: it only pays
if an e.g. 1024-lane u16 row costs ~the same as a 256-lane one.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ITER = 256
S = 128


def timeit(body, init):
    def outer(w):
        def step(w, i):
            return body(w, i), ()

        w, _ = jax.lax.scan(step, w, jnp.arange(N_ITER, dtype=jnp.int32))
        return w

    jfn = jax.jit(outer, donate_argnums=(0,))
    w = jfn(init)
    jax.block_until_ready(w)
    t0 = time.time()
    w = jfn(w)
    jax.block_until_ready(w)
    return (time.time() - t0) / N_ITER


def run(K, W, dtype, ncalls=1, label=""):
    rng = np.random.default_rng(0)
    # keep the arena <= ~3 GiB
    T = min(2048, (3 << 30) // (S * K * W * np.dtype(dtype).itemsize))
    base = (np.arange(K) * T)[None, :]
    idx0 = jnp.asarray(base + rng.integers(0, T, (S, K)), jnp.int32)
    upd = jnp.asarray(rng.integers(0, 100, (S, K, W)).astype(dtype))
    s_ix = jnp.arange(S)[:, None]
    rows = S * K

    def body(w, i):
        idx = (idx0 + i * 7) % T + jnp.asarray(base, jnp.int32)
        if ncalls == 1:
            return w.at[s_ix, idx].set(upd, unique_indices=True)
        step = K // ncalls
        for c in range(ncalls):
            sl = slice(c * step, (c + 1) * step)
            w = w.at[s_ix, idx[:, sl]].set(upd[:, sl], unique_indices=True)
        return w

    dt = timeit(body, jnp.zeros((S, K * T, W), dtype))
    bw = rows * W * np.dtype(dtype).itemsize / dt / 1e9
    print(
        f"{label:34s} K={K:3d} W={W:4d} {np.dtype(dtype).name:7s} calls={ncalls:2d}"
        f" {dt*1e6:9.1f} us  {dt/rows*1e9:7.1f} ns/row  {bw:6.1f} GB/s",
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "width"
    if which == "width":
        for W in (32, 128, 256, 512):
            run(80, W, np.float32, 1, "f32 width sweep")
        for W in (256, 512, 1024):
            run(80, W, np.uint16, 1, "u16 width sweep")
    elif which == "calls":
        run(80, 128, np.float32, 1, "one call")
        run(80, 128, np.float32, 4, "4 calls")
        run(80, 128, np.float32, 16, "16 calls")
    elif which == "rows":
        for K in (10, 20, 40, 80, 160):
            run(K, 128, np.float32, 1, "row-count sweep")
    elif which == "elem":
        for W in (1, 2, 8):
            run(40, W, np.uint32, 1, "narrow/element")
    elif which == "mode":
        main_mode()




def run_mode(K, W, dtype, mode, label=""):
    rng = np.random.default_rng(0)
    T = min(2048, (3 << 30) // (S * K * W * np.dtype(dtype).itemsize))
    base = (np.arange(K) * T)[None, :]
    idx0 = jnp.asarray(base + rng.integers(0, T, (S, K)), jnp.int32)
    upd = jnp.asarray(rng.integers(0, 100, (S, K, W)).astype(dtype))
    s_ix = jnp.arange(S)[:, None]
    rows = S * K

    def body(w, i):
        idx = (idx0 + i * 7) % T + jnp.asarray(base, jnp.int32)
        kw = {"unique_indices": True}
        if mode:
            kw["mode"] = mode
        return w.at[s_ix, idx].set(upd, **kw)

    dt = timeit(body, jnp.zeros((S, K * T, W), dtype))
    print(
        f"{label:34s} K={K:3d} W={W:4d} mode={mode or 'default':20s}"
        f" {dt*1e6:9.1f} us  {dt/rows*1e9:7.1f} ns/row",
        flush=True,
    )


def main_mode():
    for mode in (None, "promise_in_bounds", "drop"):
        run_mode(80, 128, np.float32, mode, "bounds-mode sweep")
    run_mode(41, 640, np.uint16, "promise_in_bounds", "fused-row width")
    run_mode(41, 256, np.uint16, "promise_in_bounds", "ind-row u16")


if __name__ == "__main__":
    main()
