"""In-program microbenchmark: run each candidate op N times inside one
lax.scan so per-dispatch tunnel latency (~350us) is amortized away.

Replicates the mixer-table ops of the codec step at various stream counts to
find which op form causes the S>16 latency cliff.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 512  # scan iterations per dispatch
T, W = 4096, 128


def timeit(name, body, init_w, *aux):
    """body(w, i, *aux) -> w; scanned N times inside one jit."""

    def outer(w, *aux):
        def step(w, i):
            return body(w, i, *aux), ()

        w, _ = jax.lax.scan(step, w, jnp.arange(N, dtype=jnp.int32))
        return w

    fn = jax.jit(outer, donate_argnums=(0,))
    w = fn(init_w, *aux)
    jax.block_until_ready(w)
    t0 = time.time()
    w = fn(w, *aux)
    jax.block_until_ready(w)
    dt = (time.time() - t0) / N
    print(f"{name:44s} {dt*1e6:9.2f} us/iter", flush=True)


def main():
    for S, K in ((16, 24), (32, 24), (64, 24), (32, 8)):
        print(f"--- S={S} K={K} T={T} W={W}", flush=True)
        rng = np.random.default_rng(0)
        idx0 = jnp.asarray(rng.integers(0, T, (S, K), np.int32))
        upd = jnp.asarray(rng.normal(size=(S, K, W)).astype(np.float32))
        s_ix = jnp.arange(S)[:, None]
        k_ix = jnp.arange(K)[None, :]

        def rot(i):  # vary indices per iteration to defeat CSE
            return (idx0 + i) % T

        timeit("row gather (S,K,T,W)[s,k,idx]",
               lambda w, i: w + 0 * jnp.sum(w[s_ix, k_ix, rot(i)], axis=2,
                                            keepdims=True)[:, :, None, 0:1],
               jnp.zeros((S, K, T, W), jnp.float32))
        timeit("row set (S,K,T,W) unique+drop",
               lambda w, i: w.at[s_ix, k_ix, rot(i)].set(upd,
                                                         unique_indices=True,
                                                         mode="drop"),
               jnp.zeros((S, K, T, W), jnp.float32))
        timeit("row set 2d-reshape unique+drop",
               lambda w, i: w.reshape(S * K * T, W)
               .at[((s_ix * K + k_ix) * T + rot(i)).reshape(-1)]
               .set(upd.reshape(S * K, W), unique_indices=True, mode="drop")
               .reshape(S, K, T, W),
               jnp.zeros((S, K, T, W), jnp.float32))
        timeit("scalar set (S,K,T) unique+drop",
               lambda w, i: w.at[s_ix, k_ix, rot(i)].set(
                   jnp.float32(1), unique_indices=True, mode="drop"),
               jnp.zeros((S, K, T), jnp.float32))
        timeit("scalar gather (S,K,T)",
               lambda w, i: w.at[s_ix, k_ix, (rot(i) + 1) % T].set(
                   w[s_ix, k_ix, rot(i)] + 1.0, unique_indices=True,
                   mode="drop"),
               jnp.zeros((S, K, T), jnp.float32))
        # in-layer triangular chain: K sequential dot-accumulate steps
        rows = jnp.asarray(rng.normal(size=(S, K, W)).astype(np.float32))

        def chain(w, i, rows):
            dot_base = jnp.einsum("skw,sw->sk", rows, w[:, 0, :])
            outs = []
            for k in range(K):
                yk = dot_base[:, k]
                if k:
                    prev = jnp.stack(outs, axis=1)
                    yk = yk + jnp.einsum("sk,sk->s", rows[:, k, :k], prev)
                outs.append(yk)
            y = jnp.stack(outs, axis=1)
            return w.at[:, 1, : K].set(w[:, 1, :K] + y)

        timeit("triangular chain K steps", chain,
               jnp.zeros((S, 2, W), jnp.float32), rows)


if __name__ == "__main__":
    main()
