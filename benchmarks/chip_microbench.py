#!/usr/bin/env python
"""Raw chip microbenchmarks: MXU TFLOP/s (bf16/f32), HBM read BW, D2H/H2D
transfer BW, jit launch latency, and the sort-family ops the search path
leans on (argsort / top_k / approx_min_k / iterative extraction).
Establishes speed-of-light targets for the kernels."""

from __future__ import annotations

import time

import numpy as np


def t(fn, reps=10, warm=2):
    import jax
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)

    n = 4096
    a32 = jnp.asarray(rng.randn(n, n), jnp.float32)
    b32 = jnp.asarray(rng.randn(n, n), jnp.float32)
    f = jax.jit(lambda a, b: a @ b)
    dt_s = t(lambda: f(a32, b32))
    print(f"matmul {n} f32         : {dt_s*1e3:7.2f} ms = "
          f"{2*n**3/dt_s/1e12:6.1f} TFLOP/s")
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)
    g = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))
    dt_s = t(lambda: g(a16, b16))
    print(f"matmul {n} bf16->f32   : {dt_s*1e3:7.2f} ms = "
          f"{2*n**3/dt_s/1e12:6.1f} TFLOP/s")

    x = jnp.asarray(rng.randn(1 << 26), jnp.float32)   # 256 MiB
    f = jax.jit(lambda x: jnp.sum(x))
    dt_s = t(lambda: f(x))
    print(f"HBM read (sum 256MiB)  : {dt_s*1e3:7.2f} ms = "
          f"{x.nbytes/dt_s/1e9:6.0f} GB/s")

    g = jnp.asarray(rng.randn(1 << 20, 128), jnp.float32)
    idxs = jnp.asarray(rng.permutation(1 << 20))
    f = jax.jit(lambda g, i: g[i])
    dt_s = t(lambda: f(g, idxs))
    print(f"row gather (1Mx128 f32): {dt_s*1e3:7.2f} ms = "
          f"{2*g.nbytes/dt_s/1e9:6.0f} GB/s")

    f = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0)
    for _ in range(3):
        jax.block_until_ready(f(s))
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        s = f(s)
    jax.block_until_ready(s)
    print(f"pipelined launch       : {(time.perf_counter()-t0)/reps*1e6:7.0f} us")
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(s))
    print(f"blocking  launch       : {(time.perf_counter()-t0)/20*1e6:7.0f} us")

    h = np.ones((16 << 20,), np.float32)               # 64 MB
    t0 = time.perf_counter()
    xd = jax.device_put(h)
    jax.block_until_ready(xd)
    h2d = time.perf_counter() - t0
    print(f"H2D 64MB               : {h2d*1e3:7.1f} ms = {h.nbytes/h2d/1e9:6.2f} GB/s")
    t0 = time.perf_counter()
    _ = np.asarray(xd[: 1 << 20])                      # 4 MB slice
    d2h = time.perf_counter() - t0
    print(f"D2H 4MB                : {d2h*1e3:7.1f} ms = {(4<<20)/d2h/1e9:6.3f} GB/s")

    # ---- sort-family ops on search-path shapes ----
    c = jnp.asarray(rng.randint(0, 1024, 32768), jnp.int32)
    f = jax.jit(lambda c: jnp.argsort(c, stable=True))
    print(f"argsort 32k i32        : {t(lambda: f(c))*1e3:7.2f} ms")

    q = jnp.asarray(rng.randn(4096, 1024), jnp.float32)
    f = jax.jit(lambda q: jax.lax.top_k(q, 8))
    print(f"top_k(8)   (4096,1024) : {t(lambda: f(q))*1e3:7.2f} ms")
    f = jax.jit(lambda q: jax.lax.approx_min_k(q, 8))
    print(f"approx_min_k(8) same   : {t(lambda: f(q))*1e3:7.2f} ms")
    f = jax.jit(lambda q: jax.lax.approx_min_k(q, 8, recall_target=0.99))
    print(f"approx_min_k(8,r=.99)  : {t(lambda: f(q))*1e3:7.2f} ms")
    f = jax.jit(lambda q: jax.lax.top_k(q, 10))
    print(f"top_k(10)  (4096,1024) : {t(lambda: f(q))*1e3:7.2f} ms")
    f = jax.jit(lambda q: jax.lax.approx_min_k(q, 10, recall_target=0.99))
    print(f"approx_min_k(10,r=.99) : {t(lambda: f(q))*1e3:7.2f} ms")

    def iter_min_k(q, k):
        outs_d, outs_i = [], []
        cur = q
        for _ in range(k):
            i = jnp.argmin(cur, axis=1)
            d = jnp.min(cur, axis=1)
            outs_d.append(d)
            outs_i.append(i.astype(jnp.int32))
            cur = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
                == i[:, None], jnp.inf, cur)
        return jnp.stack(outs_d, 1), jnp.stack(outs_i, 1)

    f = jax.jit(lambda q: iter_min_k(q, 8))
    print(f"iter_min_k(8) same     : {t(lambda: f(q))*1e3:7.2f} ms")
    f = jax.jit(lambda q: iter_min_k(q, 10))
    print(f"iter_min_k(10) same    : {t(lambda: f(q))*1e3:7.2f} ms")

    # counting-sort building blocks (replace argsort grouping)
    f = jax.jit(lambda c: jnp.cumsum(
        (c[:, None] == jnp.arange(1024, dtype=jnp.int32)[None, :])
        .astype(jnp.float32), axis=0))
    print(f"cumsum onehot 32kx1024 : {t(lambda: f(c))*1e3:7.2f} ms")
    f = jax.jit(lambda c: jnp.zeros(32768, jnp.int32).at[
        jnp.argsort(c, stable=True)].set(jnp.arange(32768, dtype=jnp.int32)))
    print(f"argsort+scatter inverse: {t(lambda: f(c))*1e3:7.2f} ms")
    f = jax.jit(lambda c: jnp.sum(
        (c[:, None] == jnp.arange(1024, dtype=jnp.int32)[None, :])
        .astype(jnp.int32), axis=0))
    print(f"bincount-as-onehot-sum : {t(lambda: f(c))*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
