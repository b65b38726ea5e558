#!/usr/bin/env python
"""Decompose search latency on the current backend.

Builds (once, cached in .cache/) a SIFT1M-shape index, then times:
  * coarse probe alone
  * full dense search
  * the Pallas grouped scan alone (precomputed inputs)
  * the host->kernel prep (sort/bookkeeping) alone
  * sweeps over pb / chunk / k_out

Usage: python benchmarks/profile_search.py [--n 1000000] [--sweep]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))


_BASE = [None]


def timeit(fn, reps=20, warm=2):
    from ivfadc_tpu.utils.timing import roundtrip_latency, true_time
    if _BASE[0] is None:
        _BASE[0] = roundtrip_latency()
        print(f"(rpc roundtrip: {_BASE[0]*1e3:.1f} ms)")
    return true_time(fn, reps=reps, warm=warm, baseline=_BASE[0])


def get_index(n, kc, m, kq, d, seed=0):
    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.datasets import load_or_synthesize

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"idx_n{n}_kc{kc}_m{m}_k{kq}_d{d}.npz")
    base = load_or_synthesize("sift_base", n, d, seed=seed)
    if os.path.exists(path):
        idx = IVFADCIndex.load(path)
    else:
        t0 = time.time()
        idx = IVFADCIndex.build(base, kc=kc, k=kq, m=m, seed=seed,
                                kmeanspp_sample=min(n, 65536))
        print(f"build: {time.time() - t0:.1f}s  timings="
              f"{ {k: round(v, 1) for k, v in idx.build_timings.items()} }")
        idx.save(path)
    return base, idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=4096)
    ap.add_argument("--kc", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    d, kq = 128, 256
    base, idx = get_index(args.n, args.kc, args.m, kq, d)
    rng = np.random.RandomState(1)
    queries = (base[rng.choice(len(base), args.nq)] +
               0.05 * rng.randn(args.nq, d).astype(np.float32))
    qdev = jnp.asarray(queries)
    B, w, k = args.nq, args.w, args.k

    t = timeit(lambda: idx._device_search(qdev, k, w))
    print(f"full dense search      : {t*1e3:8.2f} ms  "
          f"({B/t:10.0f} qps)")

    t = timeit(lambda: idx.coarse.search(qdev, w))
    print(f"coarse probe alone     : {t*1e3:8.2f} ms")

    # --- kernel alone, with precomputed inputs ---
    from ivfadc_tpu.ops.pallas_scan import grouped_dense_scan
    chunk = idx.config.scan_chunk
    # profile the SAME cache tier the production path resolves (auto->int8)
    dev = idx.store.device_view_dense(idx.quantizer, chunk,
                                      cache=idx._resolve_cache())
    cells, cdists = jax.block_until_ready(idx.coarse.search(qdev, w))
    cent = idx.coarse.centroids[cells]
    r = qdev[:, None, :] - cent
    v = -2.0 * r
    bse = jnp.sum(r * r, axis=-1) + cdists
    v, bse = jax.block_until_ready((v, bse))

    interp = jax.default_backend() == "cpu"

    def run(pb=None, ch=None, k_out=None):
        return grouped_dense_scan(
            cells, dev["offsets"], dev["sizes"], v, bse, dev["decoded"],
            dev["scale"],
            kc=args.kc, k_out=k_out or min(k, 128), chunk=ch or chunk,
            norm_coef=1.0, pb=pb or idx.config.scan_pb, interpret=interp)

    t = timeit(lambda: run())
    print(f"grouped scan (pb={idx.config.scan_pb}, chunk={chunk}, "
          f"k_out={min(k,128)}): {t*1e3:8.2f} ms")

    # --- stage breakdown of the grouped scan (replicated internals) ---
    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ivfadc_tpu.ops import pallas_scan as ps

    kc, pb = args.kc, idx.config.scan_pb
    offsets, sizes_d, decoded = dev["offsets"], dev["sizes"], dev["decoded"]

    @ft.partial(jax.jit, static_argnames=("w",))
    def coarse_stage(q, w):
        cells, cdists = idx.coarse.search(q, w)
        cent = idx.coarse.centroids[cells]
        r = q[:, None, :] - cent
        return cells, -2.0 * r, jnp.sum(r * r, axis=-1) + cdists

    t = timeit(lambda: coarse_stage(qdev, w))
    print(f"  stage coarse+v/base  : {t*1e3:8.2f} ms")

    @ft.partial(jax.jit, static_argnames=("kc", "pb"))
    def prep_stage(cells, offsets, sizes, v, base, *, kc, pb):
        B, w, d = v.shape
        P = B * w
        T_max = P // pb + min(kc, P) + 1
        cells_flat = cells.reshape(-1).astype(jnp.int32)
        order = jnp.argsort(cells_flat, stable=True).astype(jnp.int32)
        sorted_cells = cells_flat[order]
        crange = jnp.arange(kc, dtype=jnp.int32)
        cell_first = jnp.searchsorted(sorted_cells, crange).astype(jnp.int32)
        cell_last = jnp.searchsorted(sorted_cells, crange,
                                     side="right").astype(jnp.int32)
        counts = cell_last - cell_first
        nt = (counts + pb - 1) // pb
        tile_base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                     jnp.cumsum(nt)[:-1].astype(jnp.int32)])
        total_tiles = jnp.sum(nt)
        trange = jnp.arange(T_max, dtype=jnp.int32)
        c_t = jnp.clip(jnp.searchsorted(tile_base, trange, side="right") - 1,
                       0, kc - 1).astype(jnp.int32)
        j_t = trange - tile_base[c_t]
        tile_valid = trange < total_tiles
        tile_sorted_start = cell_first[c_t] + j_t * pb
        tile_count = jnp.where(tile_valid,
                               jnp.clip(counts[c_t] - j_t * pb, 0, pb), 0)
        tile_start = jnp.where(tile_valid, offsets[c_t], 0).astype(jnp.int32)
        tile_size = jnp.where(tile_valid, sizes[c_t], 0).astype(jnp.int32)
        srange = jnp.arange(pb, dtype=jnp.int32)
        sp = tile_sorted_start[:, None] + srange[None, :]
        slot_valid = srange[None, :] < tile_count[:, None]
        probe_idx = order[jnp.clip(sp, 0, P - 1)]
        v_tiles = v.reshape(P, d)[probe_idx].reshape(T_max * pb, d)
        base_tiles = jnp.where(slot_valid, base.reshape(-1)[probe_idx],
                               jnp.inf).reshape(T_max * pb, 1)
        inv = jnp.argsort(order, stable=True).astype(jnp.int32)
        rank = inv - cell_first[cells_flat]
        row = (tile_base[cells_flat] + rank // pb) * pb + rank % pb
        return (tile_start, tile_size, v_tiles.astype(jnp.bfloat16),
                base_tiles, row)

    cells_c, v_c, base_c = jax.block_until_ready(coarse_stage(qdev, w))
    t = timeit(lambda: prep_stage(cells_c, offsets, sizes_d, v_c, base_c,
                                  kc=kc, pb=pb))
    print(f"  stage prep (sort etc): {t*1e3:8.2f} ms")

    tile_start, tile_size, v_tiles, base_tiles, row = prep_stage(
        cells_c, offsets, sizes_d, v_c, base_c, kc=kc, pb=pb)

    @ft.partial(jax.jit, static_argnames=("chunk", "k_out", "pb"))
    def kernel_stage(tile_start, tile_size, v_tiles, base_tiles, decoded,
                     *, chunk, k_out, pb):
        T_max = tile_start.shape[0]
        d_ = v_tiles.shape[-1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T_max,),
            in_specs=[
                pl.BlockSpec((pb, d_), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pb, 1), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((8, d_), lambda t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((pb, 128), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pb, 128), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, chunk, d_),
                           decoded.dtype if decoded.dtype == jnp.int8
                           else jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2,), jnp.int32),
            ],
        )
        kern = ft.partial(ps._grouped_scan_kernel, chunk=chunk, k_out=k_out,
                          norm_coef=1.0, pb=pb,
                          int8=decoded.dtype == jnp.int8)
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((T_max * pb, 128), jnp.float32),
                jax.ShapeDtypeStruct((T_max * pb, 128), jnp.int32),
            ],
            interpret=interp,
        )(tile_start, tile_size, v_tiles, base_tiles, decoded,
          jnp.ones((8, d_), jnp.bfloat16))

    try:
        t = timeit(lambda: kernel_stage(
            tile_start, tile_size, v_tiles, base_tiles, decoded,
            chunk=chunk, k_out=min(k, 128), pb=pb))
        print(f"  stage pallas kernel  : {t*1e3:8.2f} ms")
    except Exception as e:
        print(f"  stage pallas kernel  : FAIL {type(e).__name__}: {e}")

    @jax.jit
    def post_stage(out_d, out_p, row, ids):
        B_, w_ = cells_c.shape
        row = jnp.clip(row, 0, out_d.shape[0] - 1)
        od = out_d[row].reshape(B_, w_ * 128)
        op = out_p[row].reshape(B_, w_ * 128)
        neg, which = jax.lax.top_k(-od, k)
        pos = jnp.take_along_axis(op, which, axis=1)
        out_ids = jnp.where(pos >= 0, ids[jnp.where(pos >= 0, pos, 0)], -1)
        return out_ids, -neg

    out_d0, out_p0 = run()
    fake_d = out_d0.reshape(-1, 128)
    fake_p = out_p0.reshape(-1, 128)
    t = timeit(lambda: post_stage(fake_d, fake_p, row, dev["ids"]))
    print(f"  stage post (map+topk): {t*1e3:8.2f} ms")

    # DMA speed-of-light estimate
    sizes = np.asarray(idx.store.sizes)
    caps = np.asarray(idx.store.caps)
    counts = np.bincount(np.asarray(cells).ravel(), minlength=args.kc)
    pb0 = idx.config.scan_pb
    tiles = (counts + pb0 - 1) // pb0
    bpd = dev["decoded"].dtype.itemsize            # 1 (int8) or 2 (bf16)
    dma_bytes = float(np.sum(tiles * np.ceil(caps / chunk) * chunk * d * bpd))
    print(f"  (DMA volume {dma_bytes/1e6:.0f} MB -> "
          f"{dma_bytes/819e9*1e3:.2f} ms at 819 GB/s)")

    if args.sweep:
        for pb in (8, 16, 32, 64):
            for ch in (512, 1024, 2048):
                try:
                    t = timeit(lambda: run(pb=pb, ch=ch), reps=5)
                    print(f"  pb={pb:3d} chunk={ch:5d}: {t*1e3:8.2f} ms")
                except Exception as e:
                    print(f"  pb={pb:3d} chunk={ch:5d}: FAIL {type(e).__name__}")
        for k_out in (1, 4, 10, 32):
            t = timeit(lambda: run(k_out=k_out), reps=5)
            print(f"  k_out={k_out:3d}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
