#!/usr/bin/env python
"""Clean stage decomposition of the dense search (artifact-hardened).

Round-4 re-profile: the round-1 speed-of-light table attributed ~5 ms of
the headline batch to XLA gathers (tile placement + epilogue), based on
timings that benchmarks/rowdma_microbench.py later showed can be polluted
two ways on this runtime: (a) repeated identical (executable, args) calls
get memoized and read near-zero, (b) eager index-variation helpers that
bake Python scalars into program constants (jnp.roll) recompile per rep
and read catastrophically slow. This profiler:

  * varies every timed call's inputs through a never-repeating counter
    (device-scalar shifts, traced — no per-rep recompiles, no repeats);
  * interleaves engines across multiple trials and reports min/median
    (the chip is time-shared; min is the uncontended number);
  * decomposes: full search | coarse+v/base | prep-rank | placement
    gathers | kernel | epilogue gathers | final merge.

Run: python benchmarks/profile_stages.py [--n 1000000] [--nq 16384]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--kc", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ivfadc_tpu.utils.timing import roundtrip_latency, true_time
    from benchmarks.profile_search import get_index

    d, kq = 128, 256
    base, idx = get_index(args.n, args.kc, args.m, kq, d)
    rng = np.random.RandomState(1)
    B, w, k = args.nq, args.w, args.k
    # queries from perturbed base points give realistic cell skew; only
    # the (B, d) query slice crosses the (slow, tunneled) host->device path
    qdev = jnp.asarray(base[rng.choice(args.n, B)] +
                       0.05 * rng.randn(B, d).astype(np.float32))
    del base
    rpc = roundtrip_latency()
    print(f"(rpc {rpc*1e3:.1f} ms)", file=sys.stderr)

    chunk = idx._effective_chunk()
    dev = idx.store.device_view_dense(idx.quantizer, idx.config.scan_chunk,
                                      cache=idx._resolve_cache())
    kc, pb, nf = args.kc, idx.config.scan_pb, idx.config.scan_fold_lanes

    # ---- traced stage functions (jitted once; vary via traced shift) ----
    @jax.jit
    def vary(q, s):
        return q + 1e-6 * s

    @functools.partial(jax.jit, static_argnames=("w_",))
    def coarse_stage(q, w_):
        cells, cdists = idx.coarse.search(q, w_)
        cent = idx.coarse.centroids[cells]
        r = q[:, None, :] - cent
        return cells, (-2.0 * r).astype(jnp.bfloat16), \
            jnp.sum(r * r, axis=-1) + cdists

    from ivfadc_tpu.ops.cell_rank import cell_ranks
    from ivfadc_tpu.ops import pallas_scan as ps

    P = B * w
    T_max = P // pb + min(kc, P) + 1

    @jax.jit
    def rank_stage(cells):
        cells_flat = cells.reshape(-1).astype(jnp.int32)
        ranks, counts = cell_ranks(cells_flat, kc=kc)
        tile_base, _, _, _, tile_start, tile_size = ps._tile_map(
            counts, dev["offsets"], dev["sizes"], pb, T_max, kc)
        row = (tile_base[cells_flat] + ranks // pb) * pb + ranks % pb
        return tile_start, tile_size, row

    @jax.jit
    def placement_stage(v, base, row):
        inv_row = jnp.full((T_max * pb,), P, jnp.int32) \
            .at[row].set(jnp.arange(P, dtype=jnp.int32), unique_indices=True)
        v_pad = jnp.concatenate(
            [v.reshape(P, d), jnp.zeros((1, d), jnp.bfloat16)])
        base_pad = jnp.concatenate(
            [base.reshape(P, 1).astype(jnp.float32),
             jnp.full((1, 1), jnp.inf, jnp.float32)])
        return v_pad[inv_row], base_pad[inv_row]

    # _grouped_call applies the out[row] epilogue itself, so this stage is
    # kernel + epilogue; kernel-alone = this minus the epilogue stage
    def kernel_stage(tile_start, tile_size, v_tiles, base_tiles, row):
        return ps._grouped_call(
            tile_start, tile_size, v_tiles, base_tiles,
            dev["decoded"], dev["scale"], dev["ids2d"], row,
            B, w, d, T_max=T_max, k_out=min(k, 128), chunk=chunk,
            norm_coef=1.0, pb=pb, merge="fold", nf=nf, pos8=False,
            emit_ids=True, int8=dev["decoded"].dtype == jnp.int8,
            interpret=False)
    kernel_stage = jax.jit(kernel_stage)

    @jax.jit
    def epilogue_stage(out_d_flat, out_p_flat, row):
        return out_d_flat[row].reshape(B, w, nf), \
            out_p_flat[row].reshape(B, w, nf)

    @functools.partial(jax.jit, static_argnames=("k_",))
    def merge_stage(cand_d, cand_p, k_):
        from ivfadc_tpu.ops.topk import topk_lastdim
        dists, pick = topk_lastdim(cand_d.reshape(B, w * nf), k_)
        ids = jnp.take_along_axis(cand_p.reshape(B, w * nf), pick, axis=1)
        return ids, dists

    # ---- materialize once for stage inputs ----
    cells0, v0, base0 = jax.block_until_ready(coarse_stage(qdev, w))
    ts0, tz0, row0 = jax.block_until_ready(rank_stage(cells0))
    vt0, bt0 = jax.block_until_ready(placement_stage(v0, base0, row0))
    kd0, kp0 = jax.block_until_ready(
        kernel_stage(ts0, tz0, vt0, bt0, row0))     # (B, w, nf) probe order
    # tile-order candidate arrays of the epilogue's true gather shape
    kd_flat = jnp.zeros((T_max * pb, nf), jnp.float32) + \
        kd0.reshape(-1, nf).mean()
    kp_flat = jnp.zeros((T_max * pb, nf), jnp.int32)
    ed0, ep0 = jax.block_until_ready(epilogue_stage(kd_flat, kp_flat, row0))

    import itertools
    ctr = itertools.count(1)

    def s(i=None):
        return jnp.int32(next(ctr))

    stages = {
        "full_search": lambda i: idx._device_search(vary(qdev, s()), k, w),
        "coarse+v/base": lambda i: coarse_stage(vary(qdev, s()), w),
        "rank+tilemap": lambda i: rank_stage(
            jnp.mod(cells0 + jnp.int32(next(ctr)), kc)),
        "placement": lambda i: placement_stage(
            v0 + jnp.bfloat16(1e-3) * s().astype(jnp.bfloat16),
            base0, jnp.mod(row0 + s() * pb, T_max * pb)),
        "kernel+epi": lambda i: kernel_stage(ts0, tz0, vt0,
                                             bt0 + 1e-6 * s(), row0),
        "epilogue": lambda i: epilogue_stage(
            kd_flat, kp_flat, jnp.mod(row0 + s() * pb, T_max * pb)),
        "merge_topk": lambda i: merge_stage(ed0 + 1e-6 * s(), ep0, k),
    }
    for f in stages.values():
        jax.block_until_ready(f(0))          # compile
    res = {name: [] for name in stages}
    for _ in range(args.trials):
        for name, f in stages.items():
            res[name].append(true_time(f, reps=6, warm=0, baseline=rpc))
    out = {}
    for name, v in res.items():
        v = np.asarray(v) * 1e3
        out[name] = {"min_ms": round(float(v.min()), 3),
                     "med_ms": round(float(np.median(v)), 3),
                     "max_ms": round(float(v.max()), 3)}
        print(json.dumps({"stage": name, **out[name]}))
    # epilogue is contained in kernel+epi — don't double count it
    known = sum(out[n]["min_ms"] for n in out
                if n not in ("full_search", "epilogue"))
    print(json.dumps({"stage": "sum_of_stages(min)",
                      "min_ms": round(known, 3),
                      "full_min_ms": out["full_search"]["min_ms"],
                      "kernel_alone_est_ms": round(
                          out["kernel+epi"]["min_ms"]
                          - out["epilogue"]["min_ms"], 3)}))


if __name__ == "__main__":
    main()
