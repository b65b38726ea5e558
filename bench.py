#!/usr/bin/env python
"""Headline benchmark: QPS/chip at recall@10 (SIFT1M-shape, m=8, nprobe=8).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}

Baseline = the NumPy oracle of the reference's exact single-core search
algorithm (benchmarks/oracle.py) running on this host, since the Julia
reference publishes no numbers and Julia isn't installed (BASELINE.md).

Config (BASELINE.json): 128-dim x 1M base, kc=1024, m=8, k=256, nprobe=8.
Uses real SIFT1M if IVFADC_DATA_DIR points at TEXMEX files, else clustered
synthetic data of the same shape generated ON DEVICE (host->device moves
~10 MB/s on tunneled runtimes, so the 512 MB upload would dominate).
Override sizes with IVFADC_BENCH_N / IVFADC_BENCH_NQ / IVFADC_BENCH_BATCH.

Timing methodology: tunneled runtimes make `block_until_ready` an unreliable
completion barrier, so throughput runs fold a scalar data-dependence over
every batch output and fetch it once (ivfadc_tpu.utils.timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".cache", "jax_compile"))


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    n = int(os.environ.get("IVFADC_BENCH_N", 1_000_000 if on_accel else 100_000))
    nq = int(os.environ.get("IVFADC_BENCH_NQ", 32_768 if on_accel else 1_000))
    batch = int(os.environ.get("IVFADC_BENCH_BATCH",
                               16_384 if on_accel else 1024))
    kc = int(os.environ.get("IVFADC_BENCH_KC", 1024))
    m, kq, d = 8, 256, 128
    nprobe, topk = 8, 10
    n_gt = min(nq, 1000)          # queries used for recall ground truth
    n_oracle = min(nq, 1000)      # queries used for oracle QPS baseline

    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.datasets import (load_or_synthesize,
                                           synthetic_clustered_device)
    from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r
    from ivfadc_tpu.utils.timing import (chain_time, roundtrip_latency,
                                         roundtrip_stats, true_time)
    from benchmarks.oracle import ReferenceOracle

    t_all = time.time()
    data_dir = os.environ.get("IVFADC_DATA_DIR", "")
    gt_file_i = None
    qdev = None
    if data_dir:
        from ivfadc_tpu.utils.datasets import read_fvecs, read_ivecs
        base = load_or_synthesize("sift_base", n, d, seed=0)
        n, d = base.shape
        based = jnp.asarray(base, jnp.float32)
        qp = os.path.join(data_dir, "sift_query.fvecs")
        gp = os.path.join(data_dir, "sift_groundtruth.ivecs")
        if os.path.exists(qp):
            qreal = read_fvecs(qp, max_rows=nq)
            if qreal.shape[1] != d:
                raise ValueError(
                    f"{qp} holds {qreal.shape[1]}-dim queries but the bench "
                    f"config is d={d}; np.resize would scramble rows")
            nq = min(nq, qreal.shape[0])
            qdev = jnp.asarray(qreal[:nq], jnp.float32)
            # the published .ivecs ground truth is only valid if the whole
            # base file went into the index (we may have truncated to n rows)
            file_rows = os.path.getsize(
                os.path.join(data_dir, "sift_base.fvecs")) // (4 * (d + 1)) \
                if os.path.exists(os.path.join(data_dir, "sift_base.fvecs")) \
                else -1
            if os.path.exists(gp) and n >= file_rows > 0:
                gt_file_i = read_ivecs(gp)[:n_gt, :topk]
    else:
        based = synthetic_clustered_device(n, d, seed=0)   # device-resident

    # queries: real TEXMEX query set when provided, else perturbed base
    # points (guaranteed near-neighbor structure) derived on device; only
    # the small query set crosses to host (oracle).
    if qdev is None:
        key = jax.random.PRNGKey(1)
        kq_, kn_ = jax.random.split(key)
        qidx = jax.random.randint(kq_, (nq,), 0, n)
        qdev = based[qidx] + 0.05 * jax.random.normal(kn_, (nq, d),
                                                      jnp.float32)
    # only the oracle/recall slice crosses to host (D2H is slow on tunnels)
    queries = np.asarray(qdev[:max(n_gt, n_oracle)])

    t0 = time.time()
    index = IVFADCIndex.build(
        based, kc=kc, k=kq, m=m, seed=0,
        kmeanspp_sample=min(n, 65536))
    build_s = time.time() - t0

    # --- ground truth + recall: published .ivecs GT when valid, else exact
    # brute force on device (tiny D2H either way) ---
    if gt_file_i is not None:
        gt_i = gt_file_i
    else:
        gt_d, gt_i = brute_force_topk(based, qdev[:n_gt], topk)
    ids, _ = index.search_padded(queries[:n_gt], topk, w=nprobe)
    recall = recall_at_r(ids, gt_i, topk)

    # --- QPS: steady-state on-chip throughput (pipelined dispatch, honest
    # completion via scalar fetch) ---
    nbatches = max(1, nq // batch)

    def run_wave(i):
        # vary inputs per rep: some tunneled runtimes memoize repeated
        # identical (executable, args) calls, inflating same-input timings
        outs = [index._device_search(qdev[s * batch:(s + 1) * batch]
                                     + 1e-6 * i, topk, nprobe)
                for s in range(nbatches)]
        return outs

    base_lat = roundtrip_latency()
    reps = 10 if on_accel else 2
    t_wave = true_time(run_wave, reps=reps, warm=2, baseline=base_lat)
    qps = nbatches * batch / t_wave
    # latency: individually timed single batches (reps=1 so each sample is
    # one call); with ~10 samples the tail is reported as max, not "p99"
    singles = []
    for r in range(max(8, reps)):
        singles.append(true_time(
            lambda i, r=r: index._device_search(
                qdev[:batch] + 1e-6 * (i + 100 * r), topk, nprobe),
            reps=1, warm=1 if r == 0 else 1, baseline=base_lat))
    p50_batch_ms = float(np.percentile(singles, 50) * 1e3)
    max_batch_ms = float(np.max(singles) * 1e3)

    # --- true single-query latency (BASELINE primary metric names "p50
    # query latency"): individually timed B=1 and B=8 calls, not the
    # amortized per-query share of a big batch ---
    tiny_lat_ms = {}
    for bsz in (1, 8):
        try:
            samples = []
            for r in range(12):
                samples.append(true_time(
                    lambda i, r=r, bsz=bsz: index._device_search(
                        qdev[:bsz] + 1e-6 * (i + 37 * r), topk, nprobe),
                    reps=1, warm=1 if r == 0 else 0, baseline=base_lat))
            tiny_lat_ms[bsz] = float(np.percentile(samples, 50) * 1e3)
        except Exception as e:                               # noqa: BLE001
            print(f"(B={bsz} latency failed: {type(e).__name__})",
                  file=sys.stderr)
            tiny_lat_ms[bsz] = float("nan")
    # single-call samples are RTT-dominated on tunneled runtimes: when the
    # baseline-subtracted p50 lands below the RTT jitter, report the jitter
    # floor instead of a meaningless 0.0 (rpc_roundtrip_ms in the output
    # gives the absolute floor any single dispatch actually pays). The floor
    # is EMPIRICAL — the measured stddev of the round-trip itself — and a
    # fired clamp is flagged per batch size so a masked regression is
    # visible in the JSON (ADVICE r3).
    rt = roundtrip_stats()
    lat_floor_ms = rt["std"] * 1e3
    lat_clamped = {}
    for bsz in tiny_lat_ms:
        lat_clamped[bsz] = tiny_lat_ms[bsz] < lat_floor_ms
        tiny_lat_ms[bsz] = max(tiny_lat_ms[bsz], lat_floor_ms)

    # --- on-chip B=1 latency: a data-dependent chain of single-query
    # searches inside ONE jitted program — tunnel-independent (the RPC is
    # paid once per chain, not per query), so BASELINE's "p50 query
    # latency" gets a real on-chip number next to the RTT-floored one.
    # Optional metric: the chain program is a big compile (the full search
    # pipeline inside a scan body) and the remote compile service has been
    # seen dying on it at 10M scale — never let it take down the headline
    # numbers that already ran. ---
    chain_iters = 256 if on_accel else 4
    try:
        b1_onchip_s = chain_time(
            lambda q: index._device_search(q, topk, nprobe),
            qdev[:1], iters=chain_iters, baseline=base_lat)
    except Exception as e:                                   # noqa: BLE001
        print(f"(onchip B=1 chain failed: {type(e).__name__}: "
              f"{str(e)[:200]})", file=sys.stderr)
        b1_onchip_s = None

    # --- oracle baseline (reference algorithm, single core, this host) ---
    oracle = ReferenceOracle.from_index(index)
    t0 = time.time()
    o_ids, _ = oracle.search_batch(queries[:n_oracle], topk, nprobe)
    oracle_qps = n_oracle / (time.time() - t0)
    o_pad = np.full((n_oracle, topk), -1, np.int64)
    for i, oi in enumerate(o_ids):
        o_pad[i, :len(oi)] = oi
    oracle_recall = recall_at_r(o_pad, gt_i[:n_oracle], topk)

    result = {
        "metric": "QPS/chip at recall@10 (SIFT1M%s, m=8, nprobe=8)"
                  % ("" if data_dir else "-shape synthetic"),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / max(oracle_qps, 1e-9), 2),
        "recall_at_10": round(recall, 4),
        "oracle_recall_at_10": round(oracle_recall, 4),
        "oracle_qps": round(oracle_qps, 1),
        "p50_batch_latency_ms": round(p50_batch_ms, 2),
        "max_batch_latency_ms": round(max_batch_ms, 2),
        "p50_query_latency_us": round(p50_batch_ms / batch * 1e3, 2),
        # NaN (a failed optional stage) must not reach the JSON line —
        # json.dumps would emit non-standard NaN tokens
        "p50_latency_b1_ms": None if np.isnan(tiny_lat_ms[1])
        else round(tiny_lat_ms[1], 3),
        "p50_latency_b8_ms": None if np.isnan(tiny_lat_ms[8])
        else round(tiny_lat_ms[8], 3),
        "p50_latency_b1_clamped": bool(lat_clamped[1]),
        "p50_latency_b8_clamped": bool(lat_clamped[8]),
        "latency_floor_ms": round(lat_floor_ms, 3),
        "p50_latency_b1_onchip_ms": round(b1_onchip_s * 1e3, 3)
        if b1_onchip_s is not None else None,
        "gt_source": "ivecs" if gt_file_i is not None else "brute_force",
        "rpc_roundtrip_ms": round(base_lat * 1e3, 2),
        # the chip is time-shared on tunneled runtimes: wave QPS includes
        # contention windows; p50-batch QPS is the uncontended rate
        "p50_batch_qps": round(batch / (p50_batch_ms / 1e3), 1),
        "n": n, "nq": nq, "batch": batch, "kc": kc,
        "backend": backend,
        # engine switches active for this run (extraction is opt-in until
        # its Mosaic compile is validated on real hardware)
        "extract": os.environ.get("IVFADC_EXTRACT", "0") == "1"
                   and not os.environ.get("IVFADC_NO_EXTRACT"),
        "rank_engine": os.environ.get("IVFADC_RANK_ENGINE", "v1"),
        "coarse_engine": os.environ.get("IVFADC_COARSE_ENGINE", "v1"),
        "merge_topk": os.environ.get("IVFADC_MERGE_TOPK", "pallas"),
        "norms": os.environ.get("IVFADC_NORMS", "cache"),
        "build_seconds": round(build_s, 1),
        "total_seconds": round(time.time() - t_all, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
