#!/usr/bin/env python
"""Headline benchmark: QPS/chip at recall@10 (SIFT1M-shape, m=8, nprobe=8).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}

Baseline = the NumPy oracle of the reference's exact single-core search
algorithm (benchmarks/oracle.py) running on this host, since the Julia
reference publishes no numbers and Julia isn't installed (BASELINE.md).

Config (BASELINE.json): 128-dim x 1M base, kc=1024, m=8, k=256, nprobe=8.
Uses real SIFT1M if IVFADC_DATA_DIR points at TEXMEX files, else clustered
synthetic data of the same shape. Override sizes with IVFADC_BENCH_N /
IVFADC_BENCH_NQ / IVFADC_BENCH_BATCH for quick runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    n = int(os.environ.get("IVFADC_BENCH_N", 1_000_000 if on_accel else 100_000))
    nq = int(os.environ.get("IVFADC_BENCH_NQ", 10_000 if on_accel else 1_000))
    batch = int(os.environ.get("IVFADC_BENCH_BATCH", 4096))
    kc = int(os.environ.get("IVFADC_BENCH_KC", 1024))
    m, kq, d = 8, 256, 128
    nprobe, topk = 8, 10
    n_gt = min(nq, 1000)          # queries used for recall ground truth
    n_oracle = min(nq, 200)       # queries used for oracle QPS baseline

    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.datasets import load_or_synthesize, synthetic_clustered
    from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r
    from benchmarks.oracle import ReferenceOracle

    t_all = time.time()
    base = load_or_synthesize("sift_base", n, d, seed=0)
    queries = synthetic_clustered(nq, d, seed=1) if base is None else None
    # queries: perturbed base points (guaranteed near-neighbor structure)
    rng = np.random.RandomState(1)
    qidx = rng.choice(len(base), nq, replace=True)
    queries = base[qidx] + 0.05 * rng.randn(nq, d).astype(np.float32)

    t0 = time.time()
    index = IVFADCIndex.build(
        base, kc=kc, k=kq, m=m, seed=0,
        kmeanspp_sample=min(len(base), 65536))
    build_s = time.time() - t0

    # --- ground truth + recall ---
    gt_d, gt_i = brute_force_topk(base, queries[:n_gt], topk)
    ids, _ = index.search_padded(queries[:n_gt], topk, w=nprobe)
    recall = recall_at_r(ids, gt_i, topk)

    # --- QPS: steady-state on-chip throughput (pipelined dispatch, as a
    # serving system would run — one block per wave, not per batch) ---
    qdev = jnp.asarray(queries)
    nq_pad = (nq // batch) * batch
    def run_all():
        outs = []
        for s in range(0, nq_pad, batch):
            outs.append(index._device_search(qdev[s:s + batch], topk, nprobe))
        jax.block_until_ready(outs)
        return outs
    run_all()                      # warm (compile)
    reps = 5 if on_accel else 1
    t0 = time.time()
    for _ in range(reps):
        run_all()
    qps = reps * nq_pad / (time.time() - t0)
    # latency: single blocking batch (includes host sync overhead)
    lat = []
    for _ in range(5):
        tb = time.time()
        jax.block_until_ready(
            index._device_search(qdev[:batch], topk, nprobe))
        lat.append(time.time() - tb)
    p50_batch_ms = float(np.percentile(lat, 50) * 1e3)

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
        "metric": "QPS/chip at recall@10 (SIFT1M-shape synthetic, m=8, nprobe=8)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / max(oracle_qps, 1e-9), 2),
        "recall_at_10": round(recall, 4),
        "oracle_recall_at_10": round(oracle_recall, 4),
        "oracle_qps": round(oracle_qps, 1),
        "p50_batch_latency_ms": round(p50_batch_ms, 2),
        "p50_query_latency_us": round(p50_batch_ms / batch * 1e3, 2),
        "n": n, "nq": nq, "batch": batch, "kc": kc,
        "backend": backend,
        "build_seconds": round(build_s, 1),
        "total_seconds": round(time.time() - t_all, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
