#!/usr/bin/env python
"""Recall/QPS curves vs nprobe (BASELINE.md: "nprobe sweep 1-64").

Also covers the GIST1M-shape high-dim config (960-dim, m=16/32) via
IVFADC_SWEEP_CONFIG=gist. Prints one JSON line per nprobe point.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.datasets import synthetic_clustered
    from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r

    cfg_name = os.environ.get("IVFADC_SWEEP_CONFIG", "sift")
    on_accel = jax.default_backend() != "cpu"
    if cfg_name == "gist":
        d, m = 960, int(os.environ.get("IVFADC_BENCH_M", 16))
        n = int(os.environ.get("IVFADC_BENCH_N", 1_000_000 if on_accel else 50_000))
    else:
        d, m = 128, 8
        n = int(os.environ.get("IVFADC_BENCH_N", 1_000_000 if on_accel else 100_000))
    kc = int(os.environ.get("IVFADC_BENCH_KC", 1024))
    nq = int(os.environ.get("IVFADC_BENCH_NQ", 1_000))
    batch = int(os.environ.get("IVFADC_BENCH_BATCH", 1024))
    topk = 10

    base = synthetic_clustered(n, d, seed=0)
    rng = np.random.RandomState(1)
    queries = base[rng.choice(n, nq, replace=True)] + \
        0.05 * rng.randn(nq, d).astype(np.float32)

    idx = IVFADCIndex.build(base, kc=kc, k=256, m=m, seed=0,
                            kmeanspp_sample=min(n, 65536))
    _, gt_i = brute_force_topk(base, queries, topk)

    import jax.numpy as jnp
    qdev = jnp.asarray(queries)
    for nprobe in (1, 2, 4, 8, 16, 32, 64):
        ids, _ = idx.search_padded(queries, topk, w=nprobe)
        rec = recall_at_r(ids, gt_i, topk)
        # timed pass
        idx._device_search(qdev[:batch], topk, nprobe)  # warm
        t0 = time.time()
        reps = 0
        while time.time() - t0 < 2.0:
            for s in range(0, nq - batch + 1, batch):
                jax.block_until_ready(
                    idx._device_search(qdev[s:s + batch], topk, nprobe))
            reps += 1
        qps = reps * (nq // batch) * batch / (time.time() - t0)
        print(json.dumps({"config": cfg_name, "n": n, "d": d, "m": m,
                          "kc": kc, "nprobe": nprobe,
                          "recall_at_10": round(rec, 4),
                          "qps": round(qps, 1)}))


if __name__ == "__main__":
    main()
