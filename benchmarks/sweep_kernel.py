#!/usr/bin/env python
"""Sweep dense-scan kernel parameters (pb, chunk, merge) on the cached 1M
index, one configuration per subprocess so a Mosaic/runtime abort can't
poison the remaining measurements.

Usage:
  python benchmarks/sweep_kernel.py            # run the sweep (parent)
  python benchmarks/sweep_kernel.py --one pb chunk merge   # child mode
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))


def run_one(pb: int, chunk: int, merge: str):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from benchmarks.profile_search import get_index
    from ivfadc_tpu.ops.pallas_scan import grouped_dense_scan
    from ivfadc_tpu.utils.timing import roundtrip_latency, true_time
    from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r

    n, kc, m, kq, d, w, k = 1_000_000, 1024, 8, 256, 128, 8, 10
    base, idx = get_index(n, kc, m, kq, d)
    rng = np.random.RandomState(1)
    nq = 4096
    queries = (base[rng.choice(len(base), nq)] +
               0.05 * rng.randn(nq, d).astype(np.float32))
    qdev = jnp.asarray(queries)
    dev = idx.store.device_view_dense(idx.quantizer, chunk,
                                      cache=idx._resolve_cache())
    cells, cdists = idx.coarse.search(qdev, w)
    cent = idx.coarse.centroids[cells]
    r = qdev[:, None, :] - cent
    v = -2.0 * r
    bse = jnp.sum(r * r, axis=-1) + cdists
    interp = jax.default_backend() == "cpu"

    nf = int(os.environ.get("IVFADC_SWEEP_NF", 128)) if merge == "fold" else 128
    # production path: stream ids2d + in-kernel extraction when opted in,
    # so the sweep ranks pb/chunk under the same kernel the search runs
    ids2d = dev.get("ids2d") if merge == "fold" else None
    extract_k = (min(k, 64)
                 if ids2d is not None
                 and os.environ.get("IVFADC_EXTRACT", "0") == "1" else 0)

    def run(i):
        # vary inputs per rep: some tunneled runtimes memoize identical
        # pure (executable, args) calls
        return grouped_dense_scan(
            cells, dev["offsets"], dev["sizes"], v + 1e-6 * i, bse,
            dev["decoded"], dev["scale"], ids2d,
            # round 5: the production default streams cached row norms —
            # sweep under the same kernel variant the search runs
            dev.get("norms2d") if (ids2d is not None and not extract_k)
            else None,
            kc=kc, k_out=min(k, 128), chunk=chunk, norm_coef=1.0, pb=pb,
            merge=merge, nf=nf, interpret=interp, extract_k=extract_k)

    t = true_time(run, reps=20, warm=2, baseline=roundtrip_latency())

    # recall sanity on 256 queries via the full search path
    import ivfadc_tpu.models.index as mindex
    object.__setattr__(idx.config, "scan_pb", pb)
    object.__setattr__(idx.config, "scan_chunk", chunk)
    object.__setattr__(idx.config, "scan_merge", merge)
    object.__setattr__(idx.config, "scan_fold_lanes", nf)
    n_gt = 256
    ids, _ = idx.search_padded(queries[:n_gt], k, w=w)
    gt_d, gt_i = brute_force_topk(jnp.asarray(base), qdev[:n_gt], k)
    rec = recall_at_r(ids, gt_i, k)
    print(f"RESULT pb={pb} chunk={chunk} merge={merge}: "
          f"{t*1e3:7.2f} ms  recall@10={rec:.4f}", flush=True)


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(int(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3])
        return
    # override the grid via env, e.g. IVFADC_SWEEP_GRID="fold:64,128,256:1024,2048"
    grid = os.environ.get("IVFADC_SWEEP_GRID", "")
    configs = []
    if grid:
        merges, pbs, chunks = grid.split(":")
        for merge in merges.split(","):
            for pb in pbs.split(","):
                for chunk in chunks.split(","):
                    configs.append((int(pb), int(chunk), merge))
    else:
        for merge in ("fold", "exact"):
            for pb in (16, 32, 64, 128):
                for chunk in (512, 1024, 2048):
                    configs.append((pb, chunk, merge))
    for pb, chunk, merge in configs:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", str(pb), str(chunk), merge],
            capture_output=True, text=True, timeout=600)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            err = (p.stderr or "").strip().splitlines()
            print(f"RESULT pb={pb} chunk={chunk} merge={merge}: FAIL "
                  f"{err[-1][:120] if err else 'no output'}", flush=True)


if __name__ == "__main__":
    main()
