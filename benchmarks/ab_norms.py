#!/usr/bin/env python
"""A/B the cached-row-norms scan variant at the headline shape: default
(norms matmul + square in-kernel per chunk) vs IVFADC_NORMS=cache (a
precomputed (cap_pad/128, 128) f32 ||r_hat||^2 stream DMA'd with the
chunk; the kernel adds it per lane group instead of computing it — the
norms matmul + square are ~23% of estimated per-chunk kernel cycles).

End-to-end through `_device_search`. One subprocess per (engine, trial),
trials interleaved A/B/A/B/... across the time-shared chip; report min per
engine (tpu-tunnel-timing discipline). Also checks id overlap + recall
parity between the engines.

Usage: python benchmarks/ab_norms.py [--n 1000000] [--nq 16384] [--trials 3]
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
engine = os.environ.get("IVFADC_NORMS", "off")
base, idx = get_index(n, {kc}, {m}, 256, 128)
rng = np.random.RandomState(1)
qh = (base[rng.choice(n, nq)] +
      0.05 * rng.randn(nq, 128).astype(np.float32))
del base
qdev = jnp.asarray(qh)
rpc = roundtrip_latency()
ctr = itertools.count(1)

ids, _ = idx.search_padded(qh[:1024], k, w=w)
np.save("/tmp/ab_norms_ids_" + engine + ".npy", ids)
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
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    best = {}
    for trial in range(args.trials):
        for engine in ("off", "cache"):
            code = CHILD.format(root=ROOT, n=args.n, nq=args.nq, kc=args.kc,
                                m=args.m, w=args.w, k=args.k, reps=args.reps)
            env = dict(os.environ, IVFADC_NORMS=engine)
            r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                               env=env, capture_output=True, text=True,
                               timeout=1800)
            ok = False
            for line in r.stdout.splitlines():
                if line.startswith("RESULT"):
                    print(f"trial {trial}: {line}", flush=True)
                    ms = float(line.split("e2e_ms=")[1].split()[0])
                    best[engine] = min(best.get(engine, 1e9), ms)
                    ok = True
            if not ok:
                print(f"trial {trial} engine={engine} FAILED:\n"
                      f"{r.stderr[-2000:]}")
    if len(best) == 2:
        print(f"BEST off={best['off']:.3f} ms  cache={best['cache']:.3f} ms  "
              f"speedup={best['off'] / best['cache']:.3f}x")
    try:
        import numpy as np
        a = np.load("/tmp/ab_norms_ids_off.npy")
        b = np.load("/tmp/ab_norms_ids_cache.npy")
        overlap = np.mean([len(set(x[x >= 0]) & set(y[y >= 0]))
                           / max(1, (x >= 0).sum())
                           for x, y in zip(a, b)])
        print(f"RESULT cache-vs-off id overlap: {overlap:.4f}")
    except Exception as e:                                   # noqa: BLE001
        print(f"(overlap check skipped: {e})")


if __name__ == "__main__":
    main()
