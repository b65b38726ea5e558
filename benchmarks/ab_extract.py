#!/usr/bin/env python
"""A/B the in-kernel top-k extraction epilogue on the real TPU.

Runs the full dense search at the headline shape (SIFT1M, B=16384, w=8,
k=10) with IVFADC_NO_EXTRACT toggled, each config in its own subprocess
(fresh Mosaic compiles can poison a process; the runtime memoizes repeated
identical calls — `true_time` varies inputs per rep).

Usage: python benchmarks/ab_extract.py [--nq 16384] [--reps 12]
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
import os, sys, time
import numpy as np
sys.path.insert(0, {root!r})
from benchmarks.profile_search import get_index, timeit
import jax
import jax.numpy as jnp

nq, w, k = {nq}, 8, 10
base, idx = get_index(1_000_000, 1024, 8, 256, 128)
rng = np.random.RandomState(1)
queries = (base[rng.choice(len(base), nq)] +
           0.05 * rng.randn(nq, 128).astype(np.float32))
qdev = jnp.asarray(queries)
# vary inputs per rep: identical pure calls can be memoized by the runtime
t = timeit(lambda i: idx._device_search(qdev + 1e-4 * i, k, w),
           reps={reps}, warm=3)
print(f"RESULT ms={{t*1e3:.3f}} qps={{nq/t:.0f}}")
'''


def run(mode: str, nq: int, reps: int) -> str:
    env = os.environ.copy()
    env.pop("IVFADC_NO_EXTRACT", None)
    env.pop("IVFADC_EXTRACT_SLICE", None)
    env["IVFADC_EXTRACT"] = "1"          # extraction is opt-in
    if mode == "no-extract":
        env["IVFADC_NO_EXTRACT"] = "1"
    elif mode == "extract+slice":
        env["IVFADC_EXTRACT_SLICE"] = "1"
    code = CHILD.format(root=ROOT, nq=nq, reps=reps)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, cwd=ROOT,
                       timeout=1800)
    out = r.stdout.strip().splitlines()
    if r.returncode != 0:
        print(r.stderr[-4000:])
        raise SystemExit(1)
    return [ln for ln in out if ln.startswith("RESULT")][-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()
    for mode in ("extract", "no-extract", "extract+slice"):
        print(f"[{mode}] ...", flush=True)
        print(f"[{mode}] {run(mode, args.nq, args.reps)}", flush=True)


if __name__ == "__main__":
    main()
