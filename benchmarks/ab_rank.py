#!/usr/bin/env python
"""A/B the counting-rank kernel engines (v1 eye-transpose vs v2 dual-layout)
at the headline probe shape. One subprocess per engine (Mosaic compile
errors poison a process; first v2 compile must not contaminate v1 timing).

Usage: python benchmarks/ab_rank.py [--p 131072] [--kc 1024] [--reps 20]
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
import os, sys
import numpy as np
sys.path.insert(0, {root!r})
import jax
import jax.numpy as jnp
from ivfadc_tpu.ops.cell_rank import cell_ranks
from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

P, kc, engine = {p}, {kc}, {engine!r}
interp = jax.default_backend() == "cpu"
rng = np.random.RandomState(0)
cells = jnp.asarray(rng.randint(0, kc, P), jnp.int32)
rpc = roundtrip_latency()
# vary input per rep (runtime memoizes identical pure calls); the +i keeps
# values in [0, kc) via the modulo
t = true_time(lambda i: cell_ranks((cells + i) % kc, kc=kc, engine=engine,
                                   interpret=interp),
              reps={reps}, warm=2, baseline=rpc)
print(f"RESULT engine={{engine}} ms={{t*1e3:.3f}}", flush=True)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=131072)
    ap.add_argument("--kc", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    for engine in ("v1", "v2"):
        code = CHILD.format(root=ROOT, p=args.p, kc=args.kc,
                            reps=args.reps, engine=engine)
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True, timeout=1800)
        print(r.stdout.strip())
        if r.returncode != 0:
            print(f"[{engine} FAILED]", r.stderr[-3000:])


if __name__ == "__main__":
    main()
