#!/usr/bin/env python
"""A/B the fused coarse-probe engines (v1 f32 one-hot matmuls vs v2 bf16
hi/lo split, ops/coarse_scan.py) at the headline probe shape, isolated and
end-to-end. One subprocess per engine (a Mosaic compile error poisons a
process, and the first compile of either kernel must not contaminate the
other's timing).

Usage: python benchmarks/ab_coarse.py [--b 16384] [--kc 1024] [--d 128]
                                      [--w 8] [--reps 20] [--e2e]
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
from ivfadc_tpu.ops.coarse_scan import coarse_probe_vbase
from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

B, kc, d, w, engine = {b}, {kc}, {d}, {w}, {engine!r}
interp = jax.default_backend() == "cpu"
rng = np.random.RandomState(0)
cents = jnp.asarray(rng.randn(kc, d).astype(np.float32) * 3)
q0 = jnp.asarray(rng.randn(B, d).astype(np.float32))
rot = jnp.eye(d, dtype=jnp.float32)

def run(i):
    out = coarse_probe_vbase(q0 + 1e-5 * i, cents, w, rot, False, False,
                             interpret=interp, engine=engine)
    assert out is not None, "shape gate rejected the kernel"
    return out

rpc = roundtrip_latency()
t = true_time(run, reps={reps}, warm=2, baseline=rpc)
print(f"RESULT engine={{engine}} kernel_ms={{t*1e3:.3f}}", flush=True)

if {e2e}:
    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.datasets import synthetic_clustered_device
    n = 1_000_000 if not interp else 100_000
    base = synthetic_clustered_device(n, d, seed=0)
    os.environ["IVFADC_COARSE_ENGINE"] = engine
    # force the dense engine: scan_mode="auto" resolves to LUT off-TPU, and
    # only the dense path uses the fused coarse kernel being A/B'd
    index = IVFADCIndex.build(base, kc=kc, k=256, m=8, seed=0,
                              kmeanspp_sample=min(n, 65536),
                              scan_mode="dense")
    qd = base[jax.random.randint(jax.random.PRNGKey(1), (B,), 0, n)]
    t = true_time(lambda i: index._device_search(qd + 1e-6 * i, 10, w),
                  reps=10, warm=2, baseline=rpc)
    print(f"RESULT engine={{engine}} search_ms={{t*1e3:.3f}} "
          f"qps={{B/t:.0f}}", flush=True)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--kc", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--e2e", action="store_true",
                    help="also measure full-search QPS per engine")
    args = ap.parse_args()
    for engine in ("v1", "v2"):
        code = CHILD.format(root=ROOT, b=args.b, kc=args.kc, d=args.d,
                            w=args.w, reps=args.reps, engine=engine,
                            e2e=args.e2e)
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True, timeout=3600)
        print(r.stdout.strip())
        if r.returncode != 0:
            print(f"[{engine} FAILED]", r.stderr[-3000:])


if __name__ == "__main__":
    main()
