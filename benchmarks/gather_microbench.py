#!/usr/bin/env python
"""Measure XLA row-gather cost vs row width on the current backend.

Decides the grouped-scan epilogue design: the scan kernel emits per-probe
candidate buffers in TILE order and the epilogue gathers them back to probe
order (`out_d[row]`, ops/pallas_scan.py). If narrow-row gathers are
byte-bound, an in-kernel top-k extraction can shrink the gathered rows from
2x128 lanes to ~2x16 and save most of the gather time; if they are
row-bound (fixed ns/row), shrinking rows buys nothing.

Run: python benchmarks/gather_microbench.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))


def main():
    import jax
    import jax.numpy as jnp
    from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

    rpc = roundtrip_latency()
    print(f"(rpc roundtrip {rpc*1e3:.1f} ms)")
    T = 196608          # tile rows (T_max * pb at headline shape)
    P = 131072          # probes gathered
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, T, size=P), jnp.int32)

    @jax.jit
    def gather(tab, ix):
        return tab[ix]

    for L in (8, 16, 32, 64, 128, 256):
        tab = jnp.asarray(rng.rand(T, L), jnp.float32)
        out = gather(tab, idx)
        out.block_until_ready()
        # vary indices by rep (remote runtimes memoize identical calls);
        # +i shifts stay in-bounds up to clamping of the top few rows
        t = true_time(lambda i: gather(tab, jnp.add(idx, i)),
                      reps=10, warm=2, baseline=rpc)
        mb = P * L * 4 / 1e6
        print(f"L={L:4d}  {t*1e3:7.3f} ms   {mb:7.1f} MB   "
              f"{mb/1e3/t:6.1f} GB/s   {t/P*1e9:5.1f} ns/row")


if __name__ == "__main__":
    main()
