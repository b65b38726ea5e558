#!/usr/bin/env python
"""Measure in-kernel per-row DMA rates vs the XLA gather floor.

Decides VERDICT r3 item 3 (probe-order kernel I/O): the grouped scan's
remaining epilogue cost is two XLA row-gathers (`out_d[row]`,
ops/pallas_scan.py) and its prep cost is the v/base tile-placement gather.
Moving those mappings INTO the kernel means one DMA per ROW at a
scalar-prefetched dynamic offset (the probes of a tile land at arbitrary
probe-order positions, so rows can't batch into block DMAs). Whether that
wins is purely a question of the hardware's small-DMA issue/completion
rate vs XLA's gather throughput (~10-50 GB/s measured on this runtime,
benchmarks/gather_microbench.py):

  * scatter kernel: per grid step, write a (pb, L) VMEM tile and DMA each
    row to out_hbm[rows[t*pb+j]] — models writing kernel outputs directly
    in probe order (kills the epilogue gather).
  * gather kernel: per grid step, DMA pb rows in_hbm[rows[...]] -> VMEM,
    reduce, write one block — models in-kernel v/base placement (kills the
    placement gather).

Shapes match the headline search batch: T = 196,608 tile rows (T_max * pb
at B=16384, w=8, pb=64), L = 128 lanes (f32: the candidate buffers; bf16
rows of v are half this traffic).

Run: python benchmarks/rowdma_microbench.py   (set IVFADC_ROWS/IVFADC_PB
to override; prints one JSON line per engine/shape).
"""
from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_compile"))


def _scatter_kernel(rows_ref, seed_ref, out_hbm, scratch, sems, *,
                    pb: int, L: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    # cheap per-step fill so Mosaic can't hoist the stores out of the grid
    scratch[...] = jnp.full((pb, L), seed_ref[0, 0], jnp.float32) + t
    copies = []
    for j in range(pb):
        c = pltpu.make_async_copy(
            scratch.at[pl.ds(j, 1), :],
            out_hbm.at[pl.ds(rows_ref[t * pb + j], 1), :],
            sems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def _gather_kernel(rows_ref, in_hbm, out_ref, scratch, sems, *,
                   pb: int, L: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    copies = []
    for j in range(pb):
        c = pltpu.make_async_copy(
            in_hbm.at[pl.ds(rows_ref[t * pb + j], 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()
    out_ref[...] = scratch[...]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ivfadc_tpu.utils.timing import roundtrip_latency, true_time

    interpret = jax.default_backend() == "cpu"
    T = int(os.environ.get("IVFADC_ROWS", 196608 if not interpret else 2048))
    pb = int(os.environ.get("IVFADC_PB", 64))
    L = 128
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.permutation(T).astype(np.int32))
    src = jnp.asarray(rng.rand(T, L).astype(np.float32))
    rpc = roundtrip_latency()
    print(f"(rpc {rpc*1e3:.1f} ms, T={T}, pb={pb}, L={L})", file=sys.stderr)

    @jax.jit
    def xla_gather(tab, ix):
        return tab[ix]

    @functools.partial(jax.jit, static_argnames=())
    def scatter_call(rows_, seed):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // pb,),
            in_specs=[pl.BlockSpec((1, 1), lambda t, *_: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[pltpu.VMEM((pb, L), jnp.float32),
                            pltpu.SemaphoreType.DMA((pb,))],
        )
        return pl.pallas_call(
            functools.partial(_scatter_kernel, pb=pb, L=L),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((T, L), jnp.float32)],
            interpret=interpret,
        )(rows_, seed)[0]

    @functools.partial(jax.jit, static_argnames=())
    def gather_call(rows_, tab):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // pb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec((pb, L), lambda t, *_: (t, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((pb, L), jnp.float32),
                            pltpu.SemaphoreType.DMA((pb,))],
        )
        return pl.pallas_call(
            functools.partial(_gather_kernel, pb=pb, L=L),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((T, L), jnp.float32)],
            interpret=interpret,
        )(rows_, tab)[0]

    # correctness first (tiny T in interpret mode; full T on hardware)
    seed = jnp.zeros((1, 1), jnp.float32)
    out_s = np.asarray(scatter_call(rows, seed))
    tile_of = np.arange(T) // pb
    expect = np.zeros((T, L), np.float32)
    expect[np.asarray(rows)] = tile_of[:, None]
    assert np.array_equal(out_s, expect), "scatter kernel wrote wrong rows"
    out_g = np.asarray(gather_call(rows, src))
    assert np.array_equal(out_g, np.asarray(src)[np.asarray(rows)]), \
        "gather kernel read wrong rows"
    print("correctness OK", file=sys.stderr)

    mb = T * L * 4 / 1e6
    results = {}
    for name, fn in (
        # vary indices by wraparound add, NOT jnp.roll: an eager roll
        # with a fresh Python shift compiles a new program per rep
        # (~60 ms remote compile each), poisoning whichever engine
        # runs first. (rows + i) mod T keeps a permutation.
        ("xla_gather", lambda i: xla_gather(src, jnp.mod(rows + i, T))),
        ("dma_scatter", lambda i: scatter_call(jnp.mod(rows + i, T),
                                               seed + i)),
        ("dma_gather", lambda i: gather_call(jnp.mod(rows + i, T), src)),
    ):
        t = true_time(fn, reps=8 if not interpret else 1, warm=2,
                      baseline=rpc)
        results[name] = t
        print(json.dumps({"engine": name, "ms": round(t * 1e3, 3),
                          "mb": round(mb, 1),
                          "gbps": round(mb / 1e3 / max(t, 1e-12), 1),
                          "ns_per_row": round(t / T * 1e9, 1)}))


if __name__ == "__main__":
    main()
