"""Pallas TPU counting-sort ranks: stable rank of each probe within its cell.

Why: grouping the B*w probes of a search batch by probed cell needs a stable
sort by cell id. XLA's `lax.sort` lowers to a bitonic network — measured
~5 ms for 131k int32 keys on v5e, the single largest cost of the grouped
dense-scan prep. But the keys are tiny (cell ids < kc <= 4096), so a
counting sort fits the TPU much better: one sequential pass that maintains
per-cell running counters in VMEM and computes, for every probe,

    rank[p] = #{p' < p : cells[p'] == cells[p]}

entirely with vector compares and small MXU matmuls (the canonical
workarounds for the VPU's lack of gather/transpose):

  * per 128-lane group: the probe->cell one-hot matrix A (128, kc) gives
    - the carried-in count per probe:   A @ counters^T       (MXU)
    - the counter update:               column-sum of A      (VPU)
  * within-group rank: the (128, 128) equality matrix E = (c_i == c_j)
    masked strictly-lower-triangular, row-summed (VPU)
  * lane<->sublane transposes go through identity-matrix matmuls (MXU).

All arithmetic is f32 — exact for counts/ids below 2^24.

The sorted position of probe p is then cell_first[cells[p]] + rank[p]: the
caller gets a full stable counting sort without ever materializing a sorted
key array, and the final counters double as the per-cell histogram.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Fallback default when no engine is threaded in. Production paths pass
# the engine explicitly from their dispatch sites (models/index.py /
# parallel/sharded.py read IVFADC_RANK_ENGINE per call and carry it as a
# jit static arg, like IVFADC_COARSE_ENGINE); this import-time read only
# covers direct callers that omit `engine`. Hardware A/B (v5e, P=131072,
# kc=1024, benchmarks/ab_rank.py): v1 1.06 ms, v2 2.08 ms — v2's
# lane-narrow (128, 8) transposed blocks cost more in relayout than the
# MXU eye-transposes they remove, so v1 stays the default.
_DEFAULT_ENGINE = os.environ.get("IVFADC_RANK_ENGINE", "v1")

_LANE = 128
_BLK = 1024          # probes per grid step (8 sublane rows of 128 lanes)
MAX_KC = 4096        # one-hot block (128, kc) f32 must stay ~2 MB of VMEM


def _rank_kernel(cells_ref,          # (8, 128) i32 block
                 rank_ref,           # (8, 128) i32 block
                 counts_ref,         # (8, kcp) f32 (row 0 meaningful)
                 cnt,                # (1, kcp) f32 scratch, persists
                 tmp,                # (1, 128) f32 scratch (fusion barrier)
                 *, kcp: int):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        cnt[...] = jnp.zeros((1, kcp), jnp.float32)

    cells = cells_ref[...].astype(jnp.float32)            # (8, 128)
    eye = jnp.eye(_LANE, dtype=jnp.float32)
    kciota = jax.lax.broadcasted_iota(jnp.int32, (1, kcp), 1) \
        .astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    umask = srow < lane                                   # strict upper tri

    contract_last = (((1,), (1,)), ((), ()))              # (a,k)x(b,k)->(a,b)

    for g in range(8):                                    # static unroll
        cg = jax.lax.slice_in_dim(cells, g, g + 1, axis=0)      # (1, 128)
        # lane->sublane transpose via the MXU (eye @ cg^T): Mosaic's native
        # relayout for jnp.transpose measured ~40% of the whole kernel
        cgT = jax.lax.dot_general(eye, cg, contract_last,
                                  preferred_element_type=jnp.float32)
        onehot = (cgT == kciota).astype(jnp.float32)            # (128, kcp)
        # carried-in count per probe, lane layout: (1,kcp) x (128,kcp)^T
        carried = jax.lax.dot_general(cnt[...], onehot, contract_last,
                                      preferred_element_type=jnp.float32)
        # within-group rank, lane layout: column-sums of the strictly-upper
        # masked equality matrix (earlier probe i < probe j, same cell)
        eq = (cgT == cg)                                        # (128, 128)
        within = jnp.sum(jnp.where(eq & umask, 1.0, 0.0),
                         axis=0, keepdims=True)                 # (1, 128)
        # store/load barrier: Mosaic fuses dot+add into a matmul whose
        # accumulator must be constant — a computed addend fails to compile
        tmp[...] = carried
        rank_ref[g, :] = (tmp[...] + within).astype(jnp.int32).reshape(_LANE)
        cnt[...] = cnt[...] + jnp.sum(onehot, axis=0, keepdims=True)

    # post-update counters; the last grid step's write is the histogram
    counts_ref[...] = jnp.broadcast_to(cnt[...], (8, kcp))


def _rank_kernel_v2(cells_ref,        # (8, 128) i32 block (lane layout)
                    cellsT_ref,       # (128, 8) i32 block (sublane layout)
                    rankT_ref,        # (128, 8) i32 block (sublane layout)
                    counts_ref,       # (8, kcp) f32 (row 0 meaningful)
                    cnt,              # (1, kcp) f32 scratch, persists
                    tmp,              # (128, 1) f32 scratch (fusion barrier)
                    *, kcp: int):
    """Transpose-free variant: the wrapper supplies the probe cells in BOTH
    layouts (one cheap XLA transpose of a 0.5 MB array), so the per-group
    MXU eye-transposes of `_rank_kernel` — its dominant cost, 2M MACs each —
    disappear. Remaining MXU work per group is one (128, kcp) x (kcp, 1)
    matvec; everything else is VPU compares/reductions.

    Layout note: the transposed arrays stack each grid step's (128, 8)
    group block along SUBLANES — full array (nblk*128, 8) — because a
    Mosaic block's last dim must be a 128-multiple or equal the array's
    last dim (blocking the lane axis of a (128, nblk*8) array at width 8
    fails to lower)."""
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        cnt[...] = jnp.zeros((1, kcp), jnp.float32)

    cells = cells_ref[...].astype(jnp.float32)            # (8, 128)
    cellsT = cellsT_ref[...].astype(jnp.float32)          # (128, 8)
    kciota = jax.lax.broadcasted_iota(jnp.int32, (1, kcp), 1) \
        .astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    lmask = lane < srow                                   # strict lower tri

    contract_last = (((1,), (1,)), ((), ()))              # (a,k)x(b,k)->(a,b)

    for g in range(8):                                    # static unroll
        cg = jax.lax.slice_in_dim(cells, g, g + 1, axis=0)       # (1, 128)
        cgT = jax.lax.slice_in_dim(cellsT, g, g + 1, axis=1)     # (128, 1)
        onehot = (cgT == kciota).astype(jnp.float32)             # (128, kcp)
        # carried-in count per probe, sublane layout: (128,kcp) x (1,kcp)^T
        carried = jax.lax.dot_general(onehot, cnt[...], contract_last,
                                      preferred_element_type=jnp.float32)
        # within-group rank: #(earlier probe with the same cell) — row-sums
        # of the strictly-lower masked equality matrix, sublane layout
        eq = (cgT == cg)                                         # (128, 128)
        within = jnp.sum(jnp.where(eq & lmask, 1.0, 0.0),
                         axis=1, keepdims=True)                  # (128, 1)
        # store/load barrier: Mosaic fuses dot+add into a matmul whose
        # accumulator must be constant — a computed addend fails to compile
        tmp[...] = carried
        rankT_ref[:, g] = (tmp[...] + within).astype(jnp.int32) \
            .reshape(_LANE)
        cnt[...] = cnt[...] + jnp.sum(onehot, axis=0, keepdims=True)

    counts_ref[...] = jnp.broadcast_to(cnt[...], (8, kcp))


@functools.partial(jax.jit, static_argnames=("kc", "interpret", "engine"))
def cell_ranks(cells_flat, *, kc: int, interpret: bool = False,
               engine: str | None = None):
    """cells_flat (P,) i32 in [0, kc) -> (rank (P,) i32, counts (kc,) i32).

    rank[p] = stable rank of p among equal-cell probes; counts = histogram.
    Requires kc <= MAX_KC (callers fall back to lax.sort beyond that).
    engine "v2" feeds the kernel both layouts and skips the MXU
    eye-transposes; "v1" is the original single-input kernel. Default:
    IVFADC_RANK_ENGINE at process start.
    """
    if engine is None:
        engine = _DEFAULT_ENGINE
    assert kc <= MAX_KC, kc
    P = cells_flat.shape[0]
    P_pad = ((P + _BLK - 1) // _BLK) * _BLK
    kcp = ((kc + _LANE - 1) // _LANE) * _LANE
    # pad probes with sentinel kcp: matches no one-hot column (no count
    # pollution); pad ranks are garbage and sliced off
    cells2d = jnp.pad(cells_flat.astype(jnp.int32), (0, P_pad - P),
                      constant_values=kcp).reshape(P_pad // _LANE, _LANE)
    if engine == "v1":
        ranks, counts = pl.pallas_call(
            functools.partial(_rank_kernel, kcp=kcp),
            grid=(P_pad // _BLK,),
            in_specs=[pl.BlockSpec((8, _LANE), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((8, _LANE), lambda b: (b, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, kcp), lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((P_pad // _LANE, _LANE),
                                            jnp.int32),
                       jax.ShapeDtypeStruct((8, kcp), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((1, kcp), jnp.float32),
                            pltpu.VMEM((1, _LANE), jnp.float32)],
            interpret=interpret,
        )(cells2d)
        return ranks.reshape(P_pad)[:P], counts[0, :kc].astype(jnp.int32)
    nblk = P_pad // _BLK
    # per-block transpose stacked along sublanes: block b's (128, 8) group
    # matrix lives at rows [b*128, (b+1)*128) — see the kernel's layout note
    cells2dT = cells2d.reshape(nblk, 8, _LANE).transpose(0, 2, 1) \
        .reshape(nblk * _LANE, 8)
    ranksT, counts = pl.pallas_call(
        functools.partial(_rank_kernel_v2, kcp=kcp),
        grid=(P_pad // _BLK,),
        in_specs=[pl.BlockSpec((8, _LANE), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_LANE, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_LANE, 8), lambda b: (b, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, kcp), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * _LANE, 8), jnp.int32),
                   jax.ShapeDtypeStruct((8, kcp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, kcp), jnp.float32),
                        pltpu.VMEM((_LANE, 1), jnp.float32)],
        interpret=interpret,
    )(cells2d, cells2dT)
    return (ranksT.reshape(nblk, _LANE, 8).transpose(0, 2, 1)
            .reshape(P_pad)[:P],
            counts[0, :kc].astype(jnp.int32))
