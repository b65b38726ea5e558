"""Pallas TPU kernel: dense posting scan with on-chip top-k.

Why this exists: the XLA LUT scan (ops/adc.py) scores postings through
per-element table gathers, which TPUs execute at ~1 element/cycle — measured
115 QPS on SIFT1M-shape data. TPUs want contiguous DMA + MXU flops, so this
kernel rewrites the scan as dense linear algebra (the classic TPU-ANN move,
cf. "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s", Chern et al. 2022):

  score(q, x) = base' + v . r_hat + coef * ||r_hat||^2

with, for squared euclidean:  v = -2 r, base' = base + ||r||^2, coef = 1
(r = query residual, r_hat = the point's decoded PQ residual); for inner
product: v = -q_rot, base' = -q.c, coef = 0. The decoded residuals live in
HBM as a resident (cap_pad, d) bf16 array (2 bytes/dim; the uint8 PQ codes
remain the storage/update format — this array is a derived cache).

Kernel structure (grid step = PB=8 probes, tiled to Mosaic's (8, 128) rule):
  * a probed cell's slots are CONTIGUOUS in the CSR layout, so the kernel
    streams them as double-buffered DMA chunks of CHUNK rows — full-bandwidth
    copies, no gathers;
  * chunks beyond the cell's live size are skipped (`nchunks = cdiv(size,
    CHUNK)`), so padding waste is bounded by CHUNK, not the max cell size;
  * each chunk: two MXU matvecs — v . r_hat and ones . r_hat^2 (the norm
    term, computed on the fly — no second DMA stream) — plus tail masking;
  * each probe keeps a 128-lane running candidate buffer (score + slot
    position) in its output row, updated by k_out min-extract passes per
    chunk (vector selects only — no scalar dynamic VMEM addressing). The
    buffer holds the ≥k_out best seen, so per-probe top-k_out is exact;
  * the wrapper converts winning slot positions to external ids with one
    tiny gather and a final lax.top_k merges the (B, w*128) candidates.

Scalar-prefetched (starts, sizes, base) drive DMA indexing and scoring
(PrefetchScalarGridSpec), the canonical Pallas pattern for data-dependent
addressing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B knob, read ONCE at import (reaches jitted code at trace time —
# process-start-only by design): narrow the extract epilogue's gathered
# rows to the live 2k lanes. See benchmarks/gather_microbench.py.
_EXTRACT_SLICE = bool(os.environ.get("IVFADC_EXTRACT_SLICE"))

# Rows per DMA chunk. 512 rows x 128 dims x 2B = 128 KB per buffer slot.
DEFAULT_CHUNK = 1024
_PB = 8        # probes per grid step (Mosaic sublane tile)
_CAND = 128    # per-probe candidate lanes (Mosaic lane tile)
# Probes per dense_scan launch: its three scalar-prefetch arrays must fit
# the ~1 MB SMEM budget (3 * SEG_PROBES * 4 B). Module-level so tests can
# shrink it to exercise the multi-segment path cheaply.
SEG_PROBES = 65536


def _scan_kernel(starts_ref, sizes_ref, base_ref,   # scalar prefetch (P,)
                 v_hbm, decoded_hbm, scale_ref,     # ANY/HBM, (8, d) VMEM
                 out_d_ref, out_p_ref,              # (PB, 128) VMEM blocks
                 vbuf, cbuf, vsem, csems,           # scratch
                 *, chunk: int, k_out: int, norm_coef: float,
                 merge: str = "exact", nf: int = _CAND, int8: bool = False):
    step = pl.program_id(0)
    d = vbuf.shape[-1]

    vdma = pltpu.make_async_copy(
        v_hbm.at[pl.ds(step * _PB, _PB), :], vbuf, vsem)
    vdma.start()

    out_d_ref[...] = jnp.full((_PB, nf), jnp.inf, jnp.float32)
    out_p_ref[...] = jnp.full((_PB, nf), -1, out_p_ref.dtype)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, nf), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ones = jnp.ones((1, d), jnp.bfloat16)
    contract_last = (((1,), (1,)), ((), ()))  # (1,d) x (chunk,d) -> (1,chunk)

    vdma.wait()

    for p in range(_PB):                       # static unroll over the tile
        probe = step * _PB + p
        # cell capacities are 8-row aligned (PostingStore), so DMA starts are
        # sublane-aligned — tell Mosaic so it can prove tile divisibility
        start = pl.multiple_of(starts_ref[probe], 8)
        size = sizes_ref[probe]
        base = base_ref[probe]
        nchunks = pl.cdiv(size, chunk)
        v_row = vbuf[p].reshape(1, d)

        def dma(slot, ci):
            return pltpu.make_async_copy(
                decoded_hbm.at[pl.ds(start + ci * chunk, chunk), :],
                cbuf.at[slot], csems.at[slot])

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        def body(ci, _):
            slot = ci % 2

            @pl.when(ci + 1 < nchunks)
            def _():
                dma((ci + 1) % 2, ci + 1).start()

            dma(slot, ci).wait()
            if int8:
                # dequantize in VMEM: per-column scale * int8 codes -> bf16.
                # Halves the HBM DMA traffic vs a bf16 cache; int8->bf16 is
                # exact (|q| <= 127) so precision matches the scale rounding.
                rows = cbuf[slot].astype(jnp.bfloat16) * scale_ref[0:1, :]
            else:
                rows = cbuf[slot]                              # (chunk, d)
            scores = jax.lax.dot_general(
                v_row, rows, dimension_numbers=contract_last,
                preferred_element_type=jnp.float32)            # (1, chunk)
            if norm_coef != 0.0:
                norms = jax.lax.dot_general(
                    ones, rows * rows, dimension_numbers=contract_last,
                    preferred_element_type=jnp.float32)
                scores = scores + norm_coef * norms
            scores = scores + base
            valid = lane < (size - ci * chunk)
            scores = jnp.where(valid, scores, jnp.inf)

            if merge == "fold":
                nbank = nf // _CAND
                pdt = out_p_ref.dtype
                run_d = out_d_ref[p].reshape(1, nf)
                run_p = out_p_ref[p].reshape(1, nf)
                banks_d = [jax.lax.slice_in_dim(run_d, b * _CAND,
                                                (b + 1) * _CAND, axis=1)
                           for b in range(nbank)]
                banks_p = [jax.lax.slice_in_dim(run_p, b * _CAND,
                                                (b + 1) * _CAND, axis=1)
                           for b in range(nbank)]
                for g in range(chunk // _CAND):
                    b = g % nbank
                    sub = jax.lax.slice_in_dim(
                        scores, g * _CAND, (g + 1) * _CAND, axis=1)
                    blk = (ci * (chunk // _CAND) + g).astype(pdt)
                    upd = sub < banks_d[b]
                    banks_d[b] = jnp.where(upd, sub, banks_d[b])
                    banks_p[b] = jnp.where(upd, blk, banks_p[b])
                out_d_ref[p] = jnp.concatenate(banks_d, axis=1).reshape(nf)
                out_p_ref[p] = jnp.concatenate(banks_p, axis=1).reshape(nf)
                return 0

            def merge_pass(t, sc):
                cmin = jnp.min(sc)
                cpos = jnp.argmin(sc.reshape(-1)).astype(jnp.int32)
                run = out_d_ref[p].reshape(1, _CAND)
                rpos = jnp.argmax(run.reshape(-1)).astype(jnp.int32)
                hit = (kiota == rpos) & (cmin < jnp.max(run))
                out_d_ref[p] = jnp.where(hit, cmin, run).reshape(_CAND)
                out_p_ref[p] = jnp.where(
                    hit, start + ci * chunk + cpos,
                    out_p_ref[p].reshape(1, _CAND)).reshape(_CAND)
                return jnp.where(lane == cpos, jnp.inf, sc)

            jax.lax.fori_loop(0, k_out, merge_pass, scores)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)


def _grouped_scan_kernel(tstart_ref, tsize_ref,     # scalar prefetch (T,)
                         v_ref, base_ref,           # (pb, d), (pb, 1) VMEM
                         decoded_hbm,               # (cap_pad, d) bf16|i8 HBM
                         scale_ref,                 # (8, d) bf16 VMEM
                         *rest,                     # [ids_hbm,] outs, scratch
                         chunk: int, k_out: int, norm_coef: float,
                         pb: int, merge: str = "exact", nf: int = _CAND,
                         int8: bool = False, emit_ids: bool = False,
                         extract: bool = False):
    """Query-grouped scan: the pb rows of this grid step are (up to) pb probes
    of the SAME cell, so one DMA chunk feeds a (pb, d) x (d, chunk) MXU
    matmul and every merge reduction runs row-parallel across sublanes.

    merge="exact": k_out min-extract passes per chunk — the 128-lane buffer
    provably holds each probe's true top-k_out.
    merge="fold":  per-lane running min (one elementwise pass per 128 lanes of
    scores) — the TPU-KNN partial-reduce (Chern et al. 2022). Each candidate
    hashes to buffer slot (slot_position mod nf); a slot keeps its best.
    Exact for cells <= nf postings; for bigger cells a true top-k item is
    lost only if it collides with a better one in the same slot (expected
    ~C(k,2)/nf per probe — ~0.1% recall impact at k=10, nf=512), for ~10x
    less VPU work per chunk than "exact". nf must be a multiple of 128 and
    divide chunk.

    emit_ids (fold only): an ids_hbm (cap_pad/128, 128) i32 input follows
    scale_ref; cell starts must be 128-row aligned. The kernel streams id
    rows alongside decoded rows (+3% DMA) and the candidate buffer stores
    EXTERNAL IDS instead of positions — the epilogue then needs no
    position->id decode (which costs a slow scalar gather on some runtimes).

    Same-cell buffer reuse: tiles are cell-major, so consecutive tiles of a
    hot cell (B*w/kc averages >1 tile per cell at serving batch sizes) would
    re-DMA identical chunks. A small SMEM record of what the double buffer
    holds lets such tiles skip their DMA entirely (valid only when the whole
    cell fits the 2-chunk buffer) — measured DMA volume roughly halves at
    SIFT1M serving shape. Slots stay statically indexed (ci % 2).

    extract (emit_ids fold only): the candidate buffers become VMEM scratch
    and the kernel finishes each tile with k_out min-extract passes, writing
    ONE packed (pb, 128) i32 output row per probe: lanes [0, k_out) = the
    top-k_out distances bitcast to i32, lanes [k_out, 2*k_out) = their
    external ids. The epilogue then gathers a single 512 B row per probe
    (instead of two nf-lane rows) and merges only w*k_out candidates — the
    post-kernel gather was the largest cost of the search epilogue.
    """
    use_norms = False
    norms_hbm = nbuf = nsems = None
    if extract:
        assert emit_ids and merge == "fold"
        (ids_hbm, out_ref, cbuf, csems, ibuf, isems,
         out_d_ref, out_p_ref, state) = rest
    elif emit_ids and len(rest) == 11:
        # cached-norms variant: a (cap_pad/128, 128) f32 row-norm stream
        # rides alongside the id rows, replacing the in-kernel norms
        # matmul + square (the second-largest VPU cost per chunk)
        (ids_hbm, norms_hbm, out_d_ref, out_p_ref, cbuf, csems, ibuf,
         isems, nbuf, nsems, state) = rest
        use_norms = True
    elif emit_ids:
        ids_hbm, out_d_ref, out_p_ref, cbuf, csems, ibuf, isems, state = rest
    else:
        out_d_ref, out_p_ref, cbuf, csems, state = rest
    t = pl.program_id(0)
    start = pl.multiple_of(tstart_ref[t], 128 if emit_ids else 8)
    size = tsize_ref[t]
    nchunks = pl.cdiv(size, chunk)
    d = v_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        state[0] = -1                 # cell start held by the buffer
        state[1] = 0                  # number of valid buffered chunks
    buffered = jnp.logical_and(state[0] == start, state[1] >= nchunks)

    out_d_ref[...] = jnp.full((pb, nf), jnp.inf, jnp.float32)
    out_p_ref[...] = jnp.full((pb, nf), -1, out_p_ref.dtype)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, nf), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ones = jnp.ones((1, d), jnp.bfloat16)
    contract_last = (((1,), (1,)), ((), ()))

    def dma(slot, ci):
        return pltpu.make_async_copy(
            decoded_hbm.at[pl.ds(start + ci * chunk, chunk), :],
            cbuf.at[slot], csems.at[slot])

    def idma(slot, ci):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds((start + ci * chunk) // _CAND, chunk // _CAND),
                       :],
            ibuf.at[slot], isems.at[slot])

    def ndma(slot, ci):
        return pltpu.make_async_copy(
            norms_hbm.at[pl.ds((start + ci * chunk) // _CAND,
                               chunk // _CAND), :],
            nbuf.at[slot], nsems.at[slot])

    @pl.when((nchunks > 0) & jnp.logical_not(buffered))
    def _():
        dma(0, 0).start()
        if emit_ids:
            idma(0, 0).start()
        if use_norms:
            ndma(0, 0).start()

    def body(ci, _):
        slot = ci % 2

        @pl.when((ci + 1 < nchunks) & jnp.logical_not(buffered))
        def _():
            dma((ci + 1) % 2, ci + 1).start()
            if emit_ids:
                idma((ci + 1) % 2, ci + 1).start()
            if use_norms:
                ndma((ci + 1) % 2, ci + 1).start()

        @pl.when(jnp.logical_not(buffered))
        def _():
            dma(slot, ci).wait()
            if emit_ids:
                idma(slot, ci).wait()
            if use_norms:
                ndma(slot, ci).wait()
        if int8:
            # per-column dequant (see _scan_kernel) — the multiply runs once
            # per DMA'd chunk and feeds up to pb probes' matmuls
            rows = cbuf[slot].astype(jnp.bfloat16) * scale_ref[0:1, :]
        else:
            rows = cbuf[slot]                                   # (chunk, d)
        scores = jax.lax.dot_general(
            v_ref[...], rows, dimension_numbers=contract_last,
            preferred_element_type=jnp.float32)                 # (pb, chunk)
        if norm_coef != 0.0 and not use_norms:
            norms = jax.lax.dot_general(
                ones, rows * rows, dimension_numbers=contract_last,
                preferred_element_type=jnp.float32)             # (1, chunk)
            scores = scores + norm_coef * norms
        scores = scores + base_ref[...]                         # + (pb, 1)
        valid = lane < (size - ci * chunk)
        scores = jnp.where(valid, scores, jnp.inf)

        if merge == "fold":
            # per-slot running min: candidate at chunk position g*128+l
            # competes for slot (g*128+l) mod nf — nf/128 banks of 128 lanes.
            # emit_ids: the payload lane stores the candidate's EXTERNAL ID
            # (from the id row streamed with the chunk). Otherwise positions
            # are stored as the 128-row CHUNK-BLOCK index within the cell
            # (pos8=True: int8 — the lane is the buffer lane and the cell
            # start is re-attached only for the final k winners), which
            # shrinks the dominant per-tile output traffic.
            nbank = nf // _CAND
            pdt = out_p_ref.dtype
            banks_d = [out_d_ref[:, b * _CAND:(b + 1) * _CAND]
                       for b in range(nbank)]
            banks_p = [out_p_ref[:, b * _CAND:(b + 1) * _CAND]
                       for b in range(nbank)]
            if emit_ids:
                idrows = ibuf[slot]                 # (chunk/128, 128) i32
            if use_norms:
                nrows = nbuf[slot]                  # (chunk/128, 128) f32
            for g in range(chunk // _CAND):                     # static unroll
                b = g % nbank
                sub = jax.lax.slice_in_dim(scores, g * _CAND, (g + 1) * _CAND,
                                           axis=1)              # (pb, 128)
                if use_norms:
                    # + coef * precomputed row norms (replaces the norms
                    # matmul): one (pb, 128) add per lane group; inf-masked
                    # tails stay inf
                    sub = sub + norm_coef * jax.lax.slice_in_dim(
                        nrows, g, g + 1, axis=0)
                upd = sub < banks_d[b]
                banks_d[b] = jnp.where(upd, sub, banks_d[b])
                if emit_ids:
                    pay = jax.lax.slice_in_dim(idrows, g, g + 1, axis=0)
                    banks_p[b] = jnp.where(upd, pay, banks_p[b])
                else:
                    blk = (ci * (chunk // _CAND) + g).astype(pdt)
                    banks_p[b] = jnp.where(upd, blk, banks_p[b])
            for b in range(nbank):
                out_d_ref[:, b * _CAND:(b + 1) * _CAND] = banks_d[b]
                out_p_ref[:, b * _CAND:(b + 1) * _CAND] = banks_p[b]
            return 0

        def merge_pass(_, sc):                                  # sc (pb, chunk)
            cmin = jnp.min(sc, axis=1, keepdims=True)           # (pb, 1)
            cpos = jnp.argmin(sc, axis=1).reshape(pb, 1).astype(jnp.int32)
            run = out_d_ref[...]                                # (pb, 128)
            rmax = jnp.max(run, axis=1, keepdims=True)
            rpos = jnp.argmax(run, axis=1).reshape(pb, 1).astype(jnp.int32)
            hit = (kiota == rpos) & (cmin < rmax)
            out_d_ref[...] = jnp.where(hit, cmin, run)
            out_p_ref[...] = jnp.where(hit, start + ci * chunk + cpos,
                                       out_p_ref[...])
            return jnp.where(lane == cpos, jnp.inf, sc)

        jax.lax.fori_loop(0, k_out, merge_pass, scores)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    if extract:
        # finish the tile in-kernel: k_out min-extract passes over the
        # scratch candidate buffers -> one packed (pb, 128) i32 output row
        # per probe (dist bits at lanes [0,k_out), external ids at
        # [k_out, 2k_out)). Empty lanes extract as +inf/-1 pairs.
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (pb, _CAND), 1)
        nlane = jax.lax.broadcasted_iota(jnp.int32, (1, nf), 1)

        def ext(j, acc):
            x = out_d_ref[...]                              # (pb, nf)
            m = jnp.min(x, axis=1, keepdims=True)
            a = jnp.argmin(x, axis=1).astype(jnp.int32)[:, None]
            sel = nlane == a
            pay = jnp.sum(jnp.where(sel, out_p_ref[...], 0), axis=1,
                          keepdims=True)
            # exhausted buffers re-select an already-masked (+inf) lane
            # whose payload is stale — emit -1 so inf entries carry no id
            pay = jnp.where(m == jnp.inf, -1, pay)
            mb = jax.lax.bitcast_convert_type(m, jnp.int32)
            acc = jnp.where(lane128 == j, mb, acc)
            acc = jnp.where(lane128 == j + k_out, pay, acc)
            out_d_ref[...] = jnp.where(sel, jnp.inf, x)
            return acc

        out_ref[...] = jax.lax.fori_loop(
            0, k_out, ext, jnp.full((pb, _CAND), -1, jnp.int32))

    # record buffer contents for the next tile (whole cell resident only)
    @pl.when(jnp.logical_not(buffered))
    def _():
        fits = jnp.logical_and(nchunks > 0, nchunks <= 2)
        state[0] = jnp.where(fits, start, -1)
        state[1] = jnp.where(fits, nchunks, 0)


def _grouped_scan_qc_kernel(tstart_ref, tsize_ref, cidx_ref, qidx_ref,
                            q_ref, c_ref, rot_ref, decoded_hbm, scale_ref,
                            ids_hbm, out_d_ref, out_p_ref,
                            cbuf, csems, ibuf, isems, state,
                            *, chunk: int, pb: int, nf: int, int8: bool,
                            apply_rot: bool, base_mult: float,
                            norm_coef: float):
    """Grouped scan with IN-KERNEL v/base derivation (round-4 verdict
    item 5): instead of consuming pre-placed (T*pb, d) v/base tiles — whose
    XLA placement (inv-row scatter + big row gather) was the single
    largest non-kernel stage at ~2.7 ms — the queries and centroids stay
    RESIDENT IN VMEM and each tile derives its rows on the fly:

        r      = q[qidx[slot]] - c[cell(t)]        (dynamic VMEM row reads)
        r_rot  = r @ R                              (OPQ only; one tiny MXU)
        v      = -2 r_rot,  base = base_mult * ||r_rot||^2

    (for sqeuclidean coarse==quant metric, cdist == ||r||^2 == ||r_rot||^2
    under an orthogonal R, so the reference score's coarse term folds into
    base_mult = 2; "pure" score mode uses 1.) The per-slot query index
    rides in scalar prefetch; invalid slots carry qidx -1 and score +inf.
    Production-config variant only: merge="fold" + emit_ids (the default
    serving path); everything else falls back to the placement pipeline.
    """
    t = pl.program_id(0)
    start = pl.multiple_of(tstart_ref[t], 128)
    size = tsize_ref[t]
    nchunks = pl.cdiv(size, chunk)
    d = q_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        state[0] = -1
        state[1] = 0
    buffered = jnp.logical_and(state[0] == start, state[1] >= nchunks)

    # ---- derive this tile's v/base from resident queries/centroids ----
    c_row = c_ref[pl.ds(cidx_ref[t], 1), :]                  # (1, d) f32
    qrows = []
    qis = []
    for p in range(pb):                                      # static unroll
        qi = qidx_ref[t * pb + p]
        qrows.append(q_ref[pl.ds(jnp.maximum(qi, 0), 1), :])
        qis.append(qi)
    q_mat = jnp.concatenate(qrows, axis=0)                   # (pb, d) f32
    # i32 stack THEN compare: Mosaic only supports minor-dim insertion
    # reshapes on 32-bit vectors (an i1 (pb,) -> (pb, 1) reshape fails)
    ok_col = jnp.stack(qis).reshape(pb, 1) >= 0
    r = q_mat - c_row
    if apply_rot:
        r = jax.lax.dot_general(
            r.astype(jnp.bfloat16), rot_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    base_col = base_mult * jnp.sum(r * r, axis=1, keepdims=True)
    base_col = jnp.where(ok_col, base_col, jnp.inf)          # (pb, 1)
    v_mat = (-2.0 * r).astype(jnp.bfloat16)                  # (pb, d)

    # ---- chunk loop: identical to _grouped_scan_kernel's fold+emit_ids ----
    out_d_ref[...] = jnp.full((pb, nf), jnp.inf, jnp.float32)
    out_p_ref[...] = jnp.full((pb, nf), -1, out_p_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ones = jnp.ones((1, d), jnp.bfloat16)
    contract_last = (((1,), (1,)), ((), ()))

    def dma(slot, ci):
        return pltpu.make_async_copy(
            decoded_hbm.at[pl.ds(start + ci * chunk, chunk), :],
            cbuf.at[slot], csems.at[slot])

    def idma(slot, ci):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds((start + ci * chunk) // _CAND, chunk // _CAND),
                       :],
            ibuf.at[slot], isems.at[slot])

    @pl.when((nchunks > 0) & jnp.logical_not(buffered))
    def _():
        dma(0, 0).start()
        idma(0, 0).start()

    def body(ci, _):
        slot = ci % 2

        @pl.when((ci + 1 < nchunks) & jnp.logical_not(buffered))
        def _():
            dma((ci + 1) % 2, ci + 1).start()
            idma((ci + 1) % 2, ci + 1).start()

        @pl.when(jnp.logical_not(buffered))
        def _():
            dma(slot, ci).wait()
            idma(slot, ci).wait()
        if int8:
            rows = cbuf[slot].astype(jnp.bfloat16) * scale_ref[0:1, :]
        else:
            rows = cbuf[slot]
        scores = jax.lax.dot_general(
            v_mat, rows, dimension_numbers=contract_last,
            preferred_element_type=jnp.float32)              # (pb, chunk)
        if norm_coef != 0.0:
            norms = jax.lax.dot_general(
                ones, rows * rows, dimension_numbers=contract_last,
                preferred_element_type=jnp.float32)
            scores = scores + norm_coef * norms
        scores = scores + base_col
        valid = lane < (size - ci * chunk)
        scores = jnp.where(valid, scores, jnp.inf)

        nbank = nf // _CAND
        banks_d = [out_d_ref[:, b * _CAND:(b + 1) * _CAND]
                   for b in range(nbank)]
        banks_p = [out_p_ref[:, b * _CAND:(b + 1) * _CAND]
                   for b in range(nbank)]
        idrows = ibuf[slot]
        for g in range(chunk // _CAND):
            b = g % nbank
            sub = jax.lax.slice_in_dim(scores, g * _CAND, (g + 1) * _CAND,
                                       axis=1)
            upd = sub < banks_d[b]
            banks_d[b] = jnp.where(upd, sub, banks_d[b])
            pay = jax.lax.slice_in_dim(idrows, g, g + 1, axis=0)
            banks_p[b] = jnp.where(upd, pay, banks_p[b])
        for b in range(nbank):
            out_d_ref[:, b * _CAND:(b + 1) * _CAND] = banks_d[b]
            out_p_ref[:, b * _CAND:(b + 1) * _CAND] = banks_p[b]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    @pl.when(jnp.logical_not(buffered))
    def _():
        fits = jnp.logical_and(nchunks > 0, nchunks <= 2)
        state[0] = jnp.where(fits, start, -1)
        state[1] = jnp.where(fits, nchunks, 0)


def _tile_map(counts, offsets, sizes, pb: int, T_max: int, kc: int):
    """Shared tile bookkeeping for `grouped_dense_scan`'s two preps: cell c
    owns ceil(counts[c]/pb) consecutive tiles starting at tile_base[c].
    Returns (tile_base (kc,), c_t, j_t, tile_valid (T_max,), tile_start,
    tile_size) — the latter two zeroed on invalid tiles."""
    nt = (counts + pb - 1) // pb                          # tiles per cell
    tile_base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(nt)[:-1].astype(jnp.int32)])
    total_tiles = jnp.sum(nt)
    trange = jnp.arange(T_max, dtype=jnp.int32)
    c_t = jnp.clip(jnp.searchsorted(tile_base, trange, side="right") - 1,
                   0, kc - 1).astype(jnp.int32)
    j_t = trange - tile_base[c_t]
    tile_valid = trange < total_tiles
    tile_start = jnp.where(tile_valid, offsets[c_t], 0).astype(jnp.int32)
    tile_size = jnp.where(tile_valid, sizes[c_t], 0).astype(jnp.int32)
    return tile_base, c_t, j_t, tile_valid, tile_start, tile_size


@functools.partial(
    jax.jit,
    static_argnames=("kc", "k_out", "chunk", "norm_coef", "pb", "merge",
                     "nf", "pos8", "interpret", "extract_k", "rank_engine"))
def grouped_dense_scan(cells, offsets, sizes, v, base, decoded, scale=None,
                       ids2d=None, norms2d=None,
                       *, kc: int,
                       k_out: int, chunk: int, norm_coef: float = 1.0,
                       pb: int = 16, merge: str = "exact", nf: int = _CAND,
                       pos8: bool = False, interpret: bool = False,
                       extract_k: int = 0, rank_engine: str | None = None):
    """Cell-major grouped scan. Groups the B*w probes by probed cell into
    tiles of 8, so each cell's postings are DMA'd once per tile (up to 8x
    less HBM traffic) and the MXU runs real (8, d) matmuls.

    cells (B, w) i32; offsets/sizes (kc,) i32; v (B, w, d); base (B, w) f32;
    decoded (cap_pad, d_pad) bf16 with d_pad a 128-multiple >= d (v is
    zero-padded up to it here — zero features are score-neutral). decoded may
    instead be int8 (half the DMA traffic), in which case `scale` (d_pad,)
    must give the per-column dequantization factors (row = int8 * scale).
    Returns (cand_d (B, w, nf) f32, cand_p (B, w, nf)) in the original
    probe order — same contract as `dense_scan`. nf (a 128-multiple dividing
    chunk) sets the per-probe candidate-buffer width; wider buffers cut fold
    collisions at no extra scan cost (merge="exact" requires nf=128).

    Position encoding: exact merge emits absolute slot indices (i32).
    Fold merge emits the candidate's 128-row CHUNK-BLOCK index within its
    cell (absolute slot = cell_offset + block*128 + buffer_lane%128;
    -1 = empty) — int8 when pos8=True (valid while every cell cap is
    <= 128*127 rows), which shrinks the dominant per-tile output traffic.
    With ids2d (the posting ids in (cap_pad/128, 128) i32 layout; requires
    128-row-aligned cells and merge="fold"), cand_p instead holds EXTERNAL
    IDS — the caller skips position decoding entirely.

    extract_k > 0 (requires ids2d; 2*extract_k <= 128): the kernel finishes
    each tile with extract_k min-extract passes and the return value becomes
    (dists (B, w, extract_k) f32 ascending-ish per probe, ids (B, w,
    extract_k) i32 EXTERNAL) — per-probe top-extract_k instead of raw
    nf-lane candidate buffers. Cuts the epilogue row gather from two
    nf-lane arrays to one 128-lane array and the final merge from w*nf to
    w*extract_k candidates.
    """
    emit_ids = ids2d is not None
    # cached row norms (norms2d, (cap_pad/128, 128) f32): stream precomputed
    # ||r_hat||^2 alongside the id rows and skip the in-kernel norms matmul
    # + square. Fold + id-emission path only.
    if norms2d is not None:
        assert emit_ids and merge == "fold" and norm_coef != 0.0 \
            and not extract_k
    # int8 position outputs need (pb, nf) blocks of at least Mosaic's
    # (32, 128) int8 tile — same constraint that removed pos8 from
    # dense_scan. Silently fall back to i32 positions below that (pos8 is
    # an output-traffic optimization, not a semantic switch).
    pos8 = pos8 and pb >= 32
    if extract_k:
        assert emit_ids and 2 * extract_k <= _CAND, (extract_k, emit_ids)
    if emit_ids:
        assert merge == "fold", "id emission requires fold merge"
    if merge == "exact":
        assert nf == _CAND, "exact merge uses a single 128-lane buffer"
    assert nf % _CAND == 0 and chunk % nf == 0, (nf, chunk)
    int8 = decoded.dtype == jnp.int8
    if int8 and scale is None:
        raise ValueError("int8 decoded cache requires a scale vector")
    if v.shape[-1] != decoded.shape[-1]:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, decoded.shape[-1] - v.shape[-1])))
    B, w, d = v.shape
    P = B * w
    T_max = P // pb + min(kc, P) + 1

    cells_flat = cells.reshape(-1).astype(jnp.int32)
    from ivfadc_tpu.ops.cell_rank import MAX_KC, cell_ranks
    if kc <= MAX_KC:
        # Pallas counting-sort ranks: one sequential pass with per-cell
        # counters — ~2x faster than lax.sort's bitonic network, and the
        # rank is exactly the quantity the tile math needs (no inverse
        # permutation / searchsorted bookkeeping on P-sized arrays)
        ranks, counts = cell_ranks(cells_flat, kc=kc, interpret=interpret,
                                   engine=rank_engine)
        tile_base, _, _, _, tile_start, tile_size = _tile_map(
            counts, offsets, sizes, pb, T_max, kc)
        row = (tile_base[cells_flat] + ranks // pb) * pb + ranks % pb
        # place probes into their tile rows via a GATHER, not a scatter of
        # the wide (P, d) array: invert `row` with a cheap (P,) i32 scatter
        # (slot -> probe; unwritten slots point at the padding row P), then
        # gather rows — XLA row-gathers run ~2x faster than row-scatters on
        # this runtime, and the moved array is the 2-byte-wide one
        inv_row = jnp.full((T_max * pb,), P, jnp.int32) \
            .at[row].set(jnp.arange(P, dtype=jnp.int32),
                         unique_indices=True)
        v_pad = jnp.concatenate(
            [v.reshape(P, d).astype(jnp.bfloat16),
             jnp.zeros((1, d), jnp.bfloat16)])
        base_pad = jnp.concatenate(
            [base.reshape(P, 1).astype(jnp.float32),
             jnp.full((1, 1), jnp.inf, jnp.float32)])
        v_tiles = v_pad[inv_row]
        base_tiles = base_pad[inv_row]
        return _grouped_call(tile_start, tile_size, v_tiles, base_tiles,
                             decoded, scale, ids2d, row, B, w, d,
                             T_max=T_max, k_out=k_out, chunk=chunk,
                             norm_coef=norm_coef, pb=pb, merge=merge, nf=nf,
                             pos8=pos8, emit_ids=emit_ids, int8=int8,
                             interpret=interpret, extract_k=extract_k,
                             norms2d=norms2d)
    # stable sort by cell via a single packed-int sort: (cell << idx_bits) |
    # probe_idx — half the data movement of argsort's (key, iota) pair sort
    idx_bits = max(1, (P - 1).bit_length())
    if kc.bit_length() + idx_bits <= 31:
        packed = (cells_flat << idx_bits) | jnp.arange(P, dtype=jnp.int32)
        packed = jax.lax.sort(packed)
        order = (packed & ((1 << idx_bits) - 1)).astype(jnp.int32)
        sorted_cells = (packed >> idx_bits).astype(jnp.int32)
    else:
        order = jnp.argsort(cells_flat, stable=True).astype(jnp.int32)
        sorted_cells = cells_flat[order]
    crange = jnp.arange(kc, dtype=jnp.int32)
    cell_first = jnp.searchsorted(sorted_cells, crange).astype(jnp.int32)
    cell_last = jnp.searchsorted(sorted_cells, crange,
                                 side="right").astype(jnp.int32)
    counts = cell_last - cell_first                       # probes per cell
    tile_base, c_t, j_t, tile_valid, tile_start, tile_size = _tile_map(
        counts, offsets, sizes, pb, T_max, kc)
    tile_sorted_start = cell_first[c_t] + j_t * pb
    tile_count = jnp.where(tile_valid,
                           jnp.clip(counts[c_t] - j_t * pb, 0, pb), 0)

    # slot-level: sorted position of each (tile, slot) entry
    srange = jnp.arange(pb, dtype=jnp.int32)
    sp = tile_sorted_start[:, None] + srange[None, :]           # (T, pb)
    slot_valid = srange[None, :] < tile_count[:, None]
    probe_idx = order[jnp.clip(sp, 0, P - 1)]                   # (T, pb)
    # cast BEFORE the tile gather: halves the (T_max*pb, d) scatter/gather
    # traffic, and the kernel consumes bf16 anyway
    v_tiles = v.reshape(P, d).astype(jnp.bfloat16)[probe_idx] \
        .reshape(T_max * pb, d)
    base_tiles = jnp.where(slot_valid, base.reshape(-1)[probe_idx],
                           jnp.inf).reshape(T_max * pb, 1)

    # map output rows back to original probe order: probe i sits at sorted
    # position inv[i]; its tile/slot give its output row. (Scatter, not a
    # second argsort — inverting a permutation is one store per element.)
    inv = jnp.zeros(P, jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32), unique_indices=True)
    rank = inv - cell_first[cells_flat]
    row = (tile_base[cells_flat] + rank // pb) * pb + rank % pb
    return _grouped_call(tile_start, tile_size, v_tiles, base_tiles,
                         decoded, scale, ids2d, row, B, w, d,
                         T_max=T_max, k_out=k_out, chunk=chunk,
                         norm_coef=norm_coef, pb=pb, merge=merge, nf=nf,
                         pos8=pos8, emit_ids=emit_ids, int8=int8,
                         interpret=interpret, extract_k=extract_k,
                         norms2d=norms2d)


def _grouped_call(tile_start, tile_size, v_tiles, base_tiles, decoded, scale,
                  ids2d, row, B, w, d, *, T_max, k_out, chunk, norm_coef, pb,
                  merge, nf, pos8, emit_ids, int8, interpret,
                  extract_k: int = 0, norms2d=None):
    """Invoke the grouped scan kernel on prepared tiles and map the output
    rows back to (B, w) probe order via `row` (shared by the counting-rank
    and sort-based preps of `grouped_dense_scan`)."""
    d_dec = decoded.shape[-1]
    if int8:
        scale8 = jnp.broadcast_to(
            scale.astype(jnp.bfloat16)[None, :], (8, d_dec))
    else:
        scale8 = jnp.ones((8, d_dec), jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((pb, d), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pb, 1), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((8, d_dec), lambda t, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((2, chunk, d), jnp.int8 if int8 else jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    inputs = [tile_start, tile_size, v_tiles, base_tiles, decoded, scale8]
    if emit_ids:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(ids2d)
        scratch += [pltpu.VMEM((2, chunk // _CAND, _CAND), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,))]
    if norms2d is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(norms2d)
        scratch += [pltpu.VMEM((2, chunk // _CAND, _CAND), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    if extract_k:
        # candidate buffers move to scratch; the packed top-k is the output
        assert emit_ids and merge == "fold" and 2 * extract_k <= _CAND
        scratch += [pltpu.VMEM((pb, nf), jnp.float32),
                    pltpu.VMEM((pb, nf), jnp.int32)]
        out_specs = [pl.BlockSpec((pb, _CAND), lambda t, *_: (t, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((T_max * pb, _CAND), jnp.int32)]
    else:
        out_specs = [
            pl.BlockSpec((pb, nf), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, nf), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ]
        p_dtype = jnp.int8 if (merge == "fold" and pos8 and not emit_ids) \
            else jnp.int32
        out_shape = [
            jax.ShapeDtypeStruct((T_max * pb, nf), jnp.float32),
            jax.ShapeDtypeStruct((T_max * pb, nf), p_dtype),
        ]
    scratch.append(pltpu.SMEM((2,), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_max,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_grouped_scan_kernel, chunk=chunk,
                               k_out=extract_k or k_out,
                               norm_coef=norm_coef, pb=pb, merge=merge, nf=nf,
                               int8=int8, emit_ids=emit_ids,
                               extract=bool(extract_k))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    if extract_k:
        packed = outs[0]
        if _EXTRACT_SLICE:
            # A/B knob: narrow the gathered rows to the live 2k lanes first
            # (wins only if the runtime's row gather is byte-bound, not
            # row-bound — see benchmarks/gather_microbench.py)
            packed = jax.lax.slice_in_dim(packed, 0, 2 * extract_k, axis=1)
        packed = packed[row]                                 # ONE row gather
        dists = jax.lax.bitcast_convert_type(
            packed[:, :extract_k], jnp.float32)
        pids = packed[:, extract_k:2 * extract_k]
        return (dists.reshape(B, w, extract_k),
                pids.reshape(B, w, extract_k))
    out_d, out_p = outs
    return (out_d[row].reshape(B, w, nf),
            out_p[row].reshape(B, w, nf))


@functools.partial(
    jax.jit,
    static_argnames=("kc", "chunk", "norm_coef", "pb", "nf", "interpret",
                     "apply_rot", "base_mult", "rank_engine"))
def grouped_dense_scan_qc(cells, offsets, sizes, queries, cents, rot,
                          decoded, scale=None, ids2d=None, *, kc: int,
                          chunk: int, norm_coef: float = 1.0, pb: int = 16,
                          nf: int = _CAND, interpret: bool = False,
                          apply_rot: bool = False, base_mult: float = 2.0,
                          rank_engine: str | None = None):
    """`grouped_dense_scan` with IN-KERNEL v/base derivation (see
    _grouped_scan_qc_kernel): takes raw (B, dq) float32 queries + (kc, dq)
    centroids instead of pre-expanded v/base tiles, eliminating the
    placement scatter/gather stage entirely. Production-config only
    (merge="fold", id emission via ids2d, counting-rank prep): callers
    gate on those conditions and fall back to `grouped_dense_scan`.
    Returns (cand_d (B, w, nf) f32, cand_ids (B, w, nf) i32 EXTERNAL)."""
    from ivfadc_tpu.ops.cell_rank import MAX_KC, cell_ranks
    assert ids2d is not None and kc <= MAX_KC
    assert nf % _CAND == 0 and chunk % nf == 0, (nf, chunk)
    int8 = decoded.dtype == jnp.int8
    if int8 and scale is None:
        raise ValueError("int8 decoded cache requires a scale vector")
    B, w = cells.shape
    P = B * w
    d_dec = decoded.shape[-1]
    dq = queries.shape[-1]
    q_pad = queries.astype(jnp.float32)
    c_pad = cents.astype(jnp.float32)
    if dq != d_dec:
        q_pad = jnp.pad(q_pad, ((0, 0), (0, d_dec - dq)))
        c_pad = jnp.pad(c_pad, ((0, 0), (0, d_dec - dq)))
    if B % 8:
        q_pad = jnp.pad(q_pad, ((0, 8 - B % 8), (0, 0)))
    kc_pad = -(-kc // 8) * 8
    if kc_pad != kc:
        c_pad = jnp.pad(c_pad, ((0, kc_pad - kc), (0, 0)))
    if rot is None:
        rot_pad = jnp.eye(d_dec, dtype=jnp.bfloat16)
    else:
        dr = rot.shape[0]
        rot_pad = jnp.eye(d_dec, dtype=jnp.float32) \
            .at[:dr, :dr].set(rot.astype(jnp.float32)) \
            .astype(jnp.bfloat16)
    T_max = P // pb + min(kc, P) + 1
    cells_flat = cells.reshape(-1).astype(jnp.int32)
    ranks, counts = cell_ranks(cells_flat, kc=kc, interpret=interpret,
                               engine=rank_engine)
    tile_base, c_t, _, _, tile_start, tile_size = _tile_map(
        counts, offsets, sizes, pb, T_max, kc)
    row = (tile_base[cells_flat] + ranks // pb) * pb + ranks % pb
    inv_row = jnp.full((T_max * pb,), P, jnp.int32) \
        .at[row].set(jnp.arange(P, dtype=jnp.int32), unique_indices=True)
    # per-slot query index (probe // w); the ONLY per-slot placement work —
    # (T*pb,) i32 arithmetic instead of a (T*pb, d) row gather
    qidx = jnp.where(inv_row < P, inv_row // w, -1).astype(jnp.int32)

    if int8:
        scale8 = jnp.broadcast_to(
            scale.astype(jnp.bfloat16)[None, :], (8, d_dec))
    else:
        scale8 = jnp.ones((8, d_dec), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T_max,),
        in_specs=[
            pl.BlockSpec((q_pad.shape[0], d_dec), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc_pad, d_dec), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dec, d_dec), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((8, d_dec), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((pb, nf), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, nf), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d_dec), jnp.int8 if int8 else jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, chunk // _CAND, _CAND), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(_grouped_scan_qc_kernel, chunk=chunk, pb=pb,
                               nf=nf, int8=int8, apply_rot=apply_rot,
                               base_mult=base_mult, norm_coef=norm_coef)
    out_d, out_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_max * pb, nf), jnp.float32),
            jax.ShapeDtypeStruct((T_max * pb, nf), jnp.int32),
        ],
        interpret=interpret,
    )(tile_start, tile_size, c_t, qidx,
      q_pad, c_pad, rot_pad, decoded, scale8, ids2d)
    return (out_d[row].reshape(B, w, nf),
            out_p[row].reshape(B, w, nf))


@functools.partial(
    jax.jit,
    static_argnames=("k_out", "chunk", "norm_coef", "merge", "nf", "pos8",
                     "interpret"))
def dense_scan(starts, sizes, v, base, decoded, scale=None, *, k_out: int,
               chunk: int,
               norm_coef: float = 1.0, merge: str = "exact", nf: int = _CAND,
               pos8: bool = False, interpret: bool = False):
    """Scan the probed cells, returning per-probe candidate buffers.

    starts/sizes (B, w) int32 — slot ranges of the probed cells
    v            (B, w, d)    — score vectors (e.g. -2 * rotated residual)
    base         (B, w) f32   — per-probe additive constants
    decoded      (cap_pad, d) bf16 — resident decoded residuals, guard-padded
                                     by at least `chunk` rows past any cell

    Returns (dists (B, w, 128) f32 with +inf padding, positions (B, w, 128)
    slot positions with -1 padding). The nf-lane buffers contain at least
    the per-probe top-k_out (exact merge; fold keeps per-slot bests),
    unsorted. Position encoding matches `grouped_dense_scan`: absolute slots
    (i32) for exact merge; per-cell 128-row chunk-block indices for fold
    (int8 when pos8=True).
    """
    if merge == "exact":
        assert nf == _CAND, "exact merge uses a single 128-lane buffer"
    assert nf % _CAND == 0 and chunk % nf == 0, (nf, chunk)
    if v.shape[-1] != decoded.shape[-1]:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, decoded.shape[-1] - v.shape[-1])))
    B, w, d = v.shape
    P = B * w
    P_pad = ((P + _PB - 1) // _PB) * _PB
    pad = P_pad - P

    starts_f = jnp.pad(starts.reshape(-1).astype(jnp.int32), (0, pad))
    sizes_f = jnp.pad(sizes.reshape(-1).astype(jnp.int32), (0, pad))
    base_f = jnp.pad(base.reshape(-1).astype(jnp.float32), (0, pad))
    v_f = jnp.pad(v.reshape(P, d).astype(jnp.bfloat16), ((0, pad), (0, 0)))

    int8 = decoded.dtype == jnp.int8
    d_dec = decoded.shape[-1]
    if int8:
        if scale is None:
            raise ValueError("int8 decoded cache requires a scale vector")
        scale8 = jnp.broadcast_to(
            scale.astype(jnp.bfloat16)[None, :], (8, d_dec))
    else:
        scale8 = jnp.ones((8, d_dec), jnp.bfloat16)
    # int8 outputs would give (8, nf) blocks below Mosaic's (32, 128) int8
    # tile — this kernel keeps i32 positions (still chunk-block encoded)
    del pos8
    p_dtype = jnp.int32
    kernel = functools.partial(_scan_kernel, chunk=chunk, k_out=k_out,
                               norm_coef=norm_coef, merge=merge, nf=nf,
                               int8=int8)

    # SMEM budget: the three scalar-prefetch arrays live in ~1 MB of SMEM,
    # so huge-kc probe counts (Deep1B-style: B*w = 131k probes would need
    # 1.5 MB) are split into independent segment launches
    outs_d, outs_p = [], []
    for s0 in range(0, P_pad, SEG_PROBES):
        s1 = min(s0 + SEG_PROBES, P_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=((s1 - s0) // _PB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((8, d_dec), lambda s, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((_PB, nf), lambda s, *_: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_PB, nf), lambda s, *_: (s, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((_PB, d), jnp.bfloat16),
                pltpu.VMEM((2, chunk, d), jnp.int8 if int8 else jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        od, op = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((s1 - s0, nf), jnp.float32),
                jax.ShapeDtypeStruct((s1 - s0, nf), p_dtype),
            ],
            interpret=interpret,
        )(starts_f[s0:s1], sizes_f[s0:s1], base_f[s0:s1], v_f[s0:s1],
          decoded, scale8)
        outs_d.append(od)
        outs_p.append(op)
    out_d = outs_d[0] if len(outs_d) == 1 else jnp.concatenate(outs_d)
    out_p = outs_p[0] if len(outs_p) == 1 else jnp.concatenate(outs_p)
    return (out_d[:P].reshape(B, w, nf),
            out_p[:P].reshape(B, w, nf))
