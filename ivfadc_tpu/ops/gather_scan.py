"""Gathered dense scan for tiny-cell regimes (huge kc).

At kc ~ 2^18 (the Deep1B coarse shape) cells hold only a handful of
postings, but the Pallas scan kernels move one full DMA chunk (>= 128 rows)
per probed cell — >90% of the streamed bytes are padding, and the scan goes
latency-bound on many small DMAs. When every probed cell fits a small
static window, it is faster to GATHER exactly the probed rows with one XLA
row-gather and score them with one batched MXU contraction:

    rows   = decoded[start_p + j]            (P, win, d)   one gather
    scores = rows . v_p + coef * ||rows||^2 + base_p       one dot_general

Same score formula as ops/pallas_scan.py (bf16 multiplies, f32 accumulate),
so results match the scan engines to bf16 rounding. Cells larger than the
window are handled by the caller (models/index.py `_dense_finish`): their
probes are zeroed here and scanned by the regular kernel, and the two
candidate lists merge exactly.

Reference counterpart: the per-cell posting loop at
/root/reference/src/index.jl:241-246 — this engine is its "probed postings
as one dense batch" TPU form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("win", "norm_coef"))
def gathered_scan(starts, sizes, v, base, decoded, scale=None, ids=None, *,
                  win: int, norm_coef: float = 1.0):
    """Score up to `win` postings of each probed cell.

    starts/sizes (B, w) i32 — slot ranges of the probed cells (a size of 0
                              skips the probe; callers zero sizes > win)
    v            (B, w, d)  — score vectors (e.g. -2 * rotated residual)
    base         (B, w) f32 — per-probe additive constants
    decoded      (cap_pad, d) bf16 or int8 — resident decoded residuals
    scale        (d,) f32   — int8 dequantization scales (int8 cache only)
    ids          (cap_pad,) i32 — external ids per slot

    Returns (dists (B, w, win) f32, ids (B, w, win) i32) with +inf / -1 in
    lanes past each cell's size.
    """
    if v.shape[-1] != decoded.shape[-1]:    # decoded is lane-padded
        v = jnp.pad(v, ((0, 0), (0, 0), (0, decoded.shape[-1] - v.shape[-1])))
    B, w, d = v.shape
    P = B * w
    j = jnp.arange(win, dtype=jnp.int32)[None, :]               # (1, win)
    sz = sizes.reshape(P, 1)
    valid = j < sz                                              # (P, win)
    idx = starts.reshape(P, 1) + j
    idx = jnp.where(valid, idx, 0)
    idx = jnp.minimum(idx, decoded.shape[0] - 1)
    rows = decoded[idx]                                         # (P, win, d)
    rows = rows.astype(jnp.bfloat16)
    if scale is not None:
        rows = rows * scale[None, None, :].astype(jnp.bfloat16)
    vb = v.reshape(P, d).astype(jnp.bfloat16)
    # batched (win, d) x (d,) matvec per probe — one MXU contraction
    scores = jax.lax.dot_general(
        rows, vb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                     # (P, win)
    if norm_coef != 0.0:
        norms = jnp.sum(rows * rows, axis=-1, dtype=jnp.float32)
        scores = scores + norm_coef * norms
    scores = scores + base.reshape(P, 1)
    scores = jnp.where(valid, scores, jnp.inf)
    out_ids = jnp.where(valid, ids[idx], -1) if ids is not None \
        else jnp.where(valid, idx, -1)
    return (scores.reshape(B, w, win),
            out_ids.astype(jnp.int32).reshape(B, w, win))


def plan_gather(caps, limit: int, max_cap=None):
    """Shared gather-engine plan policy: (window rows, covers_all).

    caps: positive cell capacities (zeros allowed; ignored) — must be a
    PROCESS-INVARIANT array under multi-process runtimes (the window is a
    jit static: divergent values would compile different SPMD programs).
    max_cap: overrides the max used for the covers_all decision (e.g. the
    true per-shard max when `caps` is the global layout).

    covers_all=True is correctness-critical: it promises the window bounds
    every cell CAPACITY (sizes never exceed caps), so the scan kernel can
    be skipped entirely. The hybrid window is routing-only — oversized
    cells fall back to the scan kernel at runtime.
    """
    caps = np.asarray(caps)
    caps = caps[caps > 0]
    if not limit or caps.size == 0:
        return 0, False
    up8 = lambda x: ((max(int(x), 1) + 7) // 8) * 8
    mc = int(max_cap) if max_cap is not None else int(caps.max())
    win_max = up8(mc)
    if win_max <= limit:
        return win_max, True
    win95 = up8(np.percentile(caps, 95))
    return (win95, False) if win95 <= limit else (0, False)
