"""Fused coarse probe: distances + top-w in one Pallas kernel.

The unfused path materializes the (B, kc) distance matrix to HBM and reads
it back for top-k — ~2 * B * kc * 4 bytes of traffic that dominates the
coarse stage at serving batch sizes (measured ~9 ms of an 18.6 ms search at
B=16384, kc=1024 on v5e). Here each grid step loads a (bp, d) query block,
computes `‖c‖² − 2 q·cᵀ` on the MXU against the VMEM-resident centroid
table, and runs w min-extract passes in VMEM — only the (B, w) winners
reach HBM. The per-query `‖q‖²` term is rank-constant and added back
outside the kernel.

f32 matmul (not bf16): the coarse flops are tiny, and NaiveCoarseQuantizer
is contractually the exact brute-force scan.

Applies to (sq)euclidean pairwise with kc and d fitting VMEM
(kc*d + bp*kc floats); callers fall back to pairwise + topk otherwise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

# v1: f32 one-hot matmuls recover winning centroid rows, an in-kernel
#     rotation matmul per extract pass, and a per-pass |r|^2 reduction.
# v2: the rotated centroid table is pre-split into bf16 hi + lo halves
#     (hi = bf16(rotC), lo = bf16(rotC - hi)) so the per-pass row recovery
#     runs as two bf16 MXU passes (~3x less MXU work than one f32 matmul,
#     ~2^-17 relative row error — below v's bf16 output rounding); the
#     rotation moves out of the loop (rotq once per block) and |r|^2 is not
#     computed at all: for orthogonal rotations (PQ identity / OPQ
#     Procrustes) |rot(q-c)|^2 == |q-c|^2, which the caller already has as
#     cdists. Hardware A/B (v5e, B=16384, kc=1024, benchmarks/ab_coarse.py
#     --e2e): v1 10.7 ms / v2 12.0 ms full search — the extra bf16 hi/lo
#     tables double the resident VMEM and halve the query-block height,
#     costing more than the saved per-pass work. v1 stays the default.
_DEFAULT_ENGINE = os.environ.get("IVFADC_COARSE_ENGINE", "v1")


def _coarse_kernel(q_ref, cent_ref, cn_ref, vals_ref, idx_ref,
                   *, w: int, wpad: int):
    q = q_ref[...]                                    # (bp, d) f32
    cents = cent_ref[...]                             # (kc, d) f32
    bp = q.shape[0]
    kc = cents.shape[0]
    # scores = ||c||^2 - 2 q.c  (+ ||q||^2 added outside; rank-invariant)
    scores = cn_ref[...] - 2.0 * jax.lax.dot_general(
        q, cents, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bp, kc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, kc), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bp, wpad), 1)
    vals = jnp.full((bp, wpad), jnp.inf, jnp.float32)
    idxs = jnp.zeros((bp, wpad), jnp.int32)
    for j in range(w):                                # static unroll
        m = jnp.min(scores, axis=1, keepdims=True)
        a = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
        hit = kiota == j
        vals = jnp.where(hit, m, vals)
        idxs = jnp.where(hit, a, idxs)
        scores = jnp.where(lane == a, jnp.inf, scores)
    vals_ref[...] = vals
    idx_ref[...] = idxs


@functools.partial(jax.jit, static_argnames=("w", "bp", "interpret"))
def _coarse_pallas(queries, cents, cnorms, *, w: int, bp: int,
                   interpret: bool):
    B, d = queries.shape
    kc = cents.shape[0]
    wpad = ((w + _LANE - 1) // _LANE) * _LANE
    vals, idxs = pl.pallas_call(
        functools.partial(_coarse_kernel, w=w, wpad=wpad),
        grid=(B // bp,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda i: (i, 0)),
            pl.BlockSpec((kc, d), lambda i: (0, 0)),      # resident
            pl.BlockSpec((1, kc), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bp, wpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, wpad), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((B, wpad), jnp.int32)],
        interpret=interpret,
    )(queries, cents, cnorms)
    return vals[:, :w], idxs[:, :w]


def _coarse_vbase_kernel(q_ref, cent_ref, cn_ref, rot_ref,
                         vals_ref, idx_ref, v_ref, rn_ref,
                         *, w: int, wpad: int, apply_rot: bool):
    """Coarse probe that also EMITS the scan inputs: per winning cell j,
    v_j = -2 * rot(q - c_j) (bf16) and |rot(q - c_j)|^2. The winning
    centroid row is recovered in VMEM by a one-hot MXU matmul — on this
    runtime, XLA-level (B, w, d) gathers/elementwise run far below HBM
    speed, so building v outside the kernel dominated the whole search."""
    q = q_ref[...]                                    # (bp, d) f32
    cents = cent_ref[...]                             # (kc, d) f32
    bp, d = q.shape
    kc = cents.shape[0]
    scores = cn_ref[...] - 2.0 * jax.lax.dot_general(
        q, cents, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bp, kc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, kc), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bp, wpad), 1)
    vals = jnp.full((bp, wpad), jnp.inf, jnp.float32)
    idxs = jnp.zeros((bp, wpad), jnp.int32)
    rnorms = jnp.zeros((bp, wpad), jnp.float32)
    for j in range(w):                                # static unroll
        m = jnp.min(scores, axis=1, keepdims=True)
        a = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
        onehot = (lane == a).astype(jnp.float32)      # (bp, kc)
        cent_j = jax.lax.dot_general(
            onehot, cents, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bp, d)
        r_j = q - cent_j
        if apply_rot:
            r_j = jax.lax.dot_general(
                r_j, rot_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        v_ref[:, j, :] = (-2.0 * r_j).astype(jnp.bfloat16)
        rn_j = jnp.sum(r_j * r_j, axis=1, keepdims=True)
        hit = kiota == j
        vals = jnp.where(hit, m, vals)
        idxs = jnp.where(hit, a, idxs)
        rnorms = jnp.where(hit, rn_j, rnorms)
        scores = jnp.where(lane == a, jnp.inf, scores)
    vals_ref[...] = vals
    idx_ref[...] = idxs
    rn_ref[...] = rnorms


@functools.partial(jax.jit,
                   static_argnames=("w", "bp", "apply_rot", "interpret"))
def _coarse_vbase_pallas(queries, cents, cnorms, rot, *, w: int, bp: int,
                         apply_rot: bool, interpret: bool):
    B, d = queries.shape
    kc = cents.shape[0]
    wpad = ((w + _LANE - 1) // _LANE) * _LANE
    vals, idxs, v, rn = pl.pallas_call(
        functools.partial(_coarse_vbase_kernel, w=w, wpad=wpad,
                          apply_rot=apply_rot),
        grid=(B // bp,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda i: (i, 0)),
            pl.BlockSpec((kc, d), lambda i: (0, 0)),      # resident
            pl.BlockSpec((1, kc), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),       # rotation
        ],
        out_specs=[pl.BlockSpec((bp, wpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, wpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, w, d), lambda i: (i, 0, 0)),
                   pl.BlockSpec((bp, wpad), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((B, wpad), jnp.int32),
                   jax.ShapeDtypeStruct((B, w, d), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, wpad), jnp.float32)],
        interpret=interpret,
    )(queries, cents, cnorms, rot)
    return vals[:, :w], idxs[:, :w], v, rn[:, :w]


def _coarse_vbase_kernel_v2(q_ref, cent_ref, cn_ref, rot_ref, hi_ref, lo_ref,
                            vals_ref, idx_ref, v_ref,
                            *, w: int, wpad: int, apply_rot: bool):
    """v2 of the emitting coarse probe (see module header): bf16 hi/lo
    row recovery from the PRE-ROTATED table, rotation hoisted out of the
    extract loop, no |r|^2 pass (the caller derives it from the scores)."""
    q = q_ref[...]                                    # (bp, d) f32
    cents = cent_ref[...]                             # (kc, d) f32 (scores)
    bp, d = q.shape
    kc = cents.shape[0]
    scores = cn_ref[...] - 2.0 * jax.lax.dot_general(
        q, cents, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bp, kc)
    if apply_rot:
        rotq = jax.lax.dot_general(
            q, rot_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bp, d)
    else:
        rotq = q
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, kc), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bp, wpad), 1)
    vals = jnp.full((bp, wpad), jnp.inf, jnp.float32)
    idxs = jnp.zeros((bp, wpad), jnp.int32)
    for j in range(w):                                # static unroll
        m = jnp.min(scores, axis=1, keepdims=True)
        a = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
        onehot = (lane == a).astype(jnp.bfloat16)     # exact in bf16
        rc = jax.lax.dot_general(
            onehot, hi_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rc = rc + jax.lax.dot_general(
            onehot, lo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # ~f32 rotC row
        v_ref[:, j, :] = (-2.0 * (rotq - rc)).astype(jnp.bfloat16)
        hit = kiota == j
        vals = jnp.where(hit, m, vals)
        idxs = jnp.where(hit, a, idxs)
        scores = jnp.where(lane == a, jnp.inf, scores)
    vals_ref[...] = vals
    idx_ref[...] = idxs


@functools.partial(jax.jit,
                   static_argnames=("w", "bp", "apply_rot", "interpret"))
def _coarse_vbase_pallas_v2(queries, cents, cnorms, rot, hi, lo,
                            *, w: int, bp: int, apply_rot: bool,
                            interpret: bool):
    B, d = queries.shape
    kc = cents.shape[0]
    wpad = ((w + _LANE - 1) // _LANE) * _LANE
    vals, idxs, v = pl.pallas_call(
        functools.partial(_coarse_vbase_kernel_v2, w=w, wpad=wpad,
                          apply_rot=apply_rot),
        grid=(B // bp,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda i: (i, 0)),
            pl.BlockSpec((kc, d), lambda i: (0, 0)),      # resident
            pl.BlockSpec((1, kc), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),       # rotation
            pl.BlockSpec((kc, d), lambda i: (0, 0)),      # bf16 hi
            pl.BlockSpec((kc, d), lambda i: (0, 0)),      # bf16 lo
        ],
        out_specs=[pl.BlockSpec((bp, wpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, wpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, w, d), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((B, wpad), jnp.int32),
                   jax.ShapeDtypeStruct((B, w, d), jnp.bfloat16)],
        interpret=interpret,
    )(queries, cents, cnorms, rot, hi, lo)
    return vals[:, :w], idxs[:, :w], v


def coarse_probe_vbase(queries, centroids, w: int, rotation,
                       apply_rot: bool, include_base: bool,
                       *, interpret: bool | None = None,
                       engine: str | None = None,
                       rot_orthogonal: bool = False):
    """Fused coarse probe + scan-input construction (squared-euclidean).

    Returns (cells (B,w) i32, cdists (B,w) f32, v (B,w,d) bf16,
    base (B,w) f32) or None when the shape doesn't suit the kernel.
    v = -2 * rot(q - c); base = |rot(q - c)|^2 (+ cdist when include_base).

    The v2 engine derives |rot(q-c)|^2 from the coarse scores, which only
    matches when `rotation` is an isometry — callers must declare that via
    `rot_orthogonal=True` (true for the PQ identity and the OPQ Procrustes
    solution); otherwise a v2 request silently runs the always-correct v1.
    """
    if engine is None:
        engine = _DEFAULT_ENGINE
    if engine == "v2" and apply_rot and not rot_orthogonal:
        engine = "v1"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, d = queries.shape
    kc = centroids.shape[0]
    if apply_rot and rotation.shape[0] != d:
        return None                 # ragged-subspace padding: fallback
    # resident VMEM budget: the score table + (v2) the bf16 hi/lo pair,
    # which together weigh one more f32 table. The per-block budget must
    # also cover the EMITTED (bp, w, d) bf16 v block (double-buffered ->
    # bp*w*d f32-equivalents): a legal-looking large-w/d shape would
    # otherwise pass the gate and crash Mosaic's VMEM allocation instead
    # of honoring the documented None-fallback contract.
    resident = kc * d * (2 if engine == "v2" else 1)
    bp = _pick_bp(B, kc + w * d, resident)
    if (d % _LANE != 0 or B % bp != 0 or kc % _LANE != 0 or w > 128
            or w > kc or bp * (kc + w * d) + resident > _MAX_RESIDENT_ELEMS):
        return None
    q32 = queries.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    cn = jnp.sum(c32 * c32, axis=1)[None, :]
    rot = rotation.astype(jnp.float32) if apply_rot \
        else jnp.eye(d, dtype=jnp.float32)
    qn = jnp.sum(q32 * q32, axis=1, keepdims=True)
    if engine == "v2":
        # The hi/lo split is rebuilt inside every jitted dispatch; at
        # kc*d*d = ~17M MACs it is noise next to the kernel's per-batch
        # B*kc*d score matmul for any batch the fused path accepts, so a
        # caller-side cache is not worth the extra traced arguments.
        rot_c = c32 @ rot if apply_rot else c32       # pre-rotated table
        hi = rot_c.astype(jnp.bfloat16)
        lo = (rot_c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        vals, idxs, v = _coarse_vbase_pallas_v2(
            q32, c32, cn, rot, hi, lo, w=w, bp=bp, apply_rot=apply_rot,
            interpret=interpret)
        cdists = jnp.maximum(vals + qn, 0.0)
        # |rot(q-c)|^2 == |q-c|^2 == cdists for orthogonal rot
        base = cdists + cdists if include_base else cdists
        return idxs, cdists, v, base
    vals, idxs, v, rn = _coarse_vbase_pallas(
        q32, c32, cn, rot, w=w, bp=bp, apply_rot=apply_rot,
        interpret=interpret)
    cdists = jnp.maximum(vals + qn, 0.0)
    base = rn + cdists if include_base else rn
    return idxs, cdists, v, base


# kc * d + bp * kc f32 elements must fit comfortably in VMEM
_MAX_RESIDENT_ELEMS = 2 * 1024 * 1024


def _pick_bp(B: int, per_row: int, resident: int) -> int:
    """Grow the query-block height while the per-block VMEM footprint
    (bp * per_row f32-equivalents, on top of the `resident` tables) stays
    inside the budget. Shared by both fused coarse kernels so the policy
    cannot drift between them."""
    bp = 8
    while bp < 64 and B % (bp * 2) == 0 and \
            (bp * 2) * per_row + resident <= _MAX_RESIDENT_ELEMS:
        bp *= 2
    return bp


def coarse_topw(queries, centroids, w: int, *, interpret: bool | None = None):
    """Exact brute-force (squared-euclidean) top-w cells without
    materializing the (B, kc) matrix. queries (B, d) f32, centroids (kc, d)
    f32 -> (cells (B, w) i32, sqdists (B, w) f32 ascending).

    Returns None when the shape doesn't suit the kernel (caller falls back).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, d = queries.shape
    kc = centroids.shape[0]
    bp = _pick_bp(B, kc, kc * d)
    d_ok = d % _LANE == 0
    if (not d_ok or B % bp != 0 or kc % _LANE != 0 or w > 128 or w > kc
            or bp * kc + kc * d > _MAX_RESIDENT_ELEMS):
        return None
    q32 = queries.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    cn = jnp.sum(c32 * c32, axis=1)[None, :]              # (1, kc)
    vals, idxs = _coarse_pallas(q32, c32, cn, w=w, bp=bp,
                                interpret=interpret)
    qn = jnp.sum(q32 * q32, axis=1, keepdims=True)        # (B, 1)
    return idxs, jnp.maximum(vals + qn, 0.0)
