"""Pallas TPU top-k (smallest-k) along the last dim.

Why: XLA's `lax.top_k` on TPU lowers to a full bitonic sort — measured ~3.5 ms
for a (4096, 1024) f32 input on v5e, which made it the second-largest cost in
the search path (it runs once per batch to merge per-probe candidates, and
once in the coarse probe). Exact k-smallest needs only k extraction passes
over a VMEM-resident block: ~10 passes of elementwise min/argmin instead of a
~log^2(n)-depth sort network.

`topk_lastdim(x, k)` == `lax.top_k(-x, k)` up to tie order: values match
exactly; indices of equal values may differ (first occurrence wins here).

The kernel grids over row blocks; each step loads an (bp, N) block, runs k
min-extract passes (vector selects only), and writes (bp, k) values+indices.
N must fit VMEM (N <= ~32k f32 at bp=64); the wrapper falls back to
`lax.top_k` beyond that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _topk_kernel(x_ref, vals_ref, idx_ref, xs_ref, *, k: int, kpad: int):
    xs_ref[...] = x_ref[...]                         # working copy in scratch
    bp, n = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, n), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bp, kpad), 1)

    def body(j, carry):                              # fori_loop: VMEM temps
        vals, idxs = carry                           # are reused, not k-fold
        x = xs_ref[...]
        m = jnp.min(x, axis=1, keepdims=True)        # (bp, 1)
        a = jnp.argmin(x, axis=1).astype(jnp.int32)[:, None]
        hit = kiota == j
        vals = jnp.where(hit, m, vals)
        idxs = jnp.where(hit, a, idxs)
        xs_ref[...] = jnp.where(lane == a, jnp.inf, x)
        return vals, idxs

    vals, idxs = jax.lax.fori_loop(
        0, k, body, (jnp.full((bp, kpad), jnp.inf, jnp.float32),
                     jnp.full((bp, kpad), -1, jnp.int32)))
    vals_ref[...] = vals
    idx_ref[...] = idxs


@functools.partial(jax.jit, static_argnames=("k", "bp", "interpret"))
def _topk_pallas(x, *, k: int, bp: int, interpret: bool):
    B, N = x.shape
    kpad = ((k + _LANE - 1) // _LANE) * _LANE
    grid = (B // bp,)
    vals, idxs = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, kpad=kpad),
        grid=grid,
        in_specs=[pl.BlockSpec((bp, N), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bp, kpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, kpad), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, kpad), jnp.float32),
                   jax.ShapeDtypeStruct((B, kpad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((bp, N), jnp.float32)],
        interpret=interpret,
    )(x)
    return vals[:, :k], idxs[:, :k]


# largest (bp * N) f32 block we let the kernel claim (block + scratch + a few
# loop temps must stay well inside the ~16 MB scoped-VMEM budget)
_MAX_BLOCK_ELEMS = 512 * 1024


def _topk_payload_kernel(x_ref, p_ref, vals_ref, pay_ref, xs_ref,
                         *, k: int, kpad: int):
    xs_ref[...] = x_ref[...]
    bp, n = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, n), 1)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (bp, kpad), 1)
    pv = p_ref[...]

    def body(j, carry):
        vals, pays = carry
        x = xs_ref[...]
        m = jnp.min(x, axis=1, keepdims=True)
        a = jnp.argmin(x, axis=1).astype(jnp.int32)[:, None]
        sel = lane == a
        pa = jnp.sum(jnp.where(sel, pv, 0), axis=1, keepdims=True)
        hit = kiota == j
        vals = jnp.where(hit, m, vals)
        pays = jnp.where(hit, pa, pays)
        xs_ref[...] = jnp.where(sel, jnp.inf, x)
        return vals, pays

    vals, pays = jax.lax.fori_loop(
        0, k, body, (jnp.full((bp, kpad), jnp.inf, jnp.float32),
                     jnp.full((bp, kpad), -1, jnp.int32)))
    vals_ref[...] = vals
    pay_ref[...] = pays


@functools.partial(jax.jit, static_argnames=("k", "bp", "interpret"))
def _topk_payload_pallas(x, p, *, k: int, bp: int, interpret: bool):
    B, N = x.shape
    kpad = ((k + _LANE - 1) // _LANE) * _LANE
    vals, pays = pl.pallas_call(
        functools.partial(_topk_payload_kernel, k=k, kpad=kpad),
        grid=(B // bp,),
        in_specs=[pl.BlockSpec((bp, N), lambda i: (i, 0)),
                  pl.BlockSpec((bp, N), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bp, kpad), lambda i: (i, 0)),
                   pl.BlockSpec((bp, kpad), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, kpad), jnp.float32),
                   jax.ShapeDtypeStruct((B, kpad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((bp, N), jnp.float32)],
        interpret=interpret,
    )(x, p)
    return vals[:, :k], pays[:, :k]


def topk_lastdim_payload(x: jax.Array, payload: jax.Array, k: int, *,
                         interpret: bool | None = None):
    """Smallest-k of x along the last dim, carrying `payload` (B, N) i32
    values for the winners: returns (vals (B,k) asc, payload (B,k)).

    Equivalent to topk_lastdim + take_along_axis, but the payload selection
    happens inside the kernel — one fused pass instead of a separate (B, N)
    gather (take_along_axis costs ~ms at search batch sizes on some
    runtimes). Falls back to XLA when the shape doesn't suit the kernel.
    Same inf-tail caveat as topk_lastdim: payloads of +inf entries are -1
    only if the input payload used -1 padding; mask by isfinite(vals).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = x.shape
    bp = 8
    while bp < 32 and (bp * 2) * N * 2 <= _MAX_BLOCK_ELEMS and B % (bp * 2) == 0:
        bp *= 2
    if (N % _LANE != 0 or B % bp != 0 or bp * N * 2 > _MAX_BLOCK_ELEMS
            or k > N or k > 128):
        neg, idx = jax.lax.top_k(-x, k)
        return -neg, jnp.take_along_axis(payload, idx, axis=1)
    return _topk_payload_pallas(x.astype(jnp.float32),
                                payload.astype(jnp.int32), k=k, bp=bp,
                                interpret=interpret)


def topk_lastdim(x: jax.Array, k: int, *, interpret: bool | None = None):
    """Smallest-k along the last dim. x (B, N) -> (vals (B,k) asc, idx (B,k)).

    Exact (same values as `lax.top_k(-x, k)`); falls back to XLA top_k when
    the shape doesn't suit the kernel. interpret=None auto-selects Pallas
    interpret mode off-TPU.

    Caveat: when a row holds fewer than k finite entries, the +inf tail's
    indices may repeat (each extraction re-selects an inf slot) — callers
    must mask results by `isfinite(vals)`, not trust indices of inf entries.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N = x.shape
    bp = 8
    while bp < 64 and (bp * 2) * N <= _MAX_BLOCK_ELEMS and B % (bp * 2) == 0:
        bp *= 2
    if (N % _LANE != 0 or B % bp != 0 or bp * N > _MAX_BLOCK_ELEMS
            or k > N or k > 128):
        neg, idx = jax.lax.top_k(-x, k)
        return -neg, idx
    return _topk_pallas(x.astype(jnp.float32), k=k, bp=bp,
                        interpret=interpret)
