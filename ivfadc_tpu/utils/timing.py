"""Honest device timing under high-latency runtimes.

Some JAX runtimes (e.g. tunneled remote devices) make `block_until_ready`
an unreliable completion barrier and add tens of ms of RPC round-trip
latency. `true_time` therefore:
  * runs `reps` pipelined calls,
  * folds a scalar data-dependence over every output (a jitted `acc + sum`),
  * fetches the final scalar — the fetch cannot complete before every rep's
    compute has, so wall-clock covers real execution;
  * subtracts the measured fixed round-trip cost (an empty chain).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


@jax.jit
def _fold(acc, leaf_sum):
    return acc + leaf_sum


@jax.jit
def _leaf_sum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    tot = jnp.float32(0)
    for leaf in leaves:
        # cheap data dependence: one element is enough to chain completion
        # of the whole buffer under a single-stream execution model
        tot = tot + jax.lax.convert_element_type(leaf.ravel()[-1], jnp.float32)
    return tot


def roundtrip_latency(samples: int = 3) -> float:
    acc = jnp.float32(0)
    float(_fold(acc, jnp.float32(1)))
    t0 = time.perf_counter()
    for _ in range(samples):
        float(_fold(acc, jnp.float32(1)))
    return (time.perf_counter() - t0) / samples


def roundtrip_stats(samples: int = 12) -> dict:
    """Per-sample round-trip timings: mean + empirical jitter (stddev, max
    deviation above the mean). The jitter is the honest resolution floor of
    any single-dispatch latency measurement on this runtime — a
    baseline-subtracted p50 below it is indistinguishable from zero."""
    acc = jnp.float32(0)
    float(_fold(acc, jnp.float32(1)))      # warm
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(_fold(acc, jnp.float32(1)))
        ts.append(time.perf_counter() - t0)
    import statistics
    mean = statistics.fmean(ts)
    std = statistics.pstdev(ts)
    return {"mean": mean, "std": std,
            "max_over_mean": max(ts) - mean, "samples": samples}


def chain_time(step_fn: Callable, x0, iters: int = 256,
               perturb: float = 1e-6, baseline: float = None) -> float:
    """Tunnel-independent per-call latency: serialize `iters` calls of
    `step_fn` *inside one jitted program* via a data dependence (each step's
    input is perturbed by a scalar folded from the previous step's outputs),
    so the device cannot overlap them; wall time / iters is true on-chip
    latency, unaffected by RPC round trips (paid once per chain, subtracted
    via `baseline`).

    `step_fn(x) -> pytree` must be traceable (pure JAX) on input shaped like
    `x0`. Outputs are folded through `nan_to_num`, so -inf pad sentinels in
    the outputs don't poison the chain."""
    import jax.lax as lax

    @jax.jit
    def chain(x):
        def step(q, _):
            outs = step_fn(q)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(outs):
                v = jax.lax.convert_element_type(leaf.ravel()[0], jnp.float32)
                s = s + jnp.nan_to_num(v, posinf=1.0, neginf=-1.0)
            # keep inputs bounded: perturb around x0, not cumulatively
            return x + perturb * jnp.tanh(s), ()
        xf, _ = lax.scan(step, x, None, length=iters)
        return jnp.sum(xf)

    if baseline is None:
        baseline = roundtrip_latency()
    float(chain(x0))                       # compile + warm
    t0 = time.perf_counter()
    float(chain(x0))
    dt = time.perf_counter() - t0
    return max(0.0, dt - baseline) / iters


def true_time(fn: Callable, reps: int = 20, warm: int = 2,
              baseline: float = None) -> float:
    """Mean per-call wall time of `fn`, amortizing RPC latency across `reps`
    pipelined calls.

    `fn` is nullary, or unary taking the rep index — PASS A UNARY `fn` THAT
    VARIES ITS INPUT with the index whenever the computation is pure: some
    remote runtimes memoize identical (executable, args) calls, which makes
    repeated same-input timing read near zero.
    """
    import inspect
    takes_i = len(inspect.signature(fn).parameters) >= 1
    call = (lambda i: fn(i)) if takes_i else (lambda i: fn())
    if baseline is None:
        baseline = roundtrip_latency()
    # at least one warm call: its output also warms the _fold/_leaf_sum jits
    for j in range(max(warm, 1)):
        out = call(-1 - j)
    acc = jnp.float32(0)
    acc = _fold(acc, _leaf_sum(out))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(reps):
        acc = _fold(acc, _leaf_sum(call(i)))
    float(acc)
    dt = time.perf_counter() - t0
    return max(0.0, (dt - baseline)) / reps
