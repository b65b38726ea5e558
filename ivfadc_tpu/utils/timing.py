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
