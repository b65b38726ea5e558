"""Coarse quantizers.

The reference defines an AbstractCoarseQuantizer with two implementations
(/root/reference/src/coarsequantizers.jl):
  * NaiveQuantizer — brute-force colwise distance over all kc centroids (:18-48)
  * HNSWQuantizer  — graph ANN over the centroids (:58-93)

On TPU the brute-force scan IS the fast path: distances to all kc centroids
are a single (B, d) x (d, kc) matmul on the MXU + `lax.top_k`, which beats
pointer-chasing graph traversal up to very large kc (SURVEY §2.2). So:
  * NaiveCoarseQuantizer  — the matmul scan (default).
  * TwoLevelCoarseQuantizer — the ":hnsw" replacement for huge kc (~2^18,
    Deep1B-scale): cluster the kc centroids into g groups, probe the top
    groups, then scan only their members. Sublinear in kc, still all
    matmul/top_k, fully static shapes.

Both are registered as JAX pytrees so a quantizer can be passed straight into
jitted search functions; their `search` is trace-compatible.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ivfadc_tpu.ops.metrics import Metric, get_metric


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NaiveCoarseQuantizer:
    """Brute-force coarse scan (reference NaiveQuantizer,
    /root/reference/src/coarsequantizers.jl:18-48)."""

    centroids: jax.Array        # (kc, d) float32
    metric: Metric              # static

    kind = "naive"

    @property
    def kc(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    def search(self, queries: jax.Array, w: int) -> Tuple[jax.Array, jax.Array]:
        """(B, d) queries -> (cells (B, w) int32, dists (B, w) f32). Jittable."""
        from ivfadc_tpu.ops.topk import topk_lastdim
        dist = self.metric.pairwise(queries, self.centroids)    # (B, kc)
        dists, cells = topk_lastdim(dist, w)
        return cells.astype(jnp.int32), dists

    def tree_flatten(self):
        return (self.centroids,), (self.metric,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TwoLevelCoarseQuantizer:
    """Two-level coarse scan standing in for the reference's :hnsw option
    (/root/reference/src/coarsequantizers.jl:58-93): same role (sublinear
    coarse search over many centroids), TPU-native mechanics (two stacked
    matmul+top_k stages instead of graph traversal)."""

    centroids: jax.Array        # (kc, d) float32 — the actual cells
    group_centers: jax.Array    # (g, d) float32
    members: jax.Array          # (g, gmax) int32, padded with -1
    metric: Metric              # static
    n_probe_groups: int         # static

    kind = "two_level"

    @property
    def kc(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    def search(self, queries: jax.Array, w: int) -> Tuple[jax.Array, jax.Array]:
        from ivfadc_tpu.ops.topk import topk_lastdim
        gp = min(self.n_probe_groups, self.group_centers.shape[0])
        gdist = self.metric.pairwise(queries, self.group_centers)   # (B, g)
        _, gids = topk_lastdim(gdist, gp)                           # (B, gp)
        cand = self.members[gids].reshape(queries.shape[0], -1)     # (B, gp*gmax)
        valid = cand >= 0
        cvecs = self.centroids[jnp.where(valid, cand, 0)]           # (B, C, d)
        # Per-candidate distance, batched over queries.
        cdist = jax.vmap(self.metric.pairwise)(queries[:, None, :], cvecs)[:, 0, :]
        cdist = jnp.where(valid, cdist, jnp.inf)
        dists, pos = topk_lastdim(cdist, w)
        cells = jnp.take_along_axis(cand, pos, axis=1)
        return cells.astype(jnp.int32), dists

    def tree_flatten(self):
        return ((self.centroids, self.group_centers, self.members),
                (self.metric, self.n_probe_groups))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1])


def build_two_level(key: jax.Array, centroids: jax.Array, metric: Metric,
                    n_groups: int = 0, n_probe_groups: int = 0,
                    maxiter: int = 16) -> TwoLevelCoarseQuantizer:
    """Cluster the kc centroids into ~sqrt(kc) groups."""
    from ivfadc_tpu.ops.kmeans import kmeans

    kc = centroids.shape[0]
    g = n_groups or max(1, int(math.ceil(math.sqrt(kc))))
    g = min(g, kc)
    if g <= 1:
        group_centers = jnp.mean(centroids, axis=0, keepdims=True)
        members = jnp.arange(kc, dtype=jnp.int32)[None, :]
        return TwoLevelCoarseQuantizer(centroids, group_centers, members,
                                       metric, 1)
    res = kmeans(key, centroids, g, maxiter=maxiter, metric=metric)
    assign = np.asarray(res.assignments)
    counts = np.bincount(assign, minlength=g)
    gmax = max(1, int(counts.max()))
    members = np.full((g, gmax), -1, np.int32)
    fill = np.zeros(g, np.int64)
    for c, a in enumerate(assign):
        members[a, fill[a]] = c
        fill[a] += 1
    gp = n_probe_groups or max(1, -(-g // 4))
    return TwoLevelCoarseQuantizer(centroids, res.centers,
                                   jnp.asarray(members), metric, gp)


def make_coarse_quantizer(kind: str, key, centroids, metric: Metric):
    if kind == "naive":
        return NaiveCoarseQuantizer(jnp.asarray(centroids, jnp.float32), metric)
    if kind in ("hnsw", "two_level"):
        return build_two_level(key, jnp.asarray(centroids, jnp.float32), metric)
    raise ValueError(f"unknown coarse quantizer kind {kind!r}")
