"""Pallas top-k kernel: exactness vs lax.top_k, plus fold-merge search
parity (fold is exact for cells <= 128 postings — the collision-free case)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivfadc_tpu.ops.topk import topk_lastdim


@pytest.mark.parametrize("shape,k", [
    ((64, 1024), 10),
    ((8, 128), 8),
    ((128, 2048), 128),
    ((1000, 1024), 10),   # B divisible by 8 only
])
def test_topk_matches_lax(shape, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    vals, idx = topk_lastdim(x, k)
    neg, _ = jax.lax.top_k(-x, k)
    np.testing.assert_allclose(np.asarray(vals), -np.asarray(neg), rtol=0)
    # indices must actually point at the returned values
    got = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, np.asarray(vals), rtol=0)


@pytest.mark.parametrize("shape,k", [
    ((7, 1000), 5),      # falls back: B % 8 != 0, N % 128 != 0
    ((4, 96), 96),       # k > 128 not needed; N tiny
])
def test_topk_fallback_shapes(shape, k):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    vals, idx = topk_lastdim(x, k)
    neg, _ = jax.lax.top_k(-x, k)
    np.testing.assert_allclose(np.asarray(vals), -np.asarray(neg), rtol=0)


def test_topk_with_inf_padding():
    x = np.full((8, 256), np.inf, np.float32)
    x[:, :5] = np.arange(5, dtype=np.float32)
    vals, idx = topk_lastdim(jnp.asarray(x), 10)
    v = np.asarray(vals)
    assert (v[:, :5] == np.arange(5)).all()
    assert np.isinf(v[:, 5:]).all()


def test_fold_merge_matches_exact_small_cells():
    """Cells < 128 postings -> fold merge is provably exact; full search
    results must match the exact merge bit-for-bit (same index, same
    queries)."""
    from ivfadc_tpu import IVFADCIndex
    rng = np.random.RandomState(0)
    centers = rng.randn(16, 32).astype(np.float32) * 4
    data = np.concatenate(
        [c + rng.randn(64, 32).astype(np.float32) for c in centers])
    out = {}
    for merge in ("exact", "fold"):
        idx = IVFADCIndex.build(data, kc=16, k=16, m=4, seed=0,
                                coarse_maxiter=5, quantization_maxiter=5,
                                scan_mode="dense", scan_merge=merge)
        out[merge] = idx.search_padded(data[:32], 10, w=4)
    np.testing.assert_array_equal(out["exact"][0], out["fold"][0])
    np.testing.assert_allclose(out["exact"][1], out["fold"][1], rtol=1e-6)


@pytest.mark.heavy                # ~15 s: large-cell fold-buffer stress
def test_fold_merge_recall_large_cells():
    """One big cell (>> 128 postings): fold may drop colliding candidates but
    top-1 is always exact and recall@10 must stay near the exact merge."""
    from ivfadc_tpu import IVFADCIndex
    from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r
    rng = np.random.RandomState(3)
    data = rng.randn(4096, 16).astype(np.float32)
    queries = data[:128] + 0.01 * rng.randn(128, 16).astype(np.float32)
    _, gt = brute_force_topk(data, queries, 10)
    rec = {}
    for merge in ("exact", "fold"):
        idx = IVFADCIndex.build(data, kc=2, k=256, m=8, seed=0,
                                coarse_maxiter=4, quantization_maxiter=8,
                                scan_mode="dense", scan_merge=merge)
        ids, dists = idx.search_padded(queries, 10, w=2)
        rec[merge] = recall_at_r(ids, gt, 10)
        # top-1 per query is collision-proof in fold mode
        ids1, _ = idx.search_padded(queries, 1, w=2)
        assert (ids1 >= 0).all()
    assert rec["fold"] >= rec["exact"] - 0.02, rec


@pytest.mark.heavy                # ~9 s: kc=2^14 two-level coarse stress
def test_two_level_scan_stage2_large_kc():
    """kc above the gather cutoff routes coarse stage 2 through the grouped
    Pallas scan; probed cells must be (approximately) the true nearest —
    measured as top-w recall vs the exact brute-force coarse scan."""
    from ivfadc_tpu.models.coarse import (NaiveCoarseQuantizer,
                                          TwoLevelCoarseQuantizer,
                                          build_two_level)
    from ivfadc_tpu.ops.metrics import SQEUCLIDEAN
    rng = np.random.RandomState(0)
    kc, d = 8192, 32
    assert kc > TwoLevelCoarseQuantizer._GATHER_MAX
    cents = jnp.asarray(rng.randn(kc, d).astype(np.float32))
    tl = build_two_level(jax.random.PRNGKey(0), cents, SQEUCLIDEAN,
                         maxiter=8)
    naive = NaiveCoarseQuantizer(cents, SQEUCLIDEAN)
    q = jnp.asarray(rng.randn(64, d).astype(np.float32))
    cells_tl, dists_tl = tl.search(q, 4)
    cells_ex, _ = naive.search(q, 4)
    hit = np.mean([len(set(a.tolist()) & set(b.tolist())) / 4
                   for a, b in zip(np.asarray(cells_tl),
                                   np.asarray(cells_ex))])
    # uniform random centroids are the worst case for group pruning (no
    # cluster structure to exploit); real coarse centroids do much better
    assert hit >= 0.8, hit
    # distances must match the true squared distances (bf16-level tolerance)
    true_d = np.asarray(
        jnp.sum((q[:, None, :] - cents[cells_tl]) ** 2, axis=-1))
    np.testing.assert_allclose(np.asarray(dists_tl), true_d,
                               rtol=2e-2, atol=1e-2)
