"""Parity of the fused coarse-probe engines (ops/coarse_scan.py).

v2 recovers winning centroid rows with bf16 hi/lo split matmuls against the
pre-rotated table and derives |rot(q-c)|^2 from the coarse scores (valid for
orthogonal rotations). Cells/cdists must match v1 exactly; v and base to
bf16/f32-cancellation tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ivfadc_tpu.ops.coarse_scan import coarse_probe_vbase


def _random_orthogonal(d, rng):
    q, _ = np.linalg.qr(rng.randn(d, d))
    return q.astype(np.float32)


@pytest.mark.parametrize("apply_rot", [False, True])
@pytest.mark.parametrize("include_base", [False, True])
def test_vbase_v2_matches_v1(apply_rot, include_base):
    rng = np.random.RandomState(0)
    B, d, kc, w = 64, 128, 256, 4
    # offset queries so |c| >> |r| exercises the cancellation-sensitive path
    cents = rng.randn(kc, d).astype(np.float32) * 2.0 + 5.0
    q = cents[rng.randint(0, kc, B)] + 0.3 * rng.randn(B, d).astype(
        np.float32)
    rot = _random_orthogonal(d, rng)
    out = {}
    for engine in ("v1", "v2"):
        r = coarse_probe_vbase(jnp.asarray(q), jnp.asarray(cents), w,
                               jnp.asarray(rot), apply_rot, include_base,
                               interpret=True, engine=engine,
                               rot_orthogonal=True)
        assert r is not None
        out[engine] = [np.asarray(x) for x in r]
    cells1, cd1, v1, b1 = out["v1"]
    cells2, cd2, v2, b2 = out["v2"]
    np.testing.assert_array_equal(cells1, cells2)
    np.testing.assert_allclose(cd1, cd2, rtol=1e-6, atol=1e-5)
    # v: both are bf16; differ only by sub-bf16 row-recovery error
    np.testing.assert_allclose(
        v1.astype(np.float32), v2.astype(np.float32), rtol=2e-2, atol=2e-2)
    # base: v1 sums r*r directly, v2 uses the score identity — they agree up
    # to f32 cancellation on the |q|^2 + |c|^2 scale
    scale = np.abs(b1).max() + (q * q).sum(1).max()
    np.testing.assert_allclose(b1, b2, atol=1e-5 * scale, rtol=1e-4)


def test_vbase_v2_undeclared_rotation_falls_back():
    """Without rot_orthogonal=True an apply_rot v2 request must run the
    always-correct v1 (bit-identical outputs, including the |r|^2 base)."""
    rng = np.random.RandomState(5)
    B, d, kc, w = 16, 128, 128, 2
    cents = rng.randn(kc, d).astype(np.float32)
    q = rng.randn(B, d).astype(np.float32)
    rot = _random_orthogonal(d, rng) * 1.5        # NOT an isometry
    a = coarse_probe_vbase(jnp.asarray(q), jnp.asarray(cents), w,
                           jnp.asarray(rot), True, False,
                           interpret=True, engine="v2")
    b = coarse_probe_vbase(jnp.asarray(q), jnp.asarray(cents), w,
                           jnp.asarray(rot), True, False,
                           interpret=True, engine="v1")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("method", ["pq", "opq"])
def test_end_to_end_search_v2_engine(monkeypatch, method):
    """Full dense search with IVFADC_COARSE_ENGINE=v2 returns the same
    neighbors as the default engine (d/kc sized so the fused kernel
    actually engages: d % 128 == 0, kc % 128 == 0)."""
    from ivfadc_tpu import IVFADCIndex
    rng = np.random.RandomState(3)
    kc, d, n_per = 128, 128, 24
    centers = rng.randn(kc, d).astype(np.float32) * 4
    base = np.concatenate(
        [c + rng.randn(n_per, d).astype(np.float32) for c in centers])
    idx = IVFADCIndex.build(base, kc=kc, k=32, m=8, seed=0,
                            coarse_maxiter=8, quantization_maxiter=8,
                            scan_mode="dense", quantization_method=method)
    q = base[rng.choice(len(base), 16, replace=False)]
    ids1, d1 = idx.search_padded(q, 10, w=4)
    monkeypatch.setenv("IVFADC_COARSE_ENGINE", "v2")
    ids2, d2 = idx.search_padded(q, 10, w=4)
    overlap = np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / max(len(set(b[b >= 0])), 1)
        for a, b in zip(ids2, ids1)])
    assert overlap > 0.95, overlap
    agree = ids1 == ids2
    np.testing.assert_allclose(d1[agree], d2[agree], rtol=2e-2, atol=1e-2)


def test_end_to_end_combined_v2_stack(monkeypatch):
    """All round-2 engines at once (extraction + rank v2 + coarse v2) —
    the combination the TPU validation queue benchmarks — must match the
    all-default stack end-to-end."""
    from ivfadc_tpu import IVFADCIndex
    rng = np.random.RandomState(11)
    kc, d, n_per = 128, 128, 24
    centers = rng.randn(kc, d).astype(np.float32) * 4
    base = np.concatenate(
        [c + rng.randn(n_per, d).astype(np.float32) for c in centers])
    idx = IVFADCIndex.build(base, kc=kc, k=32, m=8, seed=0,
                            coarse_maxiter=8, quantization_maxiter=8,
                            scan_mode="dense")
    q = base[rng.choice(len(base), 32, replace=False)]
    monkeypatch.setenv("IVFADC_NO_EXTRACT", "1")      # defaults: all v1
    monkeypatch.setenv("IVFADC_RANK_ENGINE", "v1")
    monkeypatch.setenv("IVFADC_COARSE_ENGINE", "v1")
    ids1, d1 = idx.search_padded(q, 10, w=8)
    monkeypatch.delenv("IVFADC_NO_EXTRACT")
    monkeypatch.setenv("IVFADC_EXTRACT", "1")
    monkeypatch.setenv("IVFADC_RANK_ENGINE", "v2")
    monkeypatch.setenv("IVFADC_COARSE_ENGINE", "v2")
    ids2, d2 = idx.search_padded(q, 10, w=8)
    overlap = np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / max(len(set(b[b >= 0])), 1)
        for a, b in zip(ids2, ids1)])
    assert overlap > 0.95, overlap
    agree = ids1 == ids2
    np.testing.assert_allclose(d1[agree], d2[agree], rtol=2e-2, atol=1e-2)


def test_vbase_v2_exact_rows_no_rot():
    """With q == a centroid, v2 must return v == 0 for the winning probe
    (hi+lo reconstructs the table row to ~f32)."""
    rng = np.random.RandomState(1)
    d, kc = 128, 128
    cents = rng.randn(kc, d).astype(np.float32) * 3.0
    q = cents[:8]
    r = coarse_probe_vbase(jnp.asarray(q), jnp.asarray(cents), 1,
                           jnp.eye(d, dtype=jnp.float32), False, False,
                           interpret=True, engine="v2")
    cells, cdists, v, base = [np.asarray(x) for x in r]
    np.testing.assert_array_equal(cells[:, 0], np.arange(8))
    # hi/lo residual error is ~2^-17 relative to |c|; v = -2*(rotq - rc)
    assert np.abs(v.astype(np.float32)).max() < 1e-3 * np.abs(cents).max()
    np.testing.assert_allclose(base[:, 0], 0.0, atol=1e-2)
