"""Opt-in scan-engine variants: interpret-mode parity with the default path.

Both are round-5 hardware A/B candidates (RESULTS.md): `IVFADC_VBASE=qc`
(in-kernel v/base derivation — measured a wash, kept opt-in) and
`IVFADC_NORMS=cache` (precomputed row-norm stream replacing the in-kernel
norms matmul). Whatever their perf fate, their MATH must stay pinned to
the default engine.
"""

import dataclasses

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex


@pytest.fixture()
def dense_index():
    rng = np.random.RandomState(0)
    data = rng.rand(20000, 24).astype(np.float32)
    q = rng.rand(128, 24).astype(np.float32)
    idx = IVFADCIndex.build(data, kc=32, m=4, k=16, seed=3)
    idx.config = dataclasses.replace(idx.config, scan_mode="dense")
    return data, q, idx


def test_vbase_qc_matches_default(dense_index, monkeypatch):
    data, q, idx = dense_index
    i1, d1 = idx.search_padded(q, 10, w=8)
    monkeypatch.setenv("IVFADC_VBASE", "qc")
    i2, d2 = idx.search_padded(q, 10, w=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-5)


def test_norms_cache_matches_default(dense_index, monkeypatch):
    """Cached norms are DEFAULT-ON since the round-5 hardware win; pin
    parity against the compute-in-kernel path (IVFADC_NORMS=off)."""
    data, q, idx = dense_index
    monkeypatch.setenv("IVFADC_NORMS", "off")
    i1, d1 = idx.search_padded(q, 10, w=8)
    monkeypatch.setenv("IVFADC_NORMS", "cache")
    idx.store._invalidate()          # rebuild the view with the norm stream
    i2, d2 = idx.search_padded(q, 10, w=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-5)
    # stays coherent through dynamic ops (flush patches the norm rows)
    idx.push_batch(data[:16] + 0.01)
    idx.delete([3, 5])
    i3, d3 = idx.search_padded(q, 5, w=8)
    monkeypatch.delenv("IVFADC_NORMS")
    tw = IVFADCIndex.build(data, kc=32, m=4, k=16, seed=3)
    tw.config = dataclasses.replace(tw.config, scan_mode="dense")
    tw.push_batch(data[:16] + 0.01)
    tw.delete([3, 5])
    i4, d4 = tw.search_padded(q, 5, w=8)
    np.testing.assert_allclose(d3, d4, rtol=1e-3, atol=1e-5)
    agree = (np.asarray(i3) == np.asarray(i4)).mean()
    assert agree > 0.99, agree       # bf16 tie reshuffles only
