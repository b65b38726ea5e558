"""Persistence round-trip tests (reference test/persistency.jl)."""

import os

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex, load_ivfadc_index, save_ivfadc_index
from tests.conftest import build_random_index


@pytest.mark.parametrize("coarse_quantizer", ["naive", "hnsw"])
def test_save_load_field_for_field(tmp_path, random_data, coarse_quantizer):
    """Field-for-field equality after round trip — same contract as
    test/persistency.jl:13-29 (naive) and :50-83 (hnsw: the two-level
    grouping arrays play the role of the serialized HNSW graph)."""
    idx = build_random_index(random_data, coarse_quantizer=coarse_quantizer)
    path = str(tmp_path / "index.npz")
    save_ivfadc_index(path, idx)
    idx2 = load_ivfadc_index(path)

    assert type(idx.coarse) is type(idx2.coarse)
    np.testing.assert_array_equal(np.asarray(idx.coarse.centroids),
                                  np.asarray(idx2.coarse.centroids))
    if coarse_quantizer == "hnsw":
        np.testing.assert_array_equal(np.asarray(idx.coarse.group_centers),
                                      np.asarray(idx2.coarse.group_centers))
        np.testing.assert_array_equal(np.asarray(idx.coarse.members),
                                      np.asarray(idx2.coarse.members))
        assert idx.coarse.n_probe_groups == idx2.coarse.n_probe_groups
    # residual quantizer
    assert idx.quantizer.method == idx2.quantizer.method
    np.testing.assert_array_equal(np.asarray(idx.quantizer.codebooks),
                                  np.asarray(idx2.quantizer.codebooks))
    np.testing.assert_array_equal(np.asarray(idx.quantizer.rotation),
                                  np.asarray(idx2.quantizer.rotation))
    # config
    assert idx.config == idx2.config
    assert idx.data_dtype == idx2.data_dtype
    assert idx.dim == idx2.dim
    # postings: every cell identical
    np.testing.assert_array_equal(idx.store.offsets, idx2.store.offsets)
    np.testing.assert_array_equal(idx.store.sizes, idx2.store.sizes)
    np.testing.assert_array_equal(idx.store.ids, idx2.store.ids)
    np.testing.assert_array_equal(idx.store.codes, idx2.store.codes)


def test_search_identical_after_reload(tmp_path, random_data):
    idx = build_random_index(random_data)
    path = str(tmp_path / "index.npz")
    idx.save(path)
    idx2 = IVFADCIndex.load(path)
    q = random_data[:16]
    i1, d1 = idx.search_padded(q, 5, w=4)
    i2, d2 = idx2.search_padded(q, 5, w=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2)


def test_reload_preserves_dynamic_state(tmp_path, random_data):
    idx = build_random_index(random_data)
    idx.push(np.random.RandomState(0).rand(10))
    idx.delete([3, 4])
    path = str(tmp_path / "index.npz")
    idx.save(path)
    idx2 = IVFADCIndex.load(path)
    assert len(idx2) == len(idx)
    np.testing.assert_array_equal(idx.store.ids, idx2.store.ids)
    # dynamic ops continue to work on the loaded index
    idx2.push(np.random.RandomState(1).rand(10))
    assert len(idx2) == len(idx) + 1


def test_future_version_rejected(tmp_path, random_data):
    import json
    idx = build_random_index(random_data)
    path = str(tmp_path / "index.npz")
    idx.save(path)
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays["__meta__"]).decode())
    meta["format_version"] = 999
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                       dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    with pytest.raises(ValueError):
        IVFADCIndex.load(path)


def test_opq_roundtrip(tmp_path):
    data = np.random.RandomState(2).randn(300, 8).astype(np.float32)
    idx = IVFADCIndex.build(data, kc=4, k=16, m=2,
                            quantization_method="opq", seed=3)
    path = str(tmp_path / "opq.npz")
    idx.save(path)
    idx2 = IVFADCIndex.load(path)
    assert idx2.quantizer.method == "opq"
    q = data[:4]
    np.testing.assert_array_equal(idx.search_padded(q, 3, w=2)[0],
                                  idx2.search_padded(q, 3, w=2)[0])
