"""Wide-id mode: external ids beyond the device int32 cap.

The reference's capacity law admits any index dtype up to UInt64
(/root/reference/src/index.jl:124 TYPE_TO_BITS, pushed at
src/utils.jl:134-135). Device arrays are int32, so sharded views lift the
cap by storing per-shard SLOT indices on device and a slot -> uint64
global-id translation on host (parallel/sharded.py wide-id mode).

These tests lower the cap via IVFADC_DEVICE_ID_CAP (config.device_id_cap)
so the machinery is exercised at toy scale: a few thousand points "exceed"
a 2^10 cap exactly like billions exceed 2^31.
"""

import os

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex
from ivfadc_tpu.parallel.mesh import make_mesh
from ivfadc_tpu.parallel.persistence import (consolidate_sharded_index,
                                             load_sharded_index,
                                             save_sharded_index)
from ivfadc_tpu.parallel.sharded import WIDE_NO_ID, ShardedIVFADCIndex

KW = dict(kc=32, k=16, m=2, index_dtype="uint64", coarse_maxiter=8,
          quantization_maxiter=8, seed=3)
CAP = 1024


@pytest.fixture
def low_cap(monkeypatch):
    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))


@pytest.fixture(scope="module")
def wide_data():
    rng = np.random.RandomState(5)
    return rng.rand(3000, 12).astype(np.float32)


def _uncapped_twin_results(data, queries, k, w):
    """Reference results from a value-mode build of the same data (the env
    override is read per call, so build/search the twin while it is unset)."""
    assert "IVFADC_DEVICE_ID_CAP" not in os.environ
    twin = ShardedIVFADCIndex.build(data, make_mesh(n_shards=4, n_data=2),
                                    **KW)
    return twin.search_padded(queries, k, w=w)


def test_plain_build_beyond_cap_rejected(low_cap, wide_data):
    with pytest.raises(AssertionError, match="ShardedIVFADCIndex"):
        IVFADCIndex.build(wide_data, **KW)


def test_distributed_build_wide_matches_value_mode(wide_data, monkeypatch):
    q = wide_data[:64]
    ref_ids, ref_d = _uncapped_twin_results(wide_data, q, 10, 8)
    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    sidx = ShardedIVFADCIndex.build(wide_data,
                                    make_mesh(n_shards=4, n_data=2), **KW)
    assert sidx.wide_ids
    ids, dists = sidx.search_padded(q, 10, w=8)
    assert ids.dtype == np.uint64
    # identical neighbor ids/distances as the value-mode twin — wide mode
    # changes the id plumbing, not the math
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])
    assert (ids[~same] == WIDE_NO_ID).all()
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)
    # trimmed search API returns uint64 ids as well
    one_i, one_d = sidx.search(q[0], 5, w=8)
    assert one_i.dtype == np.uint64
    np.testing.assert_array_equal(one_i.astype(np.int64),
                                  ref_ids[0][:len(one_i)])


def test_wide_dynamic_ops_match_value_mode(wide_data, monkeypatch):
    rng = np.random.RandomState(9)
    extra = rng.rand(40, 12).astype(np.float32)
    dels = sorted(rng.choice(2000, 25, replace=False).tolist())
    q = wide_data[:32]

    # value-mode twin applies the same ops with the cap untouched
    twin = ShardedIVFADCIndex.build(wide_data,
                                    make_mesh(n_shards=4, n_data=2), **KW)
    twin.push_batch(extra)
    twin.delete(dels)
    twin.push_front(extra[0] * 1.01)
    popped_ref = twin.pop()
    ref_ids, ref_d = twin.search_padded(q, 10, w=8)

    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    sidx = ShardedIVFADCIndex.build(wide_data,
                                    make_mesh(n_shards=4, n_data=2), **KW)
    assert sidx.wide_ids
    sidx.push_batch(extra)
    sidx.delete(dels)
    sidx.push_front(extra[0] * 1.01)
    popped = sidx.pop()
    np.testing.assert_allclose(popped, popped_ref, rtol=1e-6)
    ids, dists = sidx.search_padded(q, 10, w=8)
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)
    # reconstruct round-trips through the wide fetch path
    rec = sidx.reconstruct(0)
    rec_ref = twin.reconstruct(0)
    np.testing.assert_allclose(rec, rec_ref, rtol=1e-6)


def test_host_based_view_upgrades_on_push(wide_data, monkeypatch):
    """A value-mode host-based view crossing the cap upgrades to wide-id
    mode in place; results keep matching an uncapped twin."""
    base_n = 900
    extra = wide_data[base_n:base_n + 400]
    q = wide_data[:32]

    twin_idx = IVFADCIndex.build(wide_data[:base_n], **KW)
    twin = ShardedIVFADCIndex(twin_idx, make_mesh(n_shards=4, n_data=2))
    twin.push_batch(extra)
    ref_ids, ref_d = twin.search_padded(q, 10, w=8)

    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    idx = IVFADCIndex.build(wide_data[:base_n], **KW)
    sidx = ShardedIVFADCIndex(idx, make_mesh(n_shards=4, n_data=2))
    assert not sidx.wide_ids               # 900 < 1024: starts value-mode
    sidx.push_batch(extra)                 # 1300 > 1024: upgrades
    assert sidx.wide_ids
    assert len(idx) == base_n + 400
    ids, dists = sidx.search_padded(q, 10, w=8)
    assert ids.dtype == np.uint64
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)

    # further dynamic ops run in wide mode through the host-based path
    dels = [0, 5, base_n + 10]
    twin.delete(dels)
    sidx.delete(dels)
    ids, _ = sidx.search_padded(q, 10, w=8)
    ref_ids, _ = twin.search_padded(q, 10, w=8)
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])


def test_wide_save_load_reshard_consolidate(wide_data, tmp_path, monkeypatch):
    q = wide_data[:32]
    ref_ids, ref_d = _uncapped_twin_results(wide_data, q, 10, 8)
    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    sidx = ShardedIVFADCIndex.build(wide_data,
                                    make_mesh(n_shards=4, n_data=2), **KW)
    path = str(tmp_path / "wide_dir")
    save_sharded_index(path, sidx)

    # same shard count
    back = load_sharded_index(path, make_mesh(n_shards=4, n_data=2))
    assert back.wide_ids
    ids, dists = back.search_padded(q, 10, w=8)
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)

    # reshard on load (4 -> 2)
    back2 = load_sharded_index(path, make_mesh(n_shards=2, n_data=2))
    assert back2.wide_ids
    ids2, _ = back2.search_padded(q, 10, w=8)
    np.testing.assert_array_equal(ids2[same].astype(np.int64), ref_ids[same])

    # consolidation folds the uint64 translation back into host int64 ids
    flat = consolidate_sharded_index(path)
    assert len(flat) == len(wide_data)
    order = np.argsort(flat.store.ids[flat.store.ids >= 0])
    assert (np.sort(flat.store.ids[flat.store.ids >= 0])
            == np.arange(len(wide_data))).all()
    del order
    # the plain device search refuses to serve beyond the cap, loudly
    with pytest.raises(AssertionError, match="device int32 id cap"):
        flat.search_padded(q, 5, w=4)


def test_wide_streaming_build(wide_data, monkeypatch):
    q = wide_data[:16]
    chunks = [wide_data[s:s + 640] for s in range(0, len(wide_data), 640)]
    # value-mode streaming twin (same pipeline, cap untouched): the wide
    # build must reproduce its results exactly — wide mode only changes
    # the id plumbing
    twin = ShardedIVFADCIndex.build_streaming(
        chunks, make_mesh(n_shards=4, n_data=2), train_data=wide_data, **KW)
    assert not twin.wide_ids
    ref_ids, ref_d = twin.search_padded(q, 5, w=8)
    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    sidx = ShardedIVFADCIndex.build_streaming(
        chunks, make_mesh(n_shards=4, n_data=2), train_data=wide_data, **KW)
    assert sidx.wide_ids
    ids, dists = sidx.search_padded(q, 5, w=8)
    same = ref_ids >= 0
    np.testing.assert_array_equal(ids[same].astype(np.int64), ref_ids[same])
    np.testing.assert_allclose(dists, ref_d, rtol=1e-5)


def test_serving_over_wide_view(wide_data, monkeypatch):
    """BatchingSearcher epoch-swap mutations work over a wide-id sharded
    view: the fork copies the host translation, searches resolve to uint64
    ids, and mutations through the searcher stay consistent."""
    from ivfadc_tpu.serving import BatchingSearcher

    monkeypatch.setenv("IVFADC_DEVICE_ID_CAP", str(CAP))
    sidx = ShardedIVFADCIndex.build(wide_data[:2000],
                                    make_mesh(n_shards=4, n_data=2), **KW)
    assert sidx.wide_ids
    n0 = len(sidx.index)
    with BatchingSearcher(sidx, max_batch=16, max_wait_ms=1) as s:
        ids, _ = s.submit(wide_data[0], 5, w=8).result(timeout=60)
        assert ids.dtype == np.uint64 and int(ids[0]) == 0
        s.push_batch(wide_data[2000:2008])
        s.delete([3, 7])
        ids2, d2 = s.submit(wide_data[2001], 5, w=8).result(timeout=60)
        assert ids2.dtype == np.uint64
    # serving results == direct post-mutation results (epoch converged)
    direct_ids, direct_d = sidx.search_padded(wide_data[2001][None], 5, w=8)
    np.testing.assert_array_equal(ids2, direct_ids[0])
    np.testing.assert_allclose(d2, direct_d[0], rtol=1e-6)
    assert len(sidx.index) == n0 + 6
