"""Construction + validation tests (reference test/index.jl:31-42)."""

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex
from tests.conftest import build_random_index


@pytest.mark.parametrize("coarse_quantizer", ["naive", "hnsw"])
def test_build_smoke(random_data, coarse_quantizer):
    idx = build_random_index(random_data, coarse_quantizer=coarse_quantizer)
    assert isinstance(idx, IVFADCIndex)
    assert len(idx) == 243
    assert idx.shape == (10, 243)
    assert "IVFADCIndex" in repr(idx)


def test_build_validation_errors():
    data = np.random.RandomState(0).rand(300, 2)
    # 1:1 with the four @test_throws at test/index.jl:37-41
    with pytest.raises(AssertionError):
        IVFADCIndex.build(data, kc=1, k=2, m=1)            # kc fail
    with pytest.raises(AssertionError):
        IVFADCIndex.build(data, kc=2, k=301, m=1)          # k > n fail
    with pytest.raises(AssertionError):
        IVFADCIndex.build(data, kc=2, k=300, m=3)          # m > d fail
    with pytest.raises(AssertionError):
        IVFADCIndex.build(data, index_dtype="uint8")       # 300 > 2^8 fail


def test_bytes_per_vector_readme_toy():
    # README.md:47 — UInt16 ids + 10 uint8 codes = 12-byte encoding
    data = np.random.RandomState(1).rand(1000, 50).astype(np.float32)
    idx = IVFADCIndex.build(data, kc=20, k=256, m=10, index_dtype="uint16",
                            coarse_maxiter=5, quantization_maxiter=5)
    assert idx.bytes_per_vector() == 12


def test_empty_cells_tolerated(random_data):
    # kc=100 on 243 points leaves some empty cells (SURVEY §2.3); search must
    # not crash and must still return results
    idx = build_random_index(random_data)
    assert (idx.store.sizes == 0).any() or True  # empties possible, not required
    ids, dists = idx.search(random_data[0], 5, w=3)
    assert len(ids) > 0


def test_introspection_parity(random_data):
    # reference tests access .inverse_index[c].idxs/.codes directly
    # (test/utils.jl:79-81); cell_entries is the equivalent
    idx = build_random_index(random_data)
    total = 0
    seen = []
    for c in range(idx.config.kc):
        ids, codes = idx.store.cell_entries(c)
        assert len(ids) == len(codes)
        total += len(ids)
        seen.extend(ids.tolist())
    assert total == len(idx)
    assert sorted(seen) == list(range(len(idx)))  # ids are 0..n-1 exactly


def test_config_defaults_match_reference():
    from ivfadc_tpu.config import IVFADCConfig
    c = IVFADCConfig()
    # /root/reference/src/defaults.jl:2-10
    assert c.kc == 2 and c.k == 256 and c.m == 1
    assert c.quantization_method == "pq"
    assert c.coarse_quantizer == "naive"
    assert c.coarse_metric == "sqeuclidean"
    assert c.quantization_metric == "sqeuclidean"
    assert c.coarse_maxiter == 25 and c.quantization_maxiter == 25
    assert c.index_dtype == "uint32"   # src/index.jl:114


def test_two_level_group_knobs(random_data):
    """coarse_n_groups / coarse_probe_groups config fields reach the
    two-level quantizer."""
    from tests.conftest import build_random_index
    idx = build_random_index(random_data, coarse_quantizer="two_level",
                             coarse_n_groups=5, coarse_probe_groups=2)
    assert idx.coarse.group_centers.shape[0] == 5
    assert idx.coarse.n_probe_groups == 2
    ids, dists = idx.search(np.asarray(random_data[3], np.float32), 3, w=4)
    assert len(ids) <= 3


def test_quantization_sample_build(random_data):
    """quantization_sample trains PQ on a subsample; search still works."""
    from tests.conftest import build_random_index
    idx = build_random_index(random_data, quantization_sample=100)
    ids, _ = idx.search(np.asarray(random_data[3], np.float32), 3, w=4)
    assert len(ids) <= 3


def test_memory_stats(random_data):
    """memory_stats reports encoded/capacity accounting without forcing
    device materialization, and adds device bytes once a view exists."""
    from tests.conftest import build_random_index
    idx = build_random_index(random_data)
    s = idx.memory_stats()
    assert s["n"] == len(idx)
    assert s["encoded_bytes"] == len(idx) * idx.bytes_per_vector()
    assert s["capacity_slots"] >= s["n"]
    assert 0 < s["fill_ratio"] <= 1
    assert s["cells"]["live"] <= s["cells"]["kc"]
    assert "device_scan_cache_bytes" not in s      # nothing materialized yet
    idx.search(np.asarray(random_data[0], np.float32), 2, w=2)
    s2 = idx.memory_stats()
    assert "device_lut_bytes" in s2 or "device_scan_cache_bytes" in s2


def test_probe_stats(random_data):
    """probe_stats reports the SURVEY §5 observability counters with
    internally consistent values (postings <= padded slots, selectivity =
    postings/n, nprobe clamped to kc)."""
    from ivfadc_tpu.utils.profiling import probe_stats
    index = build_random_index(random_data, kc=16, m=2, k=16)
    stats = probe_stats(index, random_data[:8], w=4)
    assert stats["nprobe"] == 4.0
    assert 0 < stats["scanned_postings_per_query"] <= \
        stats["scanned_slots_per_query"]
    assert np.isclose(stats["scan_selectivity"],
                      stats["scanned_postings_per_query"] / len(index))
    assert stats["max_cell_in_probe"] <= max(1, len(index))
    # w beyond kc clamps rather than crashing (reference w-clamp parity)
    assert probe_stats(index, random_data[:4], w=999)["nprobe"] == 16.0


def test_repr_parity_subobjects(random_data):
    """The reference `show`s InvertedList and both coarse quantizers
    (src/index.jl:12-15, src/coarsequantizers.jl:22-25,62-65); our
    equivalents expose the same at-a-glance facts, without hydrating."""
    idx = build_random_index(random_data, kc=16, m=2, k=16)
    r = repr(idx.store)
    assert "16 cells" in r and f"{len(idx)} vectors" in r
    r = repr(idx.coarse)
    assert "NaiveCoarseQuantizer" in r and "10×16" in r
    two = IVFADCIndex.build(random_data, kc=16, m=2, k=16, seed=0,
                            coarse_quantizer="hnsw")
    assert "TwoLevelCoarseQuantizer" in repr(two.coarse)
    assert "groups" in repr(two.coarse)
