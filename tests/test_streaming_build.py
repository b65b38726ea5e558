"""Out-of-core streaming build (`IVFADCIndex.build_streaming` /
`build_from_files` / `VecsChunks`).

The reference requires the full d x n matrix in memory
(/root/reference/src/index.jl:103); the streaming build trains on a
reservoir sample and encodes chunk-by-chunk, materializing only
(assignments, codes). Pinned here:
  * train_data == the full stream reproduces `build` exactly (same key
    discipline; chunk encode is row-deterministic);
  * the reservoir-sampled path reaches the recall of the full build;
  * VecsChunks streams byte-identical rows to the whole-file readers,
    across multiple files and max_rows caps;
  * one-shot generators are rejected (two passes are required).
"""

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex
from ivfadc_tpu.utils.datasets import VecsChunks, read_fvecs
from ivfadc_tpu.utils.evaluation import brute_force_topk, recall_at_r

from test_datasets import write_bvecs, write_fvecs


def _clustered(n, d, seed=0, nc=16):
    rng = np.random.RandomState(seed)
    centers = rng.randn(nc, d).astype(np.float32) * 3
    return (centers[rng.randint(0, nc, n)]
            + rng.randn(n, d).astype(np.float32) * 0.3)


def _chunks(data, rows):
    return [data[i:i + rows] for i in range(0, len(data), rows)]


def test_streaming_matches_build_with_full_train_data():
    data = _clustered(3000, 24, seed=1)
    kw = dict(kc=32, k=64, m=4, seed=3, coarse_maxiter=8,
              quantization_maxiter=8)
    ref = IVFADCIndex.build(data, **kw)
    idx = IVFADCIndex.build_streaming(_chunks(data, 700), train_data=data,
                                      **kw)
    assert len(idx) == len(ref) == 3000
    q = data[:64]
    ri, rd = ref.search_padded(q, 10, w=4)
    si, sd = idx.search_padded(q, 10, w=4)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)


def test_streaming_reservoir_recall_matches_full_build():
    data = _clustered(4000, 16, seed=2)
    kw = dict(kc=16, k=32, m=4, seed=0, coarse_maxiter=10,
              quantization_maxiter=10)
    full = IVFADCIndex.build(data, **kw)
    # sample < n: trains on a 1024-point reservoir of the 4000-point stream
    idx = IVFADCIndex.build_streaming(_chunks(data, 900), train_sample=1024,
                                      **kw)
    assert len(idx) == 4000
    q = data[:128]
    _, gt = brute_force_topk(data, q, 10)
    r_full = recall_at_r(np.asarray(full.search_padded(q, 10, w=8)[0]), gt, 10)
    r_strm = recall_at_r(np.asarray(idx.search_padded(q, 10, w=8)[0]), gt, 10)
    assert r_strm >= r_full - 0.08, (r_strm, r_full)


def test_streaming_rejects_one_shot_generator():
    data = _clustered(1200, 8, seed=3)
    gen = (c for c in _chunks(data, 300))        # consumed by pass 1
    with pytest.raises(AssertionError, match="re-iterable"):
        IVFADCIndex.build_streaming(gen, kc=4, k=16, m=2,
                                    train_sample=256)


def test_streaming_rejects_mismatched_dims():
    with pytest.raises(AssertionError, match="dim"):
        IVFADCIndex.build_streaming(
            [np.zeros((100, 8), np.float32), np.zeros((100, 9), np.float32)],
            kc=4, k=16, m=2)


def test_vecs_chunks_streams_whole_file(tmp_path):
    data = _clustered(1000, 12, seed=4)
    p = str(tmp_path / "base.fvecs")
    write_fvecs(p, data)
    ch = VecsChunks(p, chunk_rows=256)
    assert ch.dim == 12 and len(ch) == 1000
    got = np.concatenate(list(ch))
    np.testing.assert_array_equal(got, read_fvecs(p))
    # re-iterable: a second pass yields the same rows
    np.testing.assert_array_equal(np.concatenate(list(ch)), got)


def test_vecs_chunks_multifile_and_caps(tmp_path):
    a = _clustered(300, 6, seed=5)
    b = _clustered(450, 6, seed=6)
    pa, pb = str(tmp_path / "a.fvecs"), str(tmp_path / "b.fvecs")
    write_fvecs(pa, a)
    write_fvecs(pb, b)
    ch = VecsChunks([pa, pb], chunk_rows=128, max_rows=500)
    assert len(ch) == 500
    got = np.concatenate(list(ch))
    np.testing.assert_array_equal(got, np.concatenate([a, b])[:500])
    with pytest.raises(ValueError, match="dim|expected"):
        bad = _clustered(10, 7, seed=7)
        pc = str(tmp_path / "c.fvecs")
        write_fvecs(pc, bad)
        VecsChunks([pa, pc])


def test_vecs_chunks_bvecs(tmp_path):
    rng = np.random.RandomState(8)
    data = rng.randint(0, 256, (700, 16)).astype(np.uint8)
    p = str(tmp_path / "base.bvecs")
    write_bvecs(p, data)
    ch = VecsChunks(p, chunk_rows=200)
    got = np.concatenate(list(ch))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, data.astype(np.float32))


def test_build_from_files_end_to_end(tmp_path):
    data = _clustered(2000, 16, seed=9)
    p = str(tmp_path / "base.fvecs")
    write_fvecs(p, data)
    idx = IVFADCIndex.build_from_files(p, chunk_rows=512, kc=16, k=32, m=4,
                                       seed=0, coarse_maxiter=8,
                                       quantization_maxiter=8,
                                       train_sample=1500)
    assert len(idx) == 2000
    ids, dists = idx.search(data[42], 5, w=4)
    assert ids[0] == 42
    # dynamic ops + persistence work on a streamed-in index
    idx.push(data[0])
    assert len(idx) == 2001
    sp = str(tmp_path / "idx.npz")
    idx.save(sp)
    assert len(IVFADCIndex.load(sp)) == 2001


# ---------------------------------------------------------------- sharded
# Out-of-core ingest straight into a sharded serving view (the Deep1B
# regime: float data exceeds host memory AND the index exceeds one chip).

def test_sharded_streaming_matches_sharded_full_build():
    from ivfadc_tpu.parallel.mesh import make_mesh
    from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex

    data = _clustered(3000, 24, seed=11)
    kw = dict(kc=32, k=64, m=4, seed=3, coarse_maxiter=8,
              quantization_maxiter=8)
    mesh = make_mesh(n_shards=4, n_data=2)
    ref = ShardedIVFADCIndex(IVFADCIndex.build(data, **kw), mesh)
    strm = ShardedIVFADCIndex.build_streaming(
        _chunks(data, 700), mesh, train_data=data, **kw)
    assert len(strm.index) == 3000
    # the base index never built its full single-device view: the decoded
    # scan caches exist only shard-wise on the mesh
    assert strm.index.store._device is None
    assert strm.index.store._device_dense is None
    q = data[:64]
    ri, rd = ref.search_padded(q, 10, w=4)
    si, sd = strm.search_padded(q, 10, w=4)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(rd),
                               rtol=1e-5, atol=1e-5)


def test_sharded_streaming_dynamic_ops_and_refresh():
    from ivfadc_tpu.parallel.mesh import make_mesh
    from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex

    data = _clustered(2000, 16, seed=12)
    strm = ShardedIVFADCIndex.build_streaming(
        _chunks(data, 600), make_mesh(n_shards=4), train_data=data,
        kc=16, k=32, m=4, seed=1, coarse_maxiter=6, quantization_maxiter=6)
    strm.index.push(data[7])
    strm.index.delete([0, 1])
    strm.refresh()
    ids, _ = strm.search_padded(data[7:8], 3, w=4)
    assert 1998 in ids[0]        # pushed copy's id after the 2-delete shift
    ids1, _ = strm.index.search_padded(data[7:8], 3, w=4)
    assert set(np.asarray(ids[0]).tolist()) == \
        set(np.asarray(ids1[0]).tolist())


def test_sharded_build_from_files(tmp_path):
    from ivfadc_tpu.parallel.mesh import make_mesh
    from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex

    data = _clustered(1500, 16, seed=13)
    p = str(tmp_path / "base.fvecs")
    write_fvecs(p, data)
    strm = ShardedIVFADCIndex.build_from_files(
        p, make_mesh(n_shards=8), chunk_rows=400, kc=16, k=32, m=4,
        seed=0, coarse_maxiter=6, quantization_maxiter=6, train_sample=1200)
    assert len(strm.index) == 1500
    ids, _ = strm.search_padded(data[33:34], 5, w=4)
    assert ids[0][0] == 33


# ------------------------------------------------------- review regressions

def test_streaming_rejects_non_2d_chunk_on_pass2():
    # with train_data given, pass 1 is skipped — pass 2 must still raise
    # the clear AssertionError, not an IndexError
    data = _clustered(600, 8, seed=20)
    with pytest.raises(AssertionError, match="2-D"):
        IVFADCIndex.build_streaming(
            [data[:300], data[300].ravel()], train_data=data,
            kc=4, k=16, m=2)


def test_streaming_kc_above_train_sample_clear_error():
    data = _clustered(800, 8, seed=21)
    with pytest.raises(AssertionError, match="kc=64.*train_sample"):
        IVFADCIndex.build_streaming(_chunks(data, 200), kc=64, k=16, m=2,
                                    train_sample=32)


def test_streaming_capacity_law_fails_before_training():
    # 300 points don't fit uint8 ids — must fail right after pass 1 (the
    # error is decidable from `seen`), recorded by the absence of any
    # training phase in the raised path (we just pin the fast error here)
    data = _clustered(300, 8, seed=22)
    with pytest.raises(AssertionError, match="uint8|index bits|bits"):
        IVFADCIndex.build_streaming(_chunks(data, 100), kc=4, k=16, m=2,
                                    index_dtype="uint8", train_sample=128)


def test_vecs_chunks_path_generator_and_empty(tmp_path):
    data = _clustered(100, 6, seed=23)
    p = str(tmp_path / "g.fvecs")
    write_fvecs(p, data)
    ch = VecsChunks(iter([p]), chunk_rows=64)      # generator of paths
    np.testing.assert_array_equal(np.concatenate(list(ch)), data)
    with pytest.raises(ValueError, match="no input files"):
        VecsChunks(iter([]))
