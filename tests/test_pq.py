"""M0 unit tests: product quantizer train/encode/decode + OPQ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivfadc_tpu.ops import pq as pq_ops
from ivfadc_tpu.ops.metrics import SQEUCLIDEAN


def _data(n=400, d=16, seed=0):
    return np.random.RandomState(seed).randn(n, d).astype(np.float32)


def test_pq_shapes_and_code_dtype():
    x = _data()
    q = pq_ops.train_quantizer(jax.random.PRNGKey(0), jnp.asarray(x),
                               m=4, k=16, maxiter=10)
    assert q.codebooks.shape == (4, 16, 4)
    assert np.allclose(np.asarray(q.rotation), np.eye(16))
    codes = pq_ops.encode(q, jnp.asarray(x))
    assert codes.shape == (400, 4)
    assert codes.dtype == jnp.uint8          # k=16 -> uint8 (TYPE_TO_BITS law)
    assert int(jnp.max(codes)) < 16


def test_code_dtype_scales_with_k():
    from ivfadc_tpu.config import code_dtype_for_k
    assert code_dtype_for_k(256) == "uint8"
    assert code_dtype_for_k(257) == "uint16"
    assert code_dtype_for_k(70000) == "uint32"


def test_pq_encode_matches_numpy_oracle():
    x = _data(200, 8, seed=1)
    q = pq_ops.train_quantizer(jax.random.PRNGKey(1), jnp.asarray(x),
                               m=2, k=8, maxiter=10)
    codes = np.asarray(pq_ops.encode(q, jnp.asarray(x)))
    cb = np.asarray(q.codebooks)            # (2, 8, 4)
    xs = x.reshape(200, 2, 4)
    for j in range(2):
        d = ((xs[:, j, None, :] - cb[j][None]) ** 2).sum(-1)
        assert np.array_equal(codes[:, j], d.argmin(1))


def test_pq_decode_reduces_error_vs_zero():
    x = _data(seed=2)
    q = pq_ops.train_quantizer(jax.random.PRNGKey(2), jnp.asarray(x),
                               m=4, k=32, maxiter=15)
    rec = np.asarray(pq_ops.decode(q, pq_ops.encode(q, jnp.asarray(x))))
    rel = ((rec - x) ** 2).sum() / (x ** 2).sum()
    assert rel < 0.25


def test_opq_rotation_is_orthogonal_and_helps_on_correlated_data():
    rng = np.random.RandomState(3)
    # strongly correlated dims: OPQ's rotation should decorrelate subspaces
    z = rng.randn(1000, 4).astype(np.float32)
    mix = rng.randn(4, 16).astype(np.float32)
    x = z @ mix
    key = jax.random.PRNGKey(3)
    qpq = pq_ops.train_quantizer(key, jnp.asarray(x), m=4, k=16,
                                 method="pq", maxiter=15)
    qopq = pq_ops.train_quantizer(key, jnp.asarray(x), m=4, k=16,
                                  method="opq", maxiter=15, opq_iters=5)
    r = np.asarray(qopq.rotation)
    assert np.abs(r @ r.T - np.eye(16)).max() < 1e-4
    err_pq = ((np.asarray(pq_ops.decode(qpq, pq_ops.encode(qpq, jnp.asarray(x)))) - x) ** 2).sum()
    err_opq = ((np.asarray(pq_ops.decode(qopq, pq_ops.encode(qopq, jnp.asarray(x)))) - x) ** 2).sum()
    assert err_opq < err_pq


def test_opq_decode_applies_inverse_rotation():
    # documents the deliberate fix of the reference's _decode_point bug
    # (/root/reference/src/utils.jl:71-81 ignores .rot — SURVEY §2.3)
    x = _data(300, 8, seed=4)
    q = pq_ops.train_quantizer(jax.random.PRNGKey(4), jnp.asarray(x),
                               m=2, k=32, method="opq", maxiter=10)
    codes = pq_ops.encode(q, jnp.asarray(x))
    rec = np.asarray(pq_ops.decode(q, codes))
    rec_norot = np.asarray(pq_ops._reconstruct_rotated(q.codebooks, codes))
    err_fixed = ((rec - x) ** 2).sum()
    err_buggy = ((rec_norot - x) ** 2).sum()
    assert err_fixed <= err_buggy


def test_m_not_dividing_d_pads():
    # parity with the reference's ragged rowrange splits: trains at
    # m*ceil(d/m) with zero-padded columns instead of raising
    q = pq_ops.train_quantizer(jax.random.PRNGKey(0),
                               jnp.asarray(_data(50, 10)), m=3, k=4)
    assert q.d == 12 and q.dsub == 4


def test_ragged_subspaces_m_not_dividing_d():
    """The reference allows m that does not divide d (ragged rowrange
    splits); here the quantizer zero-pads to m*ceil(d/m). Full build ->
    search -> dynamic -> persistence journey at d=10, m=3."""
    from ivfadc_tpu import IVFADCIndex
    rng = np.random.RandomState(0)
    data = rng.rand(500, 10).astype(np.float32)
    for method in ("pq", "opq"):
        idx = IVFADCIndex.build(data, kc=20, k=16, m=3, seed=1,
                                quantization_method=method,
                                coarse_maxiter=8, quantization_maxiter=8)
        assert idx.quantizer.d == 12 and idx.quantizer.dsub == 4
        ids, dists = idx.search(data[7], 3, w=5)
        assert ids[0] == 7, (method, ids)
        idx.push(data[0])
        v = idx.pop()
        assert v.shape == (10,)
        import tempfile, os
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
            path = f.name
        try:
            idx.save(path)
            idx2 = IVFADCIndex.load(path)
            a, _ = idx.search(data[7], 3, w=5)
            b, _ = idx2.search(data[7], 3, w=5)
            assert (a == b).all()
        finally:
            os.unlink(path)


def test_encode_empty_batch():
    """encode of zero residuals returns an empty (0, m) code array (the
    push_batch no-op path), matching decode_rotated's empty guard."""
    import jax.numpy as jnp
    from ivfadc_tpu.ops import pq as pq_ops
    rng = np.random.RandomState(0)
    pq = pq_ops.train_quantizer(jax.random.PRNGKey(0),
                                jnp.asarray(rng.randn(200, 16),
                                            jnp.float32), m=4, k=8)
    codes = pq_ops.encode(pq, jnp.zeros((0, 16), jnp.float32))
    assert codes.shape == (0, 4)


def test_sequential_trainer_matches_vmap_path(monkeypatch):
    """Large inputs train per-subspace sequentially (HBM: the vmapped path
    needs a (m, n, dsub) transpose copy + a padded copy — OOMs 1M x 960 on
    a 16 GB chip). Same keys, same math -> codebooks must match the vmapped
    path bit-for-bit (both run the identical _kmeans_impl per subspace)."""
    x = _data(n=600, d=24, seed=3)
    q_vmap = pq_ops.train_quantizer(jax.random.PRNGKey(5), jnp.asarray(x),
                                    m=4, k=8, maxiter=6)
    monkeypatch.setattr(pq_ops, "_SEQ_TRAIN_BYTES", 0)  # force seq path
    q_seq = pq_ops.train_quantizer(jax.random.PRNGKey(5), jnp.asarray(x),
                                   m=4, k=8, maxiter=6)
    np.testing.assert_allclose(np.asarray(q_seq.codebooks),
                               np.asarray(q_vmap.codebooks), rtol=1e-5)
    c1 = pq_ops.encode(q_vmap, jnp.asarray(x))
    c2 = pq_ops.encode(q_seq, jnp.asarray(x))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_opq_sequential_path_still_orthogonal(monkeypatch):
    monkeypatch.setattr(pq_ops, "_SEQ_TRAIN_BYTES", 0)
    rng = np.random.RandomState(7)
    x = (rng.randn(300, 12) @ rng.randn(12, 12)).astype(np.float32)
    q = pq_ops.train_quantizer(jax.random.PRNGKey(1), jnp.asarray(x),
                               m=3, k=8, maxiter=6, method="opq",
                               opq_iters=2)
    r = np.asarray(q.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(12), atol=1e-4)
    codes = pq_ops.encode(q, jnp.asarray(x))
    rec = np.asarray(pq_ops.decode(q, codes))
    assert np.mean((rec - x) ** 2) < np.mean(x ** 2)


def test_encode_chunked_matches_full():
    x = _data(n=500, d=16, seed=9)
    q = pq_ops.train_quantizer(jax.random.PRNGKey(0), jnp.asarray(x),
                               m=4, k=16, maxiter=8)
    full = pq_ops._encode_chunked(q.codebooks, jnp.asarray(x), SQEUCLIDEAN,
                                  block=10**9)
    chunked = pq_ops._encode_chunked(q.codebooks, jnp.asarray(x), SQEUCLIDEAN,
                                     block=64)
    assert np.array_equal(np.asarray(full), np.asarray(chunked))
