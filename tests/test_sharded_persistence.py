"""Shard-aware persistence + multi-host bootstrap (VERDICT r1 item 2).

Contract: a sharded index saves as a directory (manifest + common.npz + one
payload npz per shard; each process writes only its addressable shards) and
restores onto a mesh with IDENTICAL search results — for BOTH construction
paths (distributed build and partition-of-a-host-built-index). Reference
analogue: whole-index binary round-trip at
/root/reference/src/persistency.jl:1-305 / test/persistency.jl:13-29.
"""

import os

import numpy as np
import pytest

from ivfadc_tpu import IVFADCIndex
from ivfadc_tpu.parallel.mesh import make_mesh
from ivfadc_tpu.parallel.persistence import (load_sharded_index,
                                             save_sharded_index)
from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex


def _clustered(n, d, kc_true, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(kc_true, d).astype(np.float32) * 5
    return np.concatenate(
        [c + rng.randn(n // kc_true, d).astype(np.float32) for c in centers])


def _assert_same_search(a, b, queries, k=10, w=4):
    ids_a, d_a = a.search_padded(queries, k, w=w)
    ids_b, d_b = b.search_padded(queries, k, w=w)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("scan_mode", ["lut", "dense"])
def test_roundtrip_distributed_build(tmp_path, scan_mode):
    data = _clustered(2048, 16, 8, seed=1)
    mesh = make_mesh(n_shards=8)
    sidx = ShardedIVFADCIndex.build(data, mesh, kc=32, k=16, m=4,
                                    scan_mode=scan_mode, seed=0)
    path = str(tmp_path / "sharded_idx")
    save_sharded_index(path, sidx)
    assert os.path.exists(os.path.join(path, "manifest.json"))
    assert len([f for f in os.listdir(path)
                if f.startswith("shard_")]) == 8
    restored = load_sharded_index(path, mesh)
    assert len(restored.index) == len(data)
    q = data[np.random.RandomState(3).choice(len(data), 24, replace=False)]
    _assert_same_search(sidx, restored, q)


@pytest.mark.parametrize("scan_mode", ["lut", "dense"])
def test_roundtrip_partitioned_host_index(tmp_path, scan_mode):
    """The partition-of-a-host-built-index path saves/loads identically."""
    data = _clustered(1536, 12, 6, seed=2)
    idx = IVFADCIndex.build(data, kc=24, k=16, m=3, scan_mode=scan_mode,
                            seed=0)
    mesh = make_mesh(n_shards=8)
    sidx = ShardedIVFADCIndex(idx, mesh)
    path = str(tmp_path / "part_idx")
    save_sharded_index(path, sidx)
    restored = load_sharded_index(path, mesh)
    q = data[:24]
    _assert_same_search(sidx, restored, q)
    # and the restored (payload-free base) view matches the original
    # single-host index's results too
    ids_r, _ = restored.search_padded(q, 10, w=4)
    ids_h, _ = idx.search_padded(q, 10, w=4)
    np.testing.assert_array_equal(ids_r, ids_h)


def test_roundtrip_two_level_coarse(tmp_path):
    data = _clustered(4096, 8, 16, seed=4)
    mesh = make_mesh(n_shards=8)
    sidx = ShardedIVFADCIndex.build(data, mesh, kc=256, k=16, m=2,
                                    coarse_quantizer="hnsw", seed=0)
    path = str(tmp_path / "twolevel_idx")
    save_sharded_index(path, sidx)
    restored = load_sharded_index(path, mesh)
    q = data[:16]
    _assert_same_search(sidx, restored, q, k=5, w=8)


def test_mesh_size_mismatch_raises(tmp_path):
    data = _clustered(512, 8, 4, seed=5)
    mesh = make_mesh(n_shards=8)
    sidx = ShardedIVFADCIndex.build(data, mesh, kc=16, k=16, m=2, seed=0)
    path = str(tmp_path / "mismatch_idx")
    save_sharded_index(path, sidx)
    with pytest.raises(ValueError, match="8 shards"):
        load_sharded_index(path, make_mesh(n_shards=4, n_data=2))


def test_newer_format_version_raises(tmp_path):
    import json
    data = _clustered(512, 8, 4, seed=6)
    mesh = make_mesh(n_shards=8)
    sidx = ShardedIVFADCIndex.build(data, mesh, kc=16, k=16, m=2, seed=0)
    path = str(tmp_path / "ver_idx")
    save_sharded_index(path, sidx)
    mf = os.path.join(path, "manifest.json")
    with open(mf) as f:
        meta = json.load(f)
    meta["format_version"] = 999
    with open(mf, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="newer"):
        load_sharded_index(path, mesh)


def test_bootstrap_noop_single_process(monkeypatch):
    """No cluster env, no args -> no-op (library users on one host never
    touch jax.distributed)."""
    from ivfadc_tpu.parallel import bootstrap
    for v in bootstrap._AUTO_DETECT_VARS + (
            "IVFADC_COORDINATOR", "IVFADC_NUM_PROCESSES"):
        monkeypatch.delenv(v, raising=False)
    monkeypatch.setattr(bootstrap, "_INITIALIZED", False)
    assert bootstrap.initialize_cluster() is False
    info = bootstrap.process_info()
    assert info["process_count"] == 1
    assert info["initialized"] is False


def test_bootstrap_env_resolution(monkeypatch):
    """IVFADC_* env vars are resolved and handed to
    jax.distributed.initialize (call intercepted — no real cluster here)."""
    from ivfadc_tpu.parallel import bootstrap
    import jax
    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(bootstrap, "_INITIALIZED", False)
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("IVFADC_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("IVFADC_NUM_PROCESSES", "4")
    monkeypatch.setenv("IVFADC_PROCESS_ID", "2")
    monkeypatch.setenv("IVFADC_LOCAL_DEVICE_IDS", "0,1")
    assert bootstrap.initialize_cluster() is True
    assert calls == dict(coordinator_address="10.0.0.1:1234",
                         num_processes=4, process_id=2,
                         local_device_ids=[0, 1])
    # idempotent
    calls.clear()
    assert bootstrap.initialize_cluster() is True
    assert calls == {}
    monkeypatch.setattr(bootstrap, "_INITIALIZED", False)
