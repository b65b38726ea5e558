"""Versioned index persistence.

Replaces the reference's custom binary format
(/root/reference/src/persistency.jl:1-305). Deliberate redesign (SURVEY §5):
the reference `eval`s type names read from the file header
(/root/reference/src/persistency.jl:86-92,137-144) — a deserialization-of-
types hazard. Here the header is a plain JSON dict of validated fields and
the payload is a standard `.npz` archive (named, typed, versioned arrays) —
no code execution on load, portable across hosts.

Round-trip contract (field-for-field equality) matches the reference's
persistence tests (/root/reference/test/persistency.jl:13-29): centroids,
codebooks, rotation, every cell's ids and codes, and the config all survive
exactly. The two-level coarse quantizer's grouping arrays are saved too
(the analogue of the reference serializing the full HNSW graph,
/root/reference/src/persistency.jl:207-241).
"""

from __future__ import annotations

import json
import os

import numpy as np

FORMAT_VERSION = 1


def save_index(path: str, index) -> None:
    from ivfadc_tpu.models.coarse import TwoLevelCoarseQuantizer

    meta = {
        "format_version": FORMAT_VERSION,
        "config": index.config.to_dict(),
        "dim": index.dim,
        "data_dtype": np.dtype(index.data_dtype).name,
        "coarse_kind": index.coarse.kind,
        "quantizer_method": index.quantizer.method,
    }
    arrays = {
        "centroids": np.asarray(index.coarse.centroids),
        "codebooks": np.asarray(index.quantizer.codebooks),
        "rotation": np.asarray(index.quantizer.rotation),
        "offsets": index.store.offsets,
        "caps": index.store.caps,
        "sizes": index.store.sizes,
        "codes": index.store.codes,
        "ids": index.store.ids,
    }
    if isinstance(index.coarse, TwoLevelCoarseQuantizer):
        meta["n_probe_groups"] = index.coarse.n_probe_groups
        arrays["group_centers"] = np.asarray(index.coarse.group_centers)
        arrays["group_members"] = np.asarray(index.coarse.members)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    # atomic write (temp + rename): persistence doubles as the checkpoint
    # layer (SURVEY §5), so a crash mid-save must not tear a good snapshot
    # (parity with the sharded writer, parallel/persistence.py)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_index(path: str):
    import jax.numpy as jnp

    from ivfadc_tpu.config import IVFADCConfig
    from ivfadc_tpu.models.coarse import (NaiveCoarseQuantizer,
                                          TwoLevelCoarseQuantizer)
    from ivfadc_tpu.models.index import IVFADCIndex
    from ivfadc_tpu.models.inverted import PostingStore
    from ivfadc_tpu.ops.metrics import get_metric
    from ivfadc_tpu.ops.pq import ProductQuantizer

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"index file format v{meta['format_version']} is newer than "
                f"this library supports (v{FORMAT_VERSION})")
        config = IVFADCConfig.from_dict(meta["config"])
        cmetric = get_metric(config.coarse_metric)
        centroids = jnp.asarray(z["centroids"])
        if meta["coarse_kind"] == "two_level":
            coarse = TwoLevelCoarseQuantizer.create(
                centroids, jnp.asarray(z["group_centers"]),
                jnp.asarray(z["group_members"]), cmetric,
                int(meta["n_probe_groups"]))
        else:
            coarse = NaiveCoarseQuantizer(centroids, cmetric)
        quantizer = ProductQuantizer(jnp.asarray(z["codebooks"]),
                                     jnp.asarray(z["rotation"]),
                                     meta["quantizer_method"])
        store = PostingStore(
            config.kc, config.m, z["codes"].dtype,
            offsets=z["offsets"].copy(), caps=z["caps"].copy(),
            sizes=z["sizes"].copy(), codes=z["codes"].copy(),
            ids=z["ids"].copy())
        return IVFADCIndex(config, coarse, quantizer, store,
                           np.dtype(meta["data_dtype"]), int(meta["dim"]))
