"""Shard-aware persistence: one payload file per shard + a manifest.

The reference serializes the whole index into one file
(/root/reference/src/persistency.jl:1-305); at multi-host scale the full
payload cannot round-trip through one process, so a sharded index saves as a
DIRECTORY (SURVEY §5 plan: "shard-aware save (one file per host)"):

    manifest.json    — format version, config, dims, shard roster
    common.npz       — centroids, codebooks, rotation, two-level arrays,
                       global cell layout (tiny, replicated state)
    shard_00000.npz  — shard 0's CSR payload: per-shard offsets/sizes +
    ...                PQ codes + ids (compact codes, NOT the decoded cache —
                       caches are rebuilt on device at load)

Each process writes only the shard blocks it actually holds
(`addressable_shards`), so a multi-host save needs no cross-host traffic;
`load_sharded_index` restores the serving view onto a mesh and rebuilds the
decoded scan caches device-side. Like the single-index format, the header is
plain JSON — no code execution on load (deliberate fix of the reference's
`eval`-the-type-name pattern, /root/reference/src/persistency.jl:86-92).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import numpy as np

FORMAT_VERSION = 2   # v2: per-shard offsets/sizes moved into the shard
                     # files (a multi-host process owns only its shards'
                     # layout; v1 kept them replicated in common.npz)

# wide-id dead-slot sentinel (mirrors parallel.sharded.WIDE_NO_ID; kept as
# a literal to avoid an import cycle)
_WIDE_NO_ID = np.uint64(0xFFFFFFFFFFFFFFFF)


def _local_shard_blocks(arr, owned_only: bool = False) -> Dict[int, np.ndarray]:
    """shard-id -> this process's copy of that shard's block (leading shard
    axis stripped). Replicas (data-axis copies) dedup to one entry.

    owned_only: keep only shards whose replica 0 is local — under a real
    multi-process runtime every data-axis replica of a shard is addressable
    from its process, and without this filter each process would write every
    shard file (racy concurrent writes of identical content). replica 0
    designates exactly one owner process per shard."""
    out: Dict[int, np.ndarray] = {}
    for sh in arr.addressable_shards:
        if owned_only and sh.replica_id != 0:
            continue
        idx = sh.index[0]
        s = 0 if idx == slice(None) else int(idx.start or 0)
        if s not in out:
            out[s] = np.asarray(sh.data)[0]
    return out


def save_sharded_index(path: str, sidx) -> None:
    """Save a ShardedIVFADCIndex as a directory (see module docstring)."""
    from ivfadc_tpu.models.coarse import TwoLevelCoarseQuantizer

    os.makedirs(path, exist_ok=True)
    base = sidx.index
    meta = {
        "format_version": FORMAT_VERSION,
        "config": base.config.to_dict(),
        "dim": base.dim,
        "data_dtype": np.dtype(base.data_dtype).name,
        "coarse_kind": base.coarse.kind,
        "quantizer_method": base.quantizer.method,
        "n_shards": sidx.n_shards,
        "window": int(sidx.window),
        "align": int(sidx.align),
        "max_cap": int(sidx.max_cap),
        "n": len(base),
        # wide-id mode: the shard files' id payload is the uint64
        # slot -> global translation (device slot indices are derived
        # state and rebuilt on load)
        "wide_ids": bool(getattr(sidx, "wide_ids", False)),
    }
    common = {
        "centroids": np.asarray(base.coarse.centroids),
        "codebooks": np.asarray(base.quantizer.codebooks),
        "rotation": np.asarray(base.quantizer.rotation),
        "global_offsets": base.store.offsets,
        "global_caps": base.store.caps,
        "global_sizes": base.store.sizes,
    }
    if isinstance(base.coarse, TwoLevelCoarseQuantizer):
        meta["n_probe_groups"] = base.coarse.n_probe_groups
        common["group_centers"] = np.asarray(base.coarse.group_centers)
        common["group_members"] = np.asarray(base.coarse.members)
    # replicated metadata: EVERY process writes it (per-host storage needs
    # each directory complete), via write-temp + atomic rename so identical
    # concurrent writers on a shared filesystem can't tear the file
    pidx = jax.process_index()
    tmp = os.path.join(path, f".manifest.json.p{pidx}")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    tmp = os.path.join(path, f".common.npz.p{pidx}")
    with open(tmp, "wb") as f:
        np.savez(f, **common)
    os.replace(tmp, os.path.join(path, "common.npz"))
    code_blocks = _local_shard_blocks(sidx.shard_pq_codes, owned_only=True)
    if meta["wide_ids"]:
        # single-controller (wide mode is gated to one process): every
        # shard's translation row is local host state
        id_blocks = {s: sidx._trans[s] for s in range(sidx.n_shards)}
    else:
        id_blocks = _local_shard_blocks(sidx.arrays["ids"], owned_only=True)
    off_blocks = _local_shard_blocks(sidx.arrays["offsets"], owned_only=True)
    size_blocks = _local_shard_blocks(sidx.arrays["sizes"], owned_only=True)
    for s, codes in code_blocks.items():
        # same temp + rename discipline as the manifest/common writers:
        # a crash mid-write must not tear an existing shard snapshot
        tmp = os.path.join(path, f".shard_{s:05d}.npz.p{pidx}")
        with open(tmp, "wb") as f:
            np.savez(f, codes=codes, ids=id_blocks[s],
                     offsets=off_blocks[s], sizes=size_blocks[s])
        os.replace(tmp, os.path.join(path, f"shard_{s:05d}.npz"))


def _load_header(path: str):
    """Parse manifest + common.npz into (meta, config, coarse, quantizer,
    glayout, v1_shard_layout-or-None). Shared by every restore path."""
    import jax.numpy as jnp

    from ivfadc_tpu.config import IVFADCConfig
    from ivfadc_tpu.models.coarse import (NaiveCoarseQuantizer,
                                          TwoLevelCoarseQuantizer)
    from ivfadc_tpu.ops.metrics import get_metric
    from ivfadc_tpu.ops.pq import ProductQuantizer

    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    if meta["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"sharded index format v{meta['format_version']} is newer than "
            f"this library supports (v{FORMAT_VERSION})")
    config = IVFADCConfig.from_dict(meta["config"])
    cmetric = get_metric(config.coarse_metric)
    with np.load(os.path.join(path, "common.npz")) as z:
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
        glayout = dict(offsets=z["global_offsets"].copy(),
                       caps=z["global_caps"].copy(),
                       sizes=z["global_sizes"].copy())
        v1_layout = None
        if meta["format_version"] < 2:   # v1 kept the layout replicated
            v1_layout = (z["shard_offsets"].copy(), z["shard_sizes"].copy())
    return meta, config, coarse, quantizer, glayout, v1_layout


def _read_shard_files(path: str, S: int, needed, v1_layout):
    """Read shard payload files. `needed` is the set of old-shard indices this
    process must have (missing ones raise); other missing files yield None.
    Returns (codes, ids, offsets, sizes) lists of per-shard arrays."""
    codes, ids = [None] * S, [None] * S
    offs, sizs = [None] * S, [None] * S
    for s in range(S):
        fp = os.path.join(path, f"shard_{s:05d}.npz")
        if not os.path.exists(fp):
            if s in needed:
                raise FileNotFoundError(
                    f"shard {s} is required by process "
                    f"{jax.process_index()} but {fp} is missing")
            continue
        with np.load(fp) as z:
            codes[s] = z["codes"].copy()
            ids[s] = z["ids"].copy()
            if v1_layout is None:
                offs[s] = z["offsets"].copy()
                sizs[s] = z["sizes"].copy()
    if v1_layout is not None:
        for s in range(S):
            offs[s] = v1_layout[0][s]
            sizs[s] = v1_layout[1][s]
    return codes, ids, offs, sizs


def _addressable_shards(mesh, S: int):
    from ivfadc_tpu.parallel.mesh import SHARD_AXIS
    local = set(jax.local_devices())
    mesh_dev = np.asarray(mesh.devices)
    shard_dim = list(mesh.axis_names).index(SHARD_AXIS)
    return {
        s for s in range(S)
        if any(d in local for d in np.moveaxis(mesh_dev, shard_dim, 0)[s].flat)
    }


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shard_layout(sizes: np.ndarray, S: int, align: int):
    """partition_store's deterministic per-shard CSR layout from the global
    cell sizes (cells dealt c -> c % S; owner-only capacity). Process-
    invariant — every host derives the identical layout from the replicated
    (kc,) histogram, which is what makes reshard-on-load multi-host-safe."""
    kc = len(sizes)
    cells = np.arange(kc)
    owners = cells % S
    sizes_per = np.zeros((S, kc), np.int64)
    sizes_per[owners, cells] = sizes
    owner_mask = np.zeros((S, kc), bool)
    owner_mask[owners, cells] = True
    caps_per = np.where(
        owner_mask,
        np.maximum(align, ((sizes_per + 8 + align - 1) // align) * align), 0)
    offsets_per = np.zeros((S, kc), np.int64)
    np.cumsum(caps_per[:, :-1], axis=1, out=offsets_per[:, 1:])
    cap_shard = _round_up(int((offsets_per[:, -1] + caps_per[:, -1]).max()),
                          128)
    window = _round_up(max(1, int(sizes_per.max(initial=0))), 128)
    return offsets_per, sizes_per, caps_per, cap_shard, window


def _row_moves(sizes: np.ndarray):
    """(cell_rep, within) for every live row, in cell order — the shared
    gather/scatter index math for consolidation and resharding."""
    sz = np.asarray(sizes, np.int64)
    tot = int(sz.sum())
    cell_rep = np.repeat(np.arange(len(sz)), sz)
    within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(sz) - sz, sz)
    return cell_rep, within


def consolidate_sharded_index(path: str):
    """Load a `save_sharded_index` directory back into a plain single-file
    `IVFADCIndex` (payload on host, full dynamic-op support). The inverse of
    sharding: matches the reference loader's environment-independence
    (/root/reference/src/persistency.jl:82-134 restores anywhere). Requires
    the whole payload to fit this host — Deep1B-scale directories should
    reshard onto a mesh instead (`load_sharded_index` with any shard count).
    """
    from ivfadc_tpu.models.index import IVFADCIndex
    from ivfadc_tpu.models.inverted import PostingStore

    meta, config, coarse, quantizer, glayout, v1_layout = _load_header(path)
    S = meta["n_shards"]
    codes_b, ids_b, offs_b, _ = _read_shard_files(path, S, set(range(S)),
                                                  v1_layout)
    kc = config.kc
    g_off, g_caps, g_sizes = (glayout["offsets"], glayout["caps"],
                              glayout["sizes"])
    # NOT g_off[-1] + g_caps[-1]: a grown cell relocates to the END of the
    # flat arrays, making the layout non-monotone (PostingStore.total_cap
    # uses the same max for the same reason, models/inverted.py)
    total_cap = int((g_off + g_caps).max()) if kc else 0
    m = codes_b[0].shape[1]
    codes = np.zeros((total_cap, m), codes_b[0].dtype)
    ids = np.full(total_cap, -1, np.int64)
    cell_rep, within = _row_moves(g_sizes)
    if len(cell_rep):
        old_shard = cell_rep % S
        old_off = np.stack(offs_b).astype(np.int64)[old_shard, cell_rep]
        src = old_off + within
        dst = g_off[cell_rep] + within
        # per-old-shard gather (blocks can be large; avoid an (S, cap) stack)
        for s in range(S):
            msk = old_shard == s
            if msk.any():
                codes[dst[msk]] = codes_b[s][src[msk]]
                # wide dirs store uint64 translation rows; global ids are
                # < 2^63 so the int64 host id array holds them exactly
                ids[dst[msk]] = ids_b[s][src[msk]].astype(np.int64)
    store = PostingStore(kc, config.m, codes.dtype,
                         offsets=g_off.astype(np.int64),
                         caps=g_caps.astype(np.int64),
                         sizes=g_sizes.astype(np.int64),
                         codes=codes, ids=ids)
    return IVFADCIndex(config, coarse, quantizer, store,
                       np.dtype(meta["data_dtype"]), int(meta["dim"]))


def consolidate_sharded_to_file(path: str, out_path: str,
                                chunk_rows: int = 1 << 20) -> None:
    """Out-of-core consolidation: fold a `save_sharded_index` directory into
    a single-file index (`utils.persistence` format) WITHOUT ever holding
    the full payload in memory (round-4 verdict item 5-weak/next-7: the
    in-memory `consolidate_sharded_index` needs the whole payload's RAM,
    which a Deep1B-scale directory does not fit).

    The global CSR layout is known up front from the replicated histogram,
    so the flat code/id arrays are materialized as on-disk memmaps and each
    shard file streams its rows into place ONE SHARD AT A TIME (peak memory
    = one shard's payload + memmap page cache). The memmap .npy files are
    then streamed into the output .npz (ZIP_STORED members, chunked copy),
    yielding a file `load_ivfadc_index` reads exactly like a
    `save_ivfadc_index` product. Matches the reference loader's
    environment-independence (/root/reference/src/persistency.jl:82-134)
    at scales the reference cannot reach.
    """
    import shutil
    import tempfile
    import zipfile

    from ivfadc_tpu.models.coarse import TwoLevelCoarseQuantizer
    from ivfadc_tpu.utils.persistence import FORMAT_VERSION as SINGLE_FMT

    meta, config, coarse, quantizer, glayout, v1_layout = _load_header(path)
    S = meta["n_shards"]
    kc = config.kc
    g_off = np.asarray(glayout["offsets"], np.int64)
    g_caps = np.asarray(glayout["caps"], np.int64)
    g_sizes = np.asarray(glayout["sizes"], np.int64)
    total_cap = int((g_off + g_caps).max()) if kc else 0
    m = config.m
    code_dtype = np.dtype(config.code_dtype)

    tmpdir = tempfile.mkdtemp(dir=os.path.dirname(
        os.path.abspath(out_path)) or ".")
    try:
        codes_mm = np.lib.format.open_memmap(
            os.path.join(tmpdir, "codes.npy"), mode="w+",
            dtype=code_dtype, shape=(total_cap, m))   # fresh pages are 0
        ids_mm = np.lib.format.open_memmap(
            os.path.join(tmpdir, "ids.npy"), mode="w+",
            dtype=np.int64, shape=(total_cap,))
        for s0 in range(0, total_cap, chunk_rows):
            ids_mm[s0:s0 + chunk_rows] = -1           # empty-slot sentinel
        # one shard at a time: cells owned by shard s stream into their
        # global extents (the same _row_moves math as the in-memory path)
        cells = np.arange(kc)
        for s in range(S):
            fp = os.path.join(path, f"shard_{s:05d}.npz")
            if not os.path.exists(fp):
                raise FileNotFoundError(
                    f"consolidation needs every shard file; {fp} is missing")
            with np.load(fp) as z:
                codes_s = z["codes"]
                ids_s = z["ids"]
                offs_s = z["offsets"] if v1_layout is None else v1_layout[0][s]
            own = cells[cells % S == s]
            sz_own = g_sizes[own]
            tot = int(sz_own.sum())
            if not tot:
                continue
            cell_rep_l, within = _row_moves(sz_own)
            cell_rep = own[cell_rep_l]
            src = np.asarray(offs_s, np.int64)[cell_rep] + within
            dst = g_off[cell_rep] + within
            # dst is ascending within each cell but cells interleave the
            # global array monotonically (own ascending + cumsum offsets),
            # so writes stream mostly sequentially through the memmap
            codes_mm[dst] = codes_s[src]
            ids_mm[dst] = ids_s[src].astype(np.int64)
        codes_mm.flush()
        ids_mm.flush()
        del codes_mm, ids_mm

        single_meta = {
            "format_version": SINGLE_FMT,
            "config": config.to_dict(),
            "dim": int(meta["dim"]),
            "data_dtype": meta["data_dtype"],
            "coarse_kind": meta["coarse_kind"],
            "quantizer_method": meta["quantizer_method"],
        }
        small = {
            "centroids": np.asarray(coarse.centroids),
            "codebooks": np.asarray(quantizer.codebooks),
            "rotation": np.asarray(quantizer.rotation),
            "offsets": g_off,
            "caps": g_caps,
            "sizes": g_sizes,
        }
        if isinstance(coarse, TwoLevelCoarseQuantizer):
            single_meta["n_probe_groups"] = coarse.n_probe_groups
            small["group_centers"] = np.asarray(coarse.group_centers)
            small["group_members"] = np.asarray(coarse.members)
        small["__meta__"] = np.frombuffer(
            json.dumps(single_meta).encode("utf-8"), dtype=np.uint8)
        # (wide dirs: the uint64 translation values are < 2^63 and fit the
        # int64 host id array exactly — same contract as the in-memory path)

        tmp_out = os.path.join(tmpdir, "out.npz")
        with zipfile.ZipFile(tmp_out, "w",
                             compression=zipfile.ZIP_STORED,
                             allowZip64=True) as zf:
            import io
            for name, arr in small.items():
                buf = io.BytesIO()
                np.save(buf, np.asarray(arr))
                zf.writestr(f"{name}.npy", buf.getvalue())
            # stream the big memmap members straight from disk
            for name in ("codes", "ids"):
                src_fp = os.path.join(tmpdir, f"{name}.npy")
                with zf.open(f"{name}.npy", "w", force_zip64=True) as dst_f, \
                        open(src_fp, "rb") as src_f:
                    shutil.copyfileobj(src_f, dst_f, length=1 << 24)
        os.replace(tmp_out, out_path)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _reshard_parts(path: str, meta, config, glayout, v1_layout, mesh):
    """Re-deal a saved S-shard payload onto an S'-shard mesh (S' != S):
    cell c moves from old shard c % S to new shard c % S'. The new layout is
    derived process-invariantly from the replicated global histogram; each
    process materializes rows only for new shards its devices address
    (others zero-fill, exactly like the S' == S multi-host restore)."""
    from ivfadc_tpu.parallel.mesh import SHARD_AXIS

    S = meta["n_shards"]
    S_new = mesh.shape[SHARD_AXIS]
    kc = config.kc
    g_sizes = np.asarray(glayout["sizes"], np.int64)
    align = int(meta["align"])
    offsets_per, sizes_per, caps_per, cap_shard, window = _shard_layout(
        g_sizes, S_new, align)
    addressable = _addressable_shards(mesh, S_new)
    # old shard files needed = owners of cells whose NEW shard is addressable
    cells = np.arange(kc)
    needed = set((cells[np.isin(cells % S_new, list(addressable))] % S)
                 .tolist())
    codes_b, ids_b, offs_b, _ = _read_shard_files(path, S, needed, v1_layout)
    any_loaded = next((s for s in range(S) if codes_b[s] is not None), None)
    if any_loaded is None:
        raise FileNotFoundError(f"no shard files found in {path}")
    m = codes_b[any_loaded].shape[1]
    guard = config.scan_chunk + 128
    cap_pad = _round_up(cap_shard + guard, 128)
    wide = bool(meta.get("wide_ids", False))
    new_codes = np.zeros((S_new, cap_pad, m), codes_b[any_loaded].dtype)
    new_ids = np.full((S_new, cap_pad), -1, np.int32)
    new_trans = np.full((S_new, cap_pad), _WIDE_NO_ID, np.uint64) \
        if wide else None
    cell_rep, within = _row_moves(g_sizes)
    if len(cell_rep):
        old_shard = cell_rep % S
        new_shard = (cell_rep % S_new).astype(np.int64)
        offs_full = np.zeros((S, kc), np.int64)
        for s in range(S):
            if offs_b[s] is not None:
                offs_full[s] = offs_b[s]
        src = offs_full[old_shard, cell_rep] + within
        dst = offsets_per[new_shard, cell_rep] + within
        new_addr = np.isin(new_shard, sorted(addressable))
        for s in range(S):
            msk = (old_shard == s) & new_addr
            if msk.any():
                new_codes[new_shard[msk], dst[msk]] = codes_b[s][src[msk]]
                if wide:
                    # file ids are the uint64 translation: it moves with
                    # the rows; device ids become the new slot indices
                    new_trans[new_shard[msk], dst[msk]] = \
                        ids_b[s][src[msk]].astype(np.uint64)
                    new_ids[new_shard[msk], dst[msk]] = \
                        dst[msk].astype(np.int32)
                else:
                    new_ids[new_shard[msk], dst[msk]] = ids_b[s][src[msk]]
    out = dict(
        offsets=offsets_per.astype(np.int32),
        sizes=sizes_per.astype(np.int32),
        # exact per-shard caps: _wire would otherwise recover them from the
        # offsets diff, which inflates cell kc-1's cap up to the padded
        # array tail in its owner shard (benign — no trailing cell shares
        # its boundary — but exact is strictly tighter for regrow checks)
        caps=caps_per.astype(np.int64),
        pq_codes=new_codes,
        ids=new_ids,
        window=window,
        align=align,
        max_cap=int(caps_per.max(initial=0)),
    )
    if wide:
        out["trans"] = new_trans
    return out


def load_sharded_index(path: str, mesh=None):
    """Restore a sharded serving view from a `save_sharded_index` directory.

    Mesh-portable: the mesh's shard count may DIFFER from the count the
    directory was saved with — cells are re-dealt (c -> c % S') on load, so a
    checkpoint built on 8 shards serves on 4 or 16 without a rebuild
    (environment-independent restore, like the reference's loader,
    /root/reference/src/persistency.jl:82-134). Decoded scan caches are
    rebuilt on device (derived state). Single-process restore loads every
    shard file; a multi-host restore reads only the files covering the
    shards its devices address. To go back to a plain single-file index, use
    `consolidate_sharded_index`.
    """
    from ivfadc_tpu.parallel.mesh import SHARD_AXIS, make_mesh
    from ivfadc_tpu.parallel.sharded import ShardedIVFADCIndex

    meta, config, coarse, quantizer, glayout, v1_layout = _load_header(path)
    mesh = mesh if mesh is not None else make_mesh(n_data=1)
    S = meta["n_shards"]
    wide = bool(meta.get("wide_ids", False))
    if mesh.shape[SHARD_AXIS] != S:
        parts = _reshard_parts(path, meta, config, glayout, v1_layout, mesh)
    else:
        addressable = _addressable_shards(mesh, S)
        codes_b, ids_b, offs_b, sizs_b = _read_shard_files(
            path, S, addressable, v1_layout)
        ref = next(i for i in range(S) if codes_b[i] is not None)
        for s in range(S):          # zero-fill non-addressable shards' rows
            if codes_b[s] is None:
                codes_b[s] = np.zeros_like(codes_b[ref])
                ids_b[s] = np.full_like(ids_b[ref],
                                        _WIDE_NO_ID if wide else 0)
                offs_b[s] = np.zeros_like(offs_b[ref])
                sizs_b[s] = np.zeros_like(sizs_b[ref])
        shard_offsets = np.stack(offs_b)
        shard_sizes = np.stack(sizs_b)
        parts = dict(
            offsets=shard_offsets,
            sizes=shard_sizes,
            pq_codes=np.stack(codes_b),
            window=int(meta["window"]),
            align=int(meta["align"]),
            max_cap=int(meta["max_cap"]),
        )
        if wide:
            # shard files carry the uint64 translation; the device slot
            # pattern is derived state
            trans = np.stack(ids_b).astype(np.uint64)
            cap_pad = trans.shape[1]
            parts["trans"] = trans
            parts["ids"] = np.where(
                trans != _WIDE_NO_ID,
                np.arange(cap_pad, dtype=np.int64)[None, :],
                -1).astype(np.int32)
        else:
            parts["ids"] = np.stack(ids_b)
    base = ShardedIVFADCIndex._meta_base(config, coarse, quantizer, glayout,
                                         int(meta["dim"]))
    return ShardedIVFADCIndex._assemble(base, mesh, parts)
