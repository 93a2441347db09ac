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
