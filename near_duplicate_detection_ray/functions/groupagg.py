"""Aggregation execution helpers.

Two scale-appropriate replacements for ``Dataset.groupby().aggregate(...)``
(whose hash-shuffle implementation spins up aggregator actors per execution —
pure overhead when partial aggregation can collapse the data first):

- ``lowcard_groupagg``: combiner pattern for LOW-cardinality keys — vectorized
  Arrow ``group_by`` partials per block (map-side combine), then one tiny
  final combine over the collected partials (#blocks x #groups rows).  This is
  the guide's "pre-aggregate inside map_batches" pattern.
- ``highcard_groupagg``: for HIGH-cardinality keys (no reduction from
  combining) — one keyed hash-partition shuffle + block-local Arrow group_by
  (state/partitioning.py), no sort and no per-group Python.

Both return a pyarrow-backed Ray Dataset.
"""

from __future__ import annotations

import pyarrow as pa

from ..state.partitioning import key_partitioned

_REAGG = {"sum": "sum", "count": "sum", "count_all": "sum", "min": "min", "max": "max"}


def _agg_out_name(col, fn: str) -> str:
    return "count_all" if fn == "count_all" else f"{col}_{fn}"


def lowcard_groupagg(ds, keys: list[str], aggs: list[tuple], rename: dict[str, str]):
    """aggs: [(col | [], fn)] with fn in sum/count/count_all/min/max.
    ``rename`` maps the partial-agg output name (e.g. "l_quantity_sum") to the
    final column name.  Means: request the sum and count, divide afterwards.
    """
    import ray.data as rd

    parts_ds = ds.map_batches(
        lambda t: t.group_by(keys).aggregate(aggs), batch_format="pyarrow"
    )
    chunks = [
        b for b in parts_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not chunks:
        return rd.from_items([])
    partials = pa.concat_tables(chunks, promote_options="permissive")
    final_aggs = [
        (_agg_out_name(col, fn), _REAGG[fn]) for col, fn in aggs
    ]
    out = partials.group_by(keys).aggregate(final_aggs)
    # final names are f"{partial_name}_{reagg_fn}" -> rename to target names
    mapping = {}
    for col, fn in aggs:
        pname = _agg_out_name(col, fn)
        mapping[f"{pname}_{_REAGG[fn]}"] = rename.get(pname, pname)
    out = out.rename_columns([mapping.get(c, c) for c in out.column_names])
    return rd.from_arrow(out)


def highcard_groupagg(ds, keys: list[str], aggs: list[tuple], rename: dict[str, str],
                      num_partitions: int | None = None):
    """One keyed hash shuffle + block-local Arrow group_by; for keys whose
    cardinality is comparable to the row count (fingerprints, pair keys)."""

    def block(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            # schema-less shuffle remnant: nothing to derive a schema from
            return batch
        # NOTE: empty-but-typed blocks fall through — Arrow group_by on a
        # zero-row table yields the AGGREGATED schema, so every output block
        # agrees (returning the input unchanged emitted the pre-agg schema
        # and tripped Ray's "RefBundle with a different schema" anomaly)
        out = batch.group_by(keys).aggregate(aggs)
        mapping = {_agg_out_name(col, fn): rename.get(_agg_out_name(col, fn), _agg_out_name(col, fn))
                   for col, fn in aggs}
        return out.rename_columns([mapping.get(c, c) for c in out.column_names])

    return key_partitioned(ds, keys, num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def global_topk(ds, cols: list[str], descending: list[bool], k: int):
    """Global top-``k`` WITHOUT a global sort: every block emits only its own
    k best rows (a C-level pandas sort + head — bounded k rows out per
    block), then one final single-partition merge re-sorts the <= k x
    n_blocks survivors.  The all-to-all exchange a ``Dataset.sort(...).
    limit(k)`` plan pays on the full table shrinks to k rows per block —
    the difference between shuffling 100 TB and shuffling kilobytes.
    Output rows arrive globally sorted by ``cols``."""
    asc = [not d for d in descending]

    def block(df):
        if df.empty:
            return df
        return df.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    partials = ds.map_batches(block, batch_format="pandas")
    return partials.repartition(1).map_batches(
        block, batch_format="pandas", batch_size=None
    )
