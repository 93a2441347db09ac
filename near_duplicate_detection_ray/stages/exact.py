"""Exact-duplicate pre-dedup: fingerprint -> representative mapping.

Hash-partition by content fingerprint + block-local vectorized min (SURVEY §2
D1): every conversation maps to the lexicographically-smallest conv_id sharing
its md5 fingerprint.  Only representatives flow into the (expensive)
signature/LSH stages — at 100 TB this collapses exact-copy mass (including ALL
degenerate empty docs, which share md5("")) before any wide work, the same
role the reference's version-gate plays for recompute skipping
(``ndd/extract_features.py:88``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.partitioning import key_partitioned

REP_MAP_SCHEMA = pa.schema([("conv_id", pa.string()), ("rep_id", pa.string())])


def _rep_block(df: pd.DataFrame) -> pa.Table:
    """Block-local rep assignment (fingerprints are co-located by the keyed
    repartition): rep_id = min conv_id per fingerprint, via a vectorized
    groupby-transform.  Returns an explicitly-schema'd Arrow table (empty
    pandas frames would degrade string columns to Arrow null type)."""
    if df.empty:
        return pa.Table.from_pylist([], schema=REP_MAP_SCHEMA)
    rep = df.groupby("fingerprint")["conv_id"].transform("min")
    return pa.table(
        {
            "conv_id": pa.array(df["conv_id"].to_numpy(), pa.string()),
            "rep_id": pa.array(rep.to_numpy(), pa.string()),
        },
        schema=REP_MAP_SCHEMA,
    )


def exact_rep_map(conversations, num_partitions: int | None = None):
    """conversations -> (conv_id, rep_id): one keyed shuffle on fingerprint."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    parts = key_partitioned(
        conversations.select_columns(["conv_id", "fingerprint"]),
        ["fingerprint"],
        num_partitions,
    )
    return parts.map_batches(_rep_block, batch_format="pandas", batch_size=None)


def representatives(conversations, rep_map, num_partitions: int | None = None):
    """Filter conversations to fingerprint representatives (conv_id == rep_id)
    via a hash join on conv_id."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    reps_only = rep_map.map_batches(
        lambda t: t.filter(pc.equal(t["conv_id"], t["rep_id"])).select(["conv_id"]),
        batch_format="pyarrow",
    )
    return conversations.join(
        reps_only,
        join_type="inner",
        num_partitions=num_partitions,
        on=("conv_id",),
    )


def annotate_reps(conversations, num_partitions: int | None = None):
    """conversations -> conversations + ``rep_id`` column, via ONE keyed
    shuffle on fingerprint (no join).  Downstream:

    - ``rep_map``            = select(conv_id, rep_id)
    - ``representatives``    = filter(conv_id == rep_id)

    both as cheap narrow ops over this single dataset — replaces the previous
    exact_rep_map + hash-join flow (one fewer shuffle, one fewer join)."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import pandas as pd

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("doc_text", pa.string()),
            ("n_turns", pa.int32()),
            ("n_tokens", pa.int32()),
            ("fingerprint", pa.string()),
            ("rep_id", pa.string()),
        ]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        rep = df.groupby("fingerprint")["conv_id"].transform("min")
        return pa.table(
            {
                "conv_id": pa.array(df["conv_id"].to_numpy(), pa.string()),
                "doc_text": pa.array(df["doc_text"].to_numpy(), pa.string()),
                "n_turns": pa.array(df["n_turns"].to_numpy().astype("int32"), pa.int32()),
                "n_tokens": pa.array(df["n_tokens"].to_numpy().astype("int32"), pa.int32()),
                "fingerprint": pa.array(df["fingerprint"].to_numpy(), pa.string()),
                "rep_id": pa.array(rep.to_numpy(), pa.string()),
            },
            schema=schema,
        )

    parts = key_partitioned(conversations, ["fingerprint"], num_partitions)
    return parts.map_batches(block, batch_format="pandas", batch_size=None)
