"""Exact-duplicate pre-dedup: fingerprint -> representative mapping.

Hash-partition by content fingerprint + block-local vectorized min (SURVEY §2
D1): every conversation maps to the lexicographically-smallest conv_id sharing
its md5 fingerprint.  Only representatives flow into the (expensive)
signature/LSH stages — at 100 TB this collapses exact-copy mass (including ALL
degenerate empty docs, which share md5("")) before any wide work, the same
role the reference's version-gate plays for recompute skipping
(``ndd/extract_features.py:88``).

Block kernels are Arrow-native (round-4 verdict item #9): a stable
``sort_by`` on (fingerprint, conv_id), the shared ``group_offsets``
boundary detection, and an ``np.repeat`` + ``take`` to broadcast each
group's first (= min) conv_id — no pandas conversion in the flagship path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.partitioning import key_partitioned
from .assemble import group_offsets

REP_MAP_SCHEMA = pa.schema([("conv_id", pa.string()), ("rep_id", pa.string())])


def _rep_column(t: pa.Table) -> pa.Array:
    """rep_id per row of a table ALREADY sorted by (fingerprint, conv_id):
    each group's first row holds the min conv_id; repeat it down the group."""
    offsets = group_offsets(t["fingerprint"].combine_chunks())
    rep_idx = np.repeat(offsets[:-1], np.diff(offsets))
    return t["conv_id"].combine_chunks().take(pa.array(rep_idx, pa.int64()))


def _rep_block(t: pa.Table) -> pa.Table:
    """Block-local rep assignment (fingerprints are co-located by the keyed
    repartition): rep_id = min conv_id per fingerprint.  Returns an
    explicitly-schema'd Arrow table so empty hash partitions keep typed
    string columns."""
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=REP_MAP_SCHEMA)
    t = t.sort_by([("fingerprint", "ascending"), ("conv_id", "ascending")])
    return pa.table(
        {"conv_id": t["conv_id"].combine_chunks(), "rep_id": _rep_column(t)},
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
    return parts.map_batches(_rep_block, batch_format="pyarrow", batch_size=None)


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

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        t = t.sort_by([("fingerprint", "ascending"), ("conv_id", "ascending")])
        out = pa.table(
            {name: t[name].combine_chunks() for name in schema.names[:-1]}
            | {"rep_id": _rep_column(t)}
        )
        return out.cast(schema)

    parts = key_partitioned(conversations, ["fingerprint"], num_partitions)
    return parts.map_batches(block, batch_format="pyarrow", batch_size=None)
