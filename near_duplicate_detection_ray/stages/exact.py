"""Exact-duplicate pre-dedup: fingerprint -> representative mapping.

Hash-partition by content fingerprint + per-group first (SURVEY §2 D1): every
conversation maps to the lexicographically-smallest conv_id sharing its md5
fingerprint.  Only representatives flow into the (expensive) signature/LSH
stages — at 100 TB this collapses exact-copy mass (including ALL degenerate
empty docs, which share md5("")) before any wide work, the same role the
reference's version-gate plays for recompute skipping
(``ndd/extract_features.py:88``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

REP_MAP_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("rep_id", pa.string())]
)


def _rep_group(group: pa.Table) -> pa.Table:
    cids = group["conv_id"]
    rep = pc.min(cids).as_py()
    return pa.table(
        {"conv_id": cids, "rep_id": pa.array([rep] * len(cids), pa.string())},
        schema=REP_MAP_SCHEMA,
    )


def exact_rep_map(conversations):
    """conversations -> (conv_id, rep_id) via groupby(fingerprint)."""
    return conversations.select_columns(["conv_id", "fingerprint"]).groupby(
        "fingerprint"
    ).map_groups(_rep_group, batch_format="pyarrow")


def representatives(conversations, rep_map, num_partitions: int = 16):
    """Filter conversations to fingerprint representatives (conv_id == rep_id)
    via a hash join on conv_id."""
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
