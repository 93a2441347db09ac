"""Assemble stage: transcripts (one row per turn) -> conversations (one row per
conversation).

Reference analogue: the per-video unit every extractor iterates
(``ndd/shotdetect.py:80-83``) and the within-shot timestamp ordering of frames
(``ndd/extract_images.py:43``).  Ordering is NEVER taken from block order —
turns are sorted by ``turn_idx`` inside the block-local assembly (SURVEY §2.9,
§4 "Ordering").

Execution shape: ONE keyed hash-partition shuffle on ``conv_id`` (every
conversation lands wholly in one block — state/partitioning.py), then
vectorized block-local assembly with pandas groupby (no per-conversation Ray
round-trips, no per-singleton-group Python calls)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ..functions.text import normalize_text, tokenize
from ..state.partitioning import key_partitioned

CONVERSATIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc_text", pa.string()),      # normalized full conversation text
        ("n_turns", pa.int32()),
        ("n_tokens", pa.int32()),
        ("fingerprint", pa.string()),   # md5 hex of doc_text (exact-dup key)
    ]
)


def _assemble_block(df: pd.DataFrame) -> pa.Table:
    """One hash partition: sort by (conv_id, turn_idx), join raw turn texts
    with newline per conversation, normalize, fingerprint.  Matches
    ``oracle.corpus_docs`` + ``normalize_text`` bit-for-bit (md5 also matches
    DuckDB ``md5()``).

    Always returns an explicitly-schema'd Arrow table: an empty PANDAS frame
    would round-trip its string columns to Arrow ``null`` type and poison
    downstream join schemas (empty hash partitions are common on small data).
    """
    if df.empty:
        return pa.Table.from_pylist([], schema=CONVERSATIONS_SCHEMA)
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = df.groupby("conv_id", sort=True)
    raw = g["text"].agg("\n".join)
    n_turns = g.size()
    docs = [normalize_text(t) for t in raw.to_numpy()]
    return pa.table(
        {
            "conv_id": pa.array(raw.index.to_numpy(), pa.string()),
            "doc_text": pa.array(docs, pa.string()),
            "n_turns": pa.array(n_turns.to_numpy().astype("int32"), pa.int32()),
            "n_tokens": pa.array([len(tokenize(d)) for d in docs], pa.int32()),
            "fingerprint": pa.array(
                [hashlib.md5(d.encode("utf-8")).hexdigest() for d in docs], pa.string()
            ),
        },
        schema=CONVERSATIONS_SCHEMA,
    )


def assemble_conversations(transcripts, num_partitions: int | None = None):
    """transcripts Dataset -> conversations Dataset (one keyed shuffle)."""
    parts = key_partitioned(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"],
        num_partitions,
    )
    return parts.map_batches(_assemble_block, batch_format="pandas", batch_size=None)
