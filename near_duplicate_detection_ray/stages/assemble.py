"""Assemble stage: transcripts (one row per turn) -> conversations (one row per
conversation).

Reference analogue: the per-video unit every extractor iterates
(``ndd/shotdetect.py:80-83``) and the within-shot timestamp ordering of frames
(``ndd/extract_images.py:43``).  Ordering is NEVER taken from block order —
turns are sorted by ``turn_idx`` inside the block-local assembly (SURVEY §2.9,
§4 "Ordering").

Execution shape: ONE keyed hash-partition shuffle on ``conv_id`` (every
conversation lands wholly in one block — state/partitioning.py), then fully
Arrow-vectorized block-local assembly (round-4 verdict item #1): a stable
``sort_by``, group-boundary detection via one shifted ``not_equal``, a
zero-copy ``ListArray`` wrap + ``binary_join`` for the per-conversation text
concat, the shared ASCII-fast-path normalization kernel, and buffer-sliced
md5 — no per-row Python in the hot path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex_column
from ..functions.text import normalize_column, token_count_normalized_column
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


def group_offsets(sorted_keys: pa.Array) -> np.ndarray:
    """Group-boundary offsets of an ALREADY-SORTED key array: int64
    ``[0, b1, .., n]`` such that rows ``offsets[i]:offsets[i+1]`` share one
    key.  One vectorized shifted comparison — no Python per row."""
    n = len(sorted_keys)
    if n <= 1:
        return np.array([0, n][: n + 1], dtype=np.int64)
    neq = pc.not_equal(
        sorted_keys.slice(1), sorted_keys.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(neq).astype(np.int64) + 1
    return np.concatenate([[0], bounds, [n]])


def _assemble_block(t: pa.Table) -> pa.Table:
    """One hash partition: stable-sort by (conv_id, turn_idx), join raw turn
    texts with newline per conversation, normalize, fingerprint.  Matches
    ``oracle.corpus_docs`` + ``normalize_text`` bit-for-bit (md5 also matches
    DuckDB ``md5()``).

    Always returns an explicitly-schema'd Arrow table so empty hash
    partitions (common on small data) don't poison downstream join schemas.
    """
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=CONVERSATIONS_SCHEMA)
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = t["conv_id"].combine_chunks()
    text = pc.cast(t["text"].combine_chunks(), pa.string())
    offsets = group_offsets(conv)
    # Zero-copy wrap of the sorted turn texts as list<string> per conversation,
    # then one binary_join kernel for the "\n"-concat.
    turns_per_conv = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), text
    )
    raw = pc.binary_join(turns_per_conv, "\n")
    docs = normalize_column(raw)
    return pa.table(
        {
            "conv_id": conv.take(pa.array(offsets[:-1], pa.int64())),
            "doc_text": docs,
            "n_turns": pa.array(np.diff(offsets).astype("int32"), pa.int32()),
            "n_tokens": token_count_normalized_column(docs),
            "fingerprint": md5_hex_column(docs),
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
    return parts.map_batches(_assemble_block, batch_format="pyarrow", batch_size=None)
