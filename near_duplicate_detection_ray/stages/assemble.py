"""Assemble stage: transcripts (one row per turn) -> conversations (one row per
conversation).

Reference analogue: the per-video unit every extractor iterates
(``ndd/shotdetect.py:80-83``) and the within-shot timestamp ordering of frames
(``ndd/extract_images.py:43``).  Ordering is NEVER taken from block order —
turns are sorted by ``turn_idx`` inside the grouped map (SURVEY §2.9, §4
"Ordering").

This is the first shuffle of the pipeline (groupby conv_id).  The per-group
function is cheap (string join + md5), so the cost is dominated by the exchange
itself, which Ray Data's sort-based groupby handles in streaming fashion.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.text import normalize_text, tokenize

CONVERSATIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc_text", pa.string()),      # normalized full conversation text
        ("n_turns", pa.int32()),
        ("n_tokens", pa.int32()),
        ("fingerprint", pa.string()),   # md5 hex of doc_text (exact-dup key)
    ]
)


def _assemble_group(group: pa.Table) -> pa.Table:
    """One conversation: sort turns by turn_idx, join raw texts with newline,
    normalize, fingerprint.  Matches ``oracle.corpus_docs`` + ``normalize_text``
    bit-for-bit (the md5 also matches DuckDB ``md5()`` for SQL oracles)."""
    order = np.argsort(group["turn_idx"].to_numpy(zero_copy_only=False), kind="stable")
    texts = group["text"].to_pylist()
    raw = "\n".join(texts[i] for i in order)
    doc = normalize_text(raw)
    return pa.table(
        {
            "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
            "doc_text": pa.array([doc], pa.string()),
            "n_turns": pa.array([len(texts)], pa.int32()),
            "n_tokens": pa.array([len(tokenize(doc))], pa.int32()),
            "fingerprint": pa.array(
                [hashlib.md5(doc.encode("utf-8")).hexdigest()], pa.string()
            ),
        },
        schema=CONVERSATIONS_SCHEMA,
    )


def assemble_conversations(transcripts):
    """transcripts Dataset -> conversations Dataset (groupby conv_id shuffle)."""
    return transcripts.select_columns(["conv_id", "turn_idx", "text"]).groupby(
        "conv_id"
    ).map_groups(_assemble_group, batch_format="pyarrow")
