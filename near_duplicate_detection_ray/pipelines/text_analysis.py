"""Text-analysis operators over the ``documents`` table — the training-data
pipeline extras (language-ID, quality scoring, token counting, length
classification, validation).

Reference analogues: normalization maps (SURVEY §2 M5/M6), nearest-prototype
classification (M11, ``ndd/extract_aspect_ratio.py:60-69``), runtime validation
(M2, ``ndd/shotdetect.py:42-55``), md5 fingerprinting (M17,
``ndd/client_flask.py:98-103``).

Each function takes ``sf_dir`` and returns a Dataset; SQL parity is documented
inline and asserted by the driver against ``oracle_sql()``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import lang_id, quality_metrics, token_count


def _read_docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_counts(sf_dir: str):
    """doc_id, n_tokens (whitespace tokens; 0 for blank).

    SQL parity: ``CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '\\s+')) END``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        counts = [token_count(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(counts, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """doc_id + ASCII-class quality ratios (exact int/int divisions — bitwise
    reproducible in SQL)."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = [quality_metrics(t) for t in batch["text"].to_pylist()]
        out = {"doc_id": batch["doc_id"]}
        for k in ("punct_ratio", "digit_ratio", "alpha_ratio", "stopword_ratio"):
            out[k] = pa.array([r[k] for r in rows], pa.float64())
        out["n_chars"] = pa.array([int(r["n_chars"]) for r in rows], pa.int64())
        out["n_tokens"] = pa.array([int(r["n_tokens"]) for r in rows], pa.int64())
        return pa.table(out)

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def lang_id_docs(sf_dir: str):
    """doc_id, lang_pred via the stopword-voting heuristic (no SQL oracle —
    heuristic is not reasonably SQL-expressible; driver does a rows-only check,
    unit tests pin the function)."""

    def fn(batch: pa.Table) -> pa.Table:
        preds = [lang_id(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# Nearest-prototype length classes (M11 analogue): prototypes on n_chars.
LENGTH_PROTOS = [(100, "short"), (250, "medium"), (400, "long")]


def length_class(sf_dir: str):
    """doc_id, length_class = label of the nearest prototype in LENGTH_PROTOS
    (ties go to the smaller prototype).  Equivalent to midpoint thresholds
    175/325, which is what the SQL oracle expresses."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"]
        cls = pc.if_else(
            pc.less_equal(n, 175),
            pa.scalar("short"),
            pc.if_else(pc.less_equal(n, 325), pa.scalar("medium"), pa.scalar("long")),
        )
        return pa.table({"doc_id": batch["doc_id"], "length_class": cls})

    return _read_docs(sf_dir, ["doc_id", "n_chars"]).map_batches(fn, batch_format="pyarrow")


def validate_docs(sf_dir: str):
    """Single-row validation summary (M2 analogue): row count, blank-text
    count, and n_chars-vs-length(text) mismatches.  Computed as per-batch
    partials summed driver-side (no shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        blank = pc.sum(
            pc.equal(pc.utf8_trim_whitespace(text), pa.scalar("")).cast(pa.int64())
        ).as_py() or 0
        mism = pc.sum(
            pc.not_equal(pc.utf8_length(text), batch["n_chars"]).cast(pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "n_blank_text": pa.array([blank], pa.int64()),
                "n_chars_mismatch": pa.array([mism], pa.int64()),
            }
        )

    import ray.data as rd

    parts = (
        _read_docs(sf_dir, ["text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    return rd.from_items(
        [
            {
                "n_rows": int(parts["n_rows"]),
                "n_blank_text": int(parts["n_blank_text"]),
                "n_chars_mismatch": int(parts["n_chars_mismatch"]),
            }
        ]
    )


def doc_fingerprints(sf_dir: str, window: int = 4):
    """Winnowing fingerprints per document (rolling-hash doc fingerprinting;
    SURVEY §2 M17 family): doc_id, n_fingerprints, min_fingerprint.  Rows-only
    (winnowing is not reasonably SQL-expressible); pinned by unit tests."""
    from ..config import DEFAULT_CONFIG
    from ..functions.hashing import TokenHasher, shingle_hashes
    from ..functions.text import normalize_text, tokenize, winnow_fingerprints

    class Fingerprinter:
        def __init__(self) -> None:
            self.hasher = TokenHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            n_fps, min_fps = [], []
            for text in batch["text"].to_pylist():
                toks = tokenize(normalize_text(text))
                hs = shingle_hashes(
                    self.hasher.hash_tokens(toks), DEFAULT_CONFIG.shingle_w,
                    unique=False,
                )
                fps = winnow_fingerprints(hs.tolist(), window)
                n_fps.append(len(fps))
                min_fps.append(min(fps) if fps else 0)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_fingerprints": pa.array(n_fps, pa.int64()),
                    "min_fingerprint": pa.array(
                        np.array(min_fps, dtype=np.uint64), pa.uint64()
                    ),
                }
            )

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprinter,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(max(1, cpus // 4), max(2, cpus // 2)),
        num_cpus=1,
    )


def english_long_docs(sf_dir: str, min_chars: int = 300):
    """Filtered projection with PREDICATE PUSHDOWN at the read: only row
    groups satisfying lang='en' AND n_chars > min_chars leave storage
    (``read_parquet(filter=...)`` takes a pyarrow dataset expression —
    SURVEY §2 S1/M12; prune-at-the-read discipline)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    expr = (pads.field("lang") == "en") & (pads.field("n_chars") > min_chars)
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars", "source"],
        filter=expr,
    )
