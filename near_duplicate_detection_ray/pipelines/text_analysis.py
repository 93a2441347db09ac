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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import LANG_STOPWORDS

# ASCII punctuation / digit / letter classes — RE2 syntax, identical to the
# Python regexes in functions/text.py (the scalar reference implementations,
# pinned against these vectorized kernels by tests/test_round2_fixes.py).
_PUNCT_PAT = r"[!-/:-@\[-`{-~]"
_DIGIT_PAT = "[0-9]"
_ALPHA_PAT = "[A-Za-z]"
_TOKEN_PAT = r"\S+"
_STRIP_CHARS = ".,!?;:\"'()"


def _read_docs(sf_dir: str, columns=None):
    from ..sources.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _token_row_index(tokens: pa.ListArray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx per flattened token, tokens-per-row) for bincount aggregation."""
    lens = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    return np.repeat(np.arange(n, dtype=np.int64), lens), lens


def token_counts(sf_dir: str):
    """doc_id, n_tokens (whitespace tokens; 0 for blank) — one vectorized
    ``pc.count_substring_regex`` per batch, no Python per row.

    SQL parity: ``CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '\\s+')) END``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern=_TOKEN_PAT)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str):
    """doc_id + ASCII-class quality ratios (exact int/int divisions — bitwise
    reproducible in SQL).  Fully vectorized: character-class counts via
    ``pc.count_substring_regex``, the stopword ratio via split -> flatten ->
    ``pc.is_in`` -> ``np.bincount`` (no per-document Python loop)."""

    stop_set = pa.array(sorted(LANG_STOPWORDS["en"]), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = batch.num_rows
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
        n_tokens = pc.cast(
            pc.count_substring_regex(text, pattern=_TOKEN_PAT), pa.int64()
        ).to_numpy(zero_copy_only=False)
        n_punct = pc.count_substring_regex(text, pattern=_PUNCT_PAT).to_numpy(zero_copy_only=False)
        n_digit = pc.count_substring_regex(text, pattern=_DIGIT_PAT).to_numpy(zero_copy_only=False)
        n_alpha = pc.count_substring_regex(text, pattern=_ALPHA_PAT).to_numpy(zero_copy_only=False)

        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), pattern=r"\s+"
        )
        row_idx, _ = _token_row_index(toks, n)
        stripped = pc.utf8_trim(pc.utf8_lower(pc.list_flatten(toks)), characters=_STRIP_CHARS)
        is_stop = pc.is_in(stripped, value_set=stop_set).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(row_idx, weights=is_stop, minlength=n)

        denom_c = np.maximum(n_chars, 1).astype(np.float64)
        denom_t = np.maximum(n_tokens, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "punct_ratio": pa.array(np.where(n_chars > 0, n_punct / denom_c, 0.0)),
                "digit_ratio": pa.array(np.where(n_chars > 0, n_digit / denom_c, 0.0)),
                "alpha_ratio": pa.array(np.where(n_chars > 0, n_alpha / denom_c, 0.0)),
                "stopword_ratio": pa.array(np.where(n_tokens > 0, n_stop / denom_t, 0.0)),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


_LANGS = sorted(LANG_STOPWORDS)  # alphabetical == deterministic tie-break order
_STOP_SETS = {
    lang: pa.array(sorted(sw), pa.string()) for lang, sw in LANG_STOPWORDS.items()
}


def _lang_pred_arr(text_col, n: int) -> np.ndarray:
    """Vectorized stopword-vote language prediction for one batch column:
    one regex cleanup + split, one ``pc.is_in`` + ``np.bincount`` per
    language, argmax with the alphabetical tie-break of the scalar
    ``functions.text.lang_id`` (pinned by a parity test)."""
    cleaned = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(text_col), pattern="[^a-z0-9']+", replacement=" "
        )
    )
    toks = pc.split_pattern_regex(cleaned, pattern=r"\s+")
    row_idx, _ = _token_row_index(toks, n)
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
    word_count = np.bincount(row_idx, weights=nonempty, minlength=n)
    votes = np.stack(
        [
            np.bincount(
                row_idx,
                weights=pc.is_in(flat, value_set=_STOP_SETS[lang]).to_numpy(
                    zero_copy_only=False
                ),
                minlength=n,
            )
            for lang in _LANGS
        ],
        axis=1,
    )  # (n, langs), tie-break = first (alphabetical) argmax
    best = votes.max(axis=1)
    return np.where(
        (word_count == 0) | (best == 0),
        "unknown",
        np.asarray(_LANGS, dtype=object)[np.argmax(votes, axis=1)],
    )


def lang_id_docs(sf_dir: str):
    """doc_id, lang_pred via stopword voting over {en, de, fr, es}.
    SQL parity: see ``oracle_sql()['lang_id_docs']``."""

    def fn(batch: pa.Table) -> pa.Table:
        pred = _lang_pred_arr(batch["text"], batch.num_rows)
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred.tolist(), pa.string())}
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
    """Winnowing fingerprints per document (Schleimer et al. SIGMOD'03; SURVEY
    §2 M17 family): doc_id, n_fingerprints, min_fingerprint.

    Hash basis is ``md5_low64`` over the positional w-token shingle STRINGS of
    the normalized text, so the DuckDB oracle can replay the winnowing
    (``md5_number_lower`` + windowed min with rightmost-tie selection — see
    ``oracle_sql()['doc_fingerprints']``)."""
    from ..config import DEFAULT_CONFIG
    from ..functions.hashing import md5_low64
    from ..functions.text import (
        normalize_text,
        shingle_tokens,
        tokenize,
        winnow_fingerprints,
    )

    class Fingerprinter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.hashing import md5_shingle_hashes
            from ..functions.text import normalize_column

            hs_all, counts = md5_shingle_hashes(
                normalize_column(batch["text"]).to_pylist(),
                DEFAULT_CONFIG.shingle_w,
            )
            n_fps, min_fps = [], []
            pos = 0
            for c in counts:
                fps = winnow_fingerprints(hs_all[pos : pos + c], window)
                pos += c
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


# BPE-ish pretokenizer (GPT-2-style shape, RE2-safe: no lookaheads): English
# contraction suffixes, letter runs, digit runs, non-space symbol runs.  The
# SAME pattern string runs in Arrow's count_substring_regex and DuckDB's
# regexp_extract_all — both are RE2, so alternation semantics are identical
# (verified on unicode inputs).
BPE_PIECE_PAT = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_counts(sf_dir: str):
    """doc_id, n_pieces: subword-piece count under the BPE-ish pretokenizer —
    the LLM-pipeline token-budget estimate (whitespace counts undercount
    punctuation-heavy text).  One vectorized RE2 count per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern=BPE_PIECE_PAT)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_pieces": pc.cast(n, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def repetition_docs(sf_dir: str):
    """Gopher-style repetition quality metrics (Rae et al. 2021 §A1.1, public)
    adapted to word level (this corpus has no line structure):

      - ``dup_word_frac``   = 1 - distinct_words / total_words
      - ``dup_bigram_frac`` = 1 - distinct_bigrams / total_bigrams
      - ``top_bigram_frac`` = occurrences of the most frequent word bigram
                              / total_bigrams

    All 0.0 for blank docs (and the bigram metrics for 1-word docs).  Fully
    vectorized: one regex split per batch, ``pc.dictionary_encode`` to int
    codes, then numpy lexsort run-length stats — no per-document Python.

    SQL parity: identical ``1.0 - (d * 1.0 / n)`` IEEE expressions in DuckDB
    over ``regexp_split_to_array`` lists (see ``oracle_sql()``)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch["text"]
        blank = pc.equal(pc.utf8_trim_whitespace(text), pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), pattern=r"\s+"
        )
        row_idx, lens = _token_row_index(toks, n)
        n_words = np.where(blank, 0, lens)
        flat = pc.list_flatten(toks)
        codes = (
            pc.dictionary_encode(flat)
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        ) if len(flat) else np.empty(0, np.int64)
        # keep only tokens of non-blank rows (blank text splits to [''])
        keep = ~blank[row_idx]
        row_idx, codes = row_idx[keep], codes[keep]

        # distinct words per row: sort by (row, code), count group starts
        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        new = np.ones(len(r), dtype=np.float64)
        if len(r) > 1:
            new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        n_distinct = np.bincount(r, weights=new, minlength=n)

        # bigrams: adjacent same-row token pairs, keyed by code pair
        same = np.zeros(max(len(row_idx) - 1, 0), dtype=bool)
        if len(row_idx) > 1:
            same = row_idx[1:] == row_idx[:-1]
        brow = row_idx[:-1][same] if len(row_idx) else np.empty(0, np.int64)
        k = int(codes.max()) + 1 if len(codes) else 1
        bkey = codes[:-1][same] * k + codes[1:][same] if len(codes) else np.empty(0, np.int64)
        n_bigrams = np.bincount(brow, minlength=n).astype(np.float64)

        order2 = np.lexsort((bkey, brow))
        br, bk = brow[order2], bkey[order2]
        bnew = np.ones(len(br), dtype=bool)
        if len(br) > 1:
            bnew[1:] = (br[1:] != br[:-1]) | (bk[1:] != bk[:-1])
        n_distinct_bg = np.bincount(br, weights=bnew.astype(np.float64), minlength=n)
        # top-bigram count per row: run lengths of equal (row, key) runs
        top_cnt = np.zeros(n, dtype=np.float64)
        if len(br):
            starts = np.flatnonzero(bnew)
            run_lens = np.diff(np.append(starts, len(br)))
            np.maximum.at(top_cnt, br[starts], run_lens.astype(np.float64))

        nw = n_words.astype(np.float64)
        dup_word = np.where(n_words > 0, 1.0 - (n_distinct * 1.0 / np.maximum(nw, 1.0)), 0.0)
        dup_bg = np.where(n_bigrams > 0, 1.0 - (n_distinct_bg * 1.0 / np.maximum(n_bigrams, 1.0)), 0.0)
        top_bg = np.where(n_bigrams > 0, top_cnt * 1.0 / np.maximum(n_bigrams, 1.0), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dup_word_frac": pa.array(dup_word, pa.float64()),
                "dup_bigram_frac": pa.array(dup_bg, pa.float64()),
                "top_bigram_frac": pa.array(top_bg, pa.float64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def top_ngrams_corpus(sf_dir: str, k: int = 20):
    """CORPUS-level top-k word bigrams: (gram, n) for the k most frequent
    bigrams, ties broken by gram ascending.

    The scale pattern is partial aggregation (combiner): each block first
    collapses its bigrams to (gram, count) via ``pc.value_counts`` — the
    shuffle then moves at most distinct-grams-per-block rows instead of one
    row per bigram occurrence — before the small ``groupby('gram').sum``
    and the final sort+limit.  At 100 TB the pre-aggregate bounds exchange
    volume by vocabulary size, not corpus size (SURVEY §2 A2 two-level agg).
    """

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        text = batch["text"]
        blank = pc.equal(pc.utf8_trim_whitespace(text), pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")
        row_idx, _ = _token_row_index(toks, batch.num_rows)
        flat = pc.list_flatten(toks).combine_chunks()
        if len(flat) < 2:
            return empty
        keep = ~blank[row_idx]
        same = keep[1:] & keep[:-1] & (row_idx[1:] == row_idx[:-1])
        grams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        ).filter(pa.array(same))
        if len(grams) == 0:
            return empty
        vc = pc.value_counts(grams)
        return pa.table(
            {"gram": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ..functions.groupagg import global_topk

    parts = _read_docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
    totals = parts.groupby("gram").sum("n")
    totals = totals.rename_columns({"sum(n)": "n"})
    # vocabulary-sized table: take the top k via bounded per-block partials,
    # not a full Dataset.sort of every distinct gram
    return global_topk(totals, ["n", "gram"], [True, False], k)


def clean_docs(sf_dir: str):
    """Rewrite map: doc_id, clean_text (English stopwords removed, tokens
    re-joined with single spaces), n_removed.  The per-row REWRITE pattern
    (vs the scoring maps above): filter the flattened token array with one
    ``pc.is_in``, rebuild per-row lists from bincounted offsets, and re-join
    with ``pc.binary_join`` — no per-document Python.

    Stopword matching mirrors ``quality_scores``: lowercase + strip
    ``.,!?;:"'()`` before the membership test, but the KEPT token keeps its
    original form.  SQL parity via ``list_filter`` + ``array_to_string``."""

    stop_set = pa.array(sorted(LANG_STOPWORDS["en"]), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        )
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        stripped = pc.utf8_trim(pc.utf8_lower(flat), characters=_STRIP_CHARS)
        is_stop = pc.is_in(stripped, value_set=stop_set).to_numpy(zero_copy_only=False)
        kept = flat.filter(pa.array(~is_stop))
        new_lens = np.bincount(row_idx[~is_stop], minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=offsets[1:])
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, kept.cast(pa.large_string())),
            pa.scalar(" ", pa.large_string()),
        )
        n_removed = np.bincount(row_idx[is_stop], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_removed": pa.array(n_removed, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def vocab_stats(sf_dir: str):
    """Single-row corpus vocabulary stats: total word occurrences and GLOBAL
    distinct word count.  Global distinct is the D-family primitive done
    off-driver: per-block ``pc.unique`` partials merged through a remote
    tree (``state/partitioning.distinct_values_ref``) — the driver learns
    one integer, never the vocabulary.  Totals ride the same read as a
    per-block count partial."""
    import ray.data as rd

    from ..state.partitioning import distinct_values_ref

    docs = _read_docs(sf_dir, ["text"])

    def words(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        return pa.table({"w": flat})

    word_ds = docs.map_batches(words, batch_format="pyarrow")
    _ref, n_distinct = distinct_values_ref(word_ds, ["w"])
    n_total = word_ds.count()
    return rd.from_items(
        [{"n_words": int(n_total), "n_distinct_words": int(n_distinct)}]
    )


def sample_docs(sf_dir: str, pct: int = 10):
    """Deterministic content-independent sampling — the reproducible
    train/eval split primitive at corpus scale: keep docs where
    ``md5_low64(str(doc_id)) % 100 < pct``.  Hash-based (not row-number
    or RNG) so the SAME docs are kept regardless of partitioning, engine
    parallelism, or corpus growth; SQL parity via DuckDB
    ``md5_number_lower`` (bit-identical basis, verified in hashing.py)."""
    from ..functions.hashing import md5_low64

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (md5_low64(str(int(d))) % 100 < pct for d in ids), bool, len(ids)
        )
        return batch.filter(pa.array(keep))

    return _read_docs(sf_dir, ["doc_id", "lang", "n_chars", "source"]).map_batches(
        fn, batch_format="pyarrow"
    )


# --- PII redaction -----------------------------------------------------------
# Pattern strings are RE2 on BOTH sides (Arrow re2 kernels, DuckDB regexp_*),
# so match sets — and therefore counts and replacements — agree byte-for-byte.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_IP_PAT = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_text_batch(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """The generic PII-scrub kernel: count matches on the ORIGINAL text, then
    apply the replacements sequentially (email -> phone -> IPv4).  Entirely
    vectorized: one ``pc.count_substring_regex`` + one
    ``pc.replace_substring_regex`` per pattern class, no Python per row.

    Returns columns ``redacted_text, n_emails, n_phones, n_ips``.
    """
    counts = {
        name: pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())
        for name, pat in (
            ("n_emails", _EMAIL_PAT),
            ("n_phones", _PHONE_PAT),
            ("n_ips", _IP_PAT),
        )
    }
    red = text
    for pat, repl in (
        (_EMAIL_PAT, "[EMAIL]"),
        (_PHONE_PAT, "[PHONE]"),
        (_IP_PAT, "[IP]"),
    ):
        red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
    return {"redacted_text": red, **counts}


def redact_docs(sf_dir: str):
    """PII redaction over a PII-bearing corpus — the scrubbing step every
    training-data pipeline runs before tokenization.

    The synthetic ``documents`` table carries no PII, so the query derives a
    deterministic PII-laden corpus first (a contact line computed from
    ``doc_id`` appended to each text — vectorized Arrow string build, replayed
    verbatim in the SQL oracle), then applies the generic
    :func:`redact_text_batch` kernel.  Output: ``doc_id, redacted_text,
    n_emails, n_phones, n_ips``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        ids_s = pc.cast(ids, pa.string())
        phone4 = pc.ascii_lpad(
            pc.cast(pa.array(ids_np % 10000, pa.int64()), pa.string()),
            width=4, padding="0",
        )
        oct_b = pc.cast(pa.array(ids_np % 256, pa.int64()), pa.string())
        oct_d = pc.cast(pa.array((ids_np * 7) % 256, pa.int64()), pa.string())
        aug = pc.binary_join_element_wise(
            batch["text"],
            " contact user", ids_s, "@mail.example.com or +1-202-", phone4,
            " from 10.", oct_b, ".0.", oct_d,
            "",
        )
        return pa.table({"doc_id": ids, **redact_text_batch(aug)})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def stratified_sample_docs(sf_dir: str, k: int = 20):
    """Deterministic STRATIFIED sampling: the ``k`` docs with the smallest
    ``md5_low64(str(doc_id))`` per language stratum — the balanced-eval-split
    primitive (equal-size per-group samples that are stable under corpus
    growth within a stratum, partitioning, and parallelism, unlike
    row-number or RNG sampling).

    Combiner shape: every block keeps only its own k smallest (hash, doc_id)
    per stratum (a C-level lexsort + groupby-head, bounded k x n_langs rows
    out per block), then ONE tiny keyed shuffle on the low-cardinality
    stratum merges partials and assigns ranks.  SQL parity: DuckDB
    ``md5_number_lower`` is bit-identical to the engine hash; ordering is
    (hash, doc_id) ascending on both sides."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..state.partitioning import key_partitioned

    def hash_and_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = np.fromiter(
            (md5_low64(str(int(d))) for d in df["doc_id"]),
            np.uint64,
            len(df),
        )
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(k)

    out_schema = pa.schema(
        [("lang", pa.string()), ("rank", pa.int64()), ("doc_id", pa.int64())]
    )

    def final_topk(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df.groupby("lang", sort=False).head(k)
        df["rank"] = df.groupby("lang", sort=False).cumcount() + 1
        return pa.table(
            {
                "lang": pa.array(df["lang"].tolist(), pa.string()),
                "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    partials = _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        hash_and_prune, batch_format="pandas"
    )
    return key_partitioned(partials, ["lang"]).map_batches(
        final_topk, batch_format="pandas", batch_size=None
    )


def top_terms_docs(sf_dir: str, k: int = 3):
    """TF-IDF-style top-``k`` characteristic terms per document — the classic
    IR feature-extraction step.  The score is the EXACT rational
    ``tf * N / df`` evaluated as one IEEE double division (bit-identical in
    numpy and DuckDB, unlike log-based idf whose libm rounding differs);
    ranking is (score DESC, term ASC), so the whole output hash-matches SQL.

    Distributed shape (the PPJoin df-attach pattern from
    ``docs_dedup.ngram_jaccard_pairs``): per-block (doc, term, tf) partials
    via a C-level pandas groupby; ONE term-keyed partition where each term's
    document frequency is its local group size; ONE doc-keyed partition for
    the per-doc top-k."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count (no full read)

    def tf_block(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        if batch.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64())}
            )
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        )
        row_idx, _ = _token_row_index(toks, batch.num_rows)
        d = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[row_idx],
                "term": pc.list_flatten(toks).to_pandas(),
            }
        )
        out = d.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        return pa.table(
            {
                "term": pa.array(out["term"].tolist(), pa.string()),
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "tf": pa.array(out["tf"].to_numpy(), pa.int64()),
            }
        )

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df["df"] = pd.Series([], dtype=np.int64)
            return df
        df = df.copy()
        # (doc, term) rows are unique, so group size == document frequency
        df["df"] = df.groupby("term", sort=False)["term"].transform("size")
        return df

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("rank", pa.int64()),
         ("term", pa.string()), ("score", pa.float64())]
    )

    def topk(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.copy()
        df["score"] = (df["tf"].to_numpy() * n_docs).astype(np.float64) / df[
            "df"
        ].to_numpy().astype(np.float64)
        df = df.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("doc_id", sort=False).head(k)
        df["rank"] = df.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
                "term": pa.array(df["term"].tolist(), pa.string()),
                "score": pa.array(df["score"].to_numpy(), pa.float64()),
            },
            schema=out_schema,
        )

    tf = docs.map_batches(tf_block, batch_format="pyarrow")
    with_df = key_partitioned(tf, ["term"]).map_batches(
        attach_df, batch_format="pandas", batch_size=None
    )
    return key_partitioned(with_df, ["doc_id"]).map_batches(
        topk, batch_format="pandas", batch_size=None
    )


def normalize_docs(sf_dir: str):
    """The M5 normalization map as a standalone oracled operator: NFC ->
    lower -> ASCII-whitespace collapse -> space strip, fully vectorized
    (``pc.utf8_normalize`` + ``utf8_lower`` + one RE2 replace +
    ``utf8_trim(' ')``).

    EXACT SQL parity for ALL inputs: both Arrow and DuckDB run RE2 whose
    ``\\s`` is ASCII-only, and the final strip removes plain spaces only
    (DuckDB ``trim``) — after the collapse, edges carry at most one space,
    so that is the complete strip.  The flagship's scalar
    ``functions.text.normalize_text`` uses Python's UNICODE ``\\s``; the two
    agree on ASCII-whitespace corpora (asserted in tests) but this operator,
    not the scalar, is the SQL-parity form.  Output: ``doc_id, norm_text,
    changed``."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray
        ) else batch["text"]
        # NFC: identity on pure-ASCII rows (vectorized check — the common
        # case costs nothing); true unicodedata NFC on the rare rest.
        # pyarrow 16's utf8_normalize is NOT form-conformant (returns
        # decomposed output for form='NFC'), so it cannot be used here.
        ascii_mask = pc.equal(pc.utf8_length(text), pc.binary_length(text))
        if batch.num_rows and not pc.all(ascii_mask).as_py():
            import unicodedata

            am = ascii_mask.to_numpy(zero_copy_only=False)
            text = pa.array(
                [
                    v if a else unicodedata.normalize("NFC", v)
                    for v, a in zip(text.to_pylist(), am)
                ],
                pa.string(),
            )
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(text), pattern=r"\s+", replacement=" "
            ),
            characters=" ",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": norm,
                "changed": pc.not_equal(norm, batch["text"]),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def chunk_docs(sf_dir: str, size: int = 32, stride: int = 24):
    """RAG-style OVERLAPPING token-window chunking: every document is cut
    into windows of ``size`` whitespace tokens advancing by ``stride``
    (overlap = ``size - stride``), the retrieval-corpus preparation step of
    LLM data pipelines.  Complements ``media_chunks`` (byte-window PLAN
    arithmetic, no content): this emits the actual chunk TEXT.

    Reference analogue: the 1000 ms frame-sampling stride inside a shot
    (SURVEY §2 M3, ``ndd/extract_images.py:43``) — a deterministic stride
    expansion of one unit into many sub-units.

    Fully vectorized fan-out: per-chunk flat token positions are built with
    ``np.repeat``/cumsum arithmetic, gathered with one Arrow ``take``, and
    re-joined per chunk via ``pc.binary_join`` over a rebuilt list array —
    no per-document Python.  Blank docs emit no chunks; the final window of
    a doc may be shorter than ``size``.

    Output: ``doc_id, chunk_idx, chunk_text, n_tokens``.
    SQL parity: DuckDB 1-based inclusive clamped list slicing
    ``l[st+1 : st+size]`` over ``regexp_split_to_array``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        blank = pc.equal(trimmed, pa.scalar("")).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        _, raw_lens = _token_row_index(toks, n)
        lens = np.where(blank, 0, raw_lens)  # '' splits to [''] — zero it
        n_chunks = (lens + stride - 1) // stride  # ceil; 0 for blank docs
        total = int(n_chunks.sum())
        doc_row = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        row_first = np.cumsum(n_chunks) - n_chunks  # exclusive prefix
        chunk_idx = (
            np.arange(total, dtype=np.int64) - np.repeat(row_first, n_chunks)
        )
        start_tok = chunk_idx * stride
        clen = np.minimum(size, lens[doc_row] - start_tok)

        tok_off = np.cumsum(raw_lens) - raw_lens  # row start in the flat array
        pos0 = tok_off[doc_row] + start_tok
        coff = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(clen, out=coff[1:])
        flat_pos = (
            np.repeat(pos0, clen)
            + np.arange(coff[-1], dtype=np.int64)
            - np.repeat(coff[:-1], clen)
        )
        flat = pc.list_flatten(toks).combine_chunks()
        sel = flat.take(pa.array(flat_pos, pa.int64())).cast(pa.large_string())
        chunk_text = pc.binary_join(
            pa.LargeListArray.from_arrays(coff, sel),
            pa.scalar(" ", pa.large_string()),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(doc_row, pa.int64())),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk_text": pc.cast(chunk_text, pa.string()),
                "n_tokens": pa.array(clen, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def bigram_novelty_docs(sf_dir: str):
    """Cross-document n-gram NOVELTY scoring: for every document, how much of
    its bigram content is shared with the rest of the corpus — the "how
    derivative is this doc" signal used to prioritize novel data (and to
    flag boilerplate-heavy docs whose grams are corpus-wide).

    All outputs are exact integers (order-insensitive sums, hash-exact in
    SQL): ``n_bigrams`` (total), ``n_distinct_bigrams``, ``n_self_bigrams``
    (distinct grams occurring NOWHERE else in the corpus — pure novelty),
    and ``familiarity_w`` = Σ k·n over the doc's distinct grams (k = count
    in this doc, n = corpus-wide count).

    Distributed shape — the df-attach pattern of ``top_terms_docs`` at
    corpus scale, no broadcast of the gram vocabulary: (1) per-block
    (doc_id, gram, k) partials via a C-level pandas groupby (docs are
    row-atomic, so block partials are exact per-doc counts); (2) ONE
    gram-keyed hash partition where each gram's corpus count is a local
    ``transform('sum')``; (3) ONE doc-keyed groupby-sum over the stat rows,
    zero-fill rows for gram-less docs riding the same shuffle.
    """
    import pandas as pd

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    gram_schema = pa.schema(
        [("doc_id", pa.int64()), ("gram", pa.string()), ("k", pa.int64())]
    )

    def per_doc_grams(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=gram_schema)
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        blank = pc.equal(trimmed, pa.scalar("")).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        if len(flat) < 2:
            return pa.Table.from_pylist([], schema=gram_schema)
        same = (~blank[row_idx[1:]]) & (row_idx[1:] == row_idx[:-1])
        grams = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        ).filter(pa.array(same))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[row_idx[:-1][same]]
        d = pd.DataFrame({"doc_id": ids, "gram": grams.to_pandas()})
        out = d.groupby(["doc_id", "gram"], sort=False).size().reset_index(name="k")
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "gram": pa.array(out["gram"].tolist(), pa.string()),
                "k": pa.array(out["k"].to_numpy(), pa.int64()),
            }
        )

    stat_schema = pa.schema(
        [("doc_id", pa.int64()), ("k", pa.int64()), ("dist", pa.int64()),
         ("self", pa.int64()), ("w", pa.int64())]
    )

    def attach_corpus(df: "pd.DataFrame") -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=stat_schema)
        nn = df.groupby("gram", sort=False)["k"].transform("sum").to_numpy()
        k = df["k"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "k": pa.array(k, pa.int64()),
                "dist": pa.array(np.ones(len(df), np.int64)),
                "self": pa.array((nn == k).astype(np.int64)),
                "w": pa.array(k * nn, pa.int64()),
            },
            schema=stat_schema,
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, np.int64))
        return pa.table(
            {"doc_id": batch["doc_id"], "k": z, "dist": z, "self": z, "w": z},
            schema=stat_schema,
        )

    grams = docs.map_batches(per_doc_grams, batch_format="pyarrow")
    stats = key_partitioned(grams, ["gram"]).map_batches(
        attach_corpus, batch_format="pandas", batch_size=None
    )
    zeros = docs.select_columns(["doc_id"]).map_batches(
        zero_rows, batch_format="pyarrow"
    )
    agg = stats.union(zeros).groupby("doc_id").sum(["k", "dist", "self", "w"])
    return agg.rename_columns(
        {
            "sum(k)": "n_bigrams",
            "sum(dist)": "n_distinct_bigrams",
            "sum(self)": "n_self_bigrams",
            "sum(w)": "familiarity_w",
        }
    )


def keyword_search_docs(sf_dir: str, terms: tuple = ("spark", "window", "hash"),
                        k: int = 10):
    """Lexical keyword SEARCH over the corpus: rank documents for a fixed
    query-term set by tf-idf and return the global top-``k`` — the batch
    analogue of the reference's ranked query path (SURVEY §2 S11/O1:
    ``ndd/server_ndd.py:108-123`` scores the whole corpus against one query
    and returns the best hits).

    The score is the EXACT RATIONAL ``Σ_i tf_i · N / df_i`` evaluated as one
    integer numerator over one integer denominator and a SINGLE IEEE
    division — bit-identical in SQL, unlike log-idf (libm) or per-term
    float sums (order-dependent).  Zero-df terms drop out of both sides via
    an effective-df of 1.  Int64 range bounds the construction to
    tf·N·Πdf < 2^63 — fine for per-corpus vocabularies up to ~1e6 docs per
    partition-corpus; beyond that, switch the score to per-term float with
    a fixed summation order (documented tradeoff).

    Distributed shape: the tf pass emits ONLY hit docs (one ``pc.equal`` +
    bincount per query term, vectorized); document frequencies are
    per-block count partials summed to |terms| integers (never a
    vocabulary shuffle); the top-k rides bounded per-block partials.
    Output: ``doc_id, n_hit_terms, score``.
    """
    from ..functions.groupagg import global_topk
    from ..state.partitioning import materialize_clean

    terms = list(terms)
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count

    tf_schema = pa.schema(
        [("doc_id", pa.int64())]
        + [(f"tf{i + 1}", pa.int64()) for i in range(len(terms))]
    )

    def tf_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return tf_schema.empty_table()
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        tfs = []
        for t in terms:
            mask = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(row_idx[mask], minlength=n).astype(np.int64))
        hit = np.logical_or.reduce([tf > 0 for tf in tfs])
        keep = pa.array(hit)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(keep),
                **{
                    f"tf{i + 1}": pa.array(tf[hit], pa.int64())
                    for i, tf in enumerate(tfs)
                },
            },
            schema=tf_schema,
        )

    tf_ds = materialize_clean(docs.map_batches(tf_block, batch_format="pyarrow"))

    # document frequencies: one tiny partial row per block, summed driver-side
    def df_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                f"c{i + 1}": pa.array(
                    [int((t[f"tf{i + 1}"].to_numpy(zero_copy_only=False) > 0).sum())],
                    pa.int64(),
                )
                for i in range(len(terms))
            }
        )

    df_rows = tf_ds.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    dfs = [
        int(df_rows[f"c{i + 1}"].sum()) if not df_rows.empty else 0
        for i in range(len(terms))
    ]
    eff = np.array([d if d > 0 else 1 for d in dfs], dtype=np.int64)
    den = int(np.prod(eff))
    # numerator coefficient for term i: N * prod of the OTHER effective dfs
    coef = np.array([n_docs * (den // e) for e in eff], dtype=np.int64)

    def score_block(t: pa.Table) -> pa.Table:
        m = t.num_rows
        tf_mat = np.stack(
            [t[f"tf{i + 1}"].to_numpy(zero_copy_only=False) for i in range(len(terms))]
        ) if m else np.zeros((len(terms), 0), np.int64)
        num = (tf_mat * coef[:, None]).sum(axis=0)
        hits = (tf_mat > 0).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hit_terms": pa.array(hits, pa.int64()),
                "score": pa.array(num.astype(np.float64) / float(den)),
            }
        )

    scored = tf_ds.map_batches(score_block, batch_format="pyarrow")
    return global_topk(scored, ["score", "doc_id"], [True, False], k)


def pack_sequences_docs(sf_dir: str, seq_len: int = 512,
                        num_blocks: int | None = None):
    """Training-sequence PACKING plan (GPT-style concat-and-chunk): documents
    are concatenated in ``doc_id`` order and cut into fixed ``seq_len``-token
    training sequences; each doc reports its global token offset and the
    first/last sequence it lands in — the deterministic packing manifest a
    tokenizer-sharding step consumes.

    The distributed primitive here is a GLOBAL PREFIX SUM across blocks —
    inexpressible as groupby/map_batches alone, so this stage follows SURVEY
    §2's custom-operator ladder to (c) raw Ray tasks for the scan step:
    (1) a map pass reduces docs to (doc_id, n_tokens) rows (16 bytes/doc —
    the text never shuffles); (2) ``Dataset.sort`` range-partitions by
    doc_id (ordered blocks, pinned by the cross-block monotonicity test);
    (3) per-block token totals are computed remotely and only the P block
    totals reach the driver for the exclusive prefix; (4) one remote task
    per block adds its offset — ``from_arrow_refs`` re-enters the Dataset
    API.  Output: ``doc_id, n_tokens, start_tok, first_seq, last_seq``
    (empty docs occupy zero tokens: first_seq == last_seq == the sequence
    at their offset).
    """
    import ray
    import ray.data as rd

    def count_block(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_TOKEN_PAT), pa.int64()
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    counts = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_block, batch_format="pyarrow"
    )
    if num_blocks:  # test knob: force a true multi-block prefix (small
        # inputs otherwise collapse to one sorted block)
        counts = counts.repartition(num_blocks)
    sorted_mat = counts.sort("doc_id").materialize()
    refs = [
        ref
        for bundle in sorted_mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("start_tok", pa.int64()), ("first_seq", pa.int64()),
                 ("last_seq", pa.int64())]
            ).empty_table()
        )

    @ray.remote
    def block_total(t: pa.Table) -> int:
        return int(t["n_tokens"].to_numpy(zero_copy_only=False).sum())

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)

    @ray.remote
    def finish(t: pa.Table, off: int) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        start = off + np.cumsum(n) - n
        first = start // seq_len
        last = np.where(n > 0, (start + n - 1) // seq_len, first)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
            }
        )

    return rd.from_arrow_refs(
        [finish.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def token_pmi_pairs(sf_dir: str, min_count: int = 5, k: int = 20):
    """Phrase mining: top-``k`` adjacent token pairs by PMI-proportional lift
    ``c_xy · N / (c_x · c_y)`` (word2phrase-style collocation detection —
    the phrase-vocabulary induction step of tokenizer/corpus prep).  The
    lift is an exact rational (integer numerator / integer denominator, one
    IEEE division), so ranking AND values hash-match SQL; ``min_count``
    prunes rare-pair noise.

    Distributed shape — vocabulary-bounded throughout, no broadcast of any
    count table: per-block unigram AND bigram ``value_counts`` partials ride
    ONE tagged stream; attaching the two unigram counts to each bigram is
    two word-keyed hash partitions (partials for a word co-locate, so a
    local sum IS the global count — the same transform-attach pattern as
    ``top_terms_docs``); the top-k rides bounded per-block partials.
    """
    import pandas as pd

    from ..functions.groupagg import global_topk
    from ..state.partitioning import key_partitioned, materialize_clean

    docs = _read_docs(sf_dir, ["text"])

    part_schema = pa.schema(
        [("w", pa.string()), ("other", pa.string()), ("c", pa.int64()),
         ("is_uni", pa.bool_())]
    )

    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return part_schema.empty_table()
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        blank = pc.equal(trimmed, pa.scalar("")).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        keep = ~blank[row_idx]
        words = flat.filter(pa.array(keep))
        uni = pc.value_counts(words)
        out_w = [uni.field("values")]
        out_o = [pa.nulls(len(uni), pa.string())]
        out_c = [pc.cast(uni.field("counts"), pa.int64())]
        out_u = [pa.array(np.ones(len(uni), bool))]
        if len(flat) >= 2:
            same = keep[1:] & keep[:-1] & (row_idx[1:] == row_idx[:-1])
            w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
            w2 = flat.slice(1).filter(pa.array(same))
            grams = pc.binary_join_element_wise(w1, w2, " ")
            bvc = pc.value_counts(grams)
            if len(bvc):
                pair = pc.split_pattern(bvc.field("values"), pattern=" ")
                out_w.append(pc.list_element(pair, 0))
                out_o.append(pc.list_element(pair, 1))
                out_c.append(pc.cast(bvc.field("counts"), pa.int64()))
                out_u.append(pa.array(np.zeros(len(bvc), bool)))
        return pa.table(
            {
                "w": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_w]),
                "other": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_o]),
                "c": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_c]),
                "is_uni": pa.concat_arrays([a for a in out_u]),
            },
            schema=part_schema,
        )

    parts = materialize_clean(docs.map_batches(partials, batch_format="pyarrow"))

    # total token occurrences: per-block unigram-count sums, driver gets ints
    nu_rows = parts.map_batches(
        lambda t: pa.table(
            {"s": pa.array(
                [int(t.filter(t["is_uni"])["c"].to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_u = int(nu_rows["s"].sum()) if not nu_rows.empty else 0

    def attach(col_out: str):
        """Word-keyed partition pass: local unigram sum -> attach to bigram
        rows keyed by this word; re-tags bigram rows keyed by `other` for
        the next pass (after pass 1, w holds w2 and other holds w1)."""

        def block(df: "pd.DataFrame") -> "pd.DataFrame":
            if df.empty:
                df = df.copy()
                df[col_out] = pd.Series([], dtype=np.int64)
                return df
            uni = df[df["is_uni"]].groupby("w", sort=False)["c"].sum()
            bg = df[~df["is_uni"]].copy()
            bg[col_out] = bg["w"].map(uni).fillna(0).astype(np.int64)
            return bg

        return block

    # pass 1: keyed by w1 -> attach c_x; swap keys; pass 2: keyed by w2
    p1 = key_partitioned(parts, ["w"]).map_batches(
        attach("c_x"), batch_format="pandas", batch_size=None
    )

    def swap(t: pa.Table) -> pa.Table:
        return pa.table(
            {"w": t["other"], "other": t["w"], "c": t["c"],
             "is_uni": t["is_uni"], "c_x": t["c_x"]}
        )

    def _uni_retag(t: pa.Table) -> pa.Table:
        f = t.filter(t["is_uni"])
        return f.append_column("c_x", pa.array(np.zeros(f.num_rows, np.int64)))

    uni_again = parts.map_batches(_uni_retag, batch_format="pyarrow")
    p2_in = p1.map_batches(swap, batch_format="pyarrow").union(uni_again)

    def block2(df: "pd.DataFrame") -> pa.Table:
        out_schema = pa.schema(
            [("gram", pa.string()), ("c_xy", pa.int64()), ("c_x", pa.int64()),
             ("c_y", pa.int64()), ("lift", pa.float64())]
        )
        if df.empty:
            return out_schema.empty_table()
        uni = df[df["is_uni"]].groupby("w", sort=False)["c"].sum()
        bg = df[~df["is_uni"]]
        if bg.empty:
            return out_schema.empty_table()
        # bigram partials for one (w1, w2) may arrive from several blocks:
        # both count columns are per-occurrence partials -> sum c, while c_x
        # is already the global unigram count (identical on every partial)
        g = bg.groupby(["other", "w"], sort=False).agg(
            c_xy=("c", "sum"), c_x=("c_x", "max")
        ).reset_index()
        g = g[g["c_xy"] >= min_count]
        if g.empty:
            return out_schema.empty_table()
        c_y = g["w"].map(uni).fillna(0).astype(np.int64).to_numpy()
        c_xy = g["c_xy"].to_numpy()
        c_x = g["c_x"].to_numpy()
        lift = (c_xy * n_u).astype(np.float64) / (c_x * c_y).astype(np.float64)
        return pa.table(
            {
                "gram": pa.array(
                    (g["other"] + " " + g["w"]).tolist(), pa.string()
                ),
                "c_xy": pa.array(c_xy, pa.int64()),
                "c_x": pa.array(c_x, pa.int64()),
                "c_y": pa.array(c_y, pa.int64()),
                "lift": pa.array(lift, pa.float64()),
            },
            schema=out_schema,
        )

    scored = key_partitioned(p2_in, ["w"]).map_batches(
        block2, batch_format="pandas", batch_size=None
    )
    return global_topk(scored, ["lift", "gram"], [True, False], k)


def source_report(sf_dir: str):
    """Per-SOURCE corpus report card — the per-domain census curation teams
    read before setting mixing weights: doc counts, blank counts, token and
    char mass, and how many of the source's docs are corpus-wide exact
    duplicates (raw-text md5 occurring more than once ANYWHERE, i.e.
    cross-source copies count).

    One fingerprint-keyed hash partition (group size there IS the global
    copy count — the transform-attach pattern), then a low-cardinality
    source combine.  All outputs exact integers.
    """
    import hashlib

    import pandas as pd

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import key_partitioned

    def prep(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hex_column

        texts = batch["text"]
        fps = md5_hex_column(
            texts if isinstance(texts, pa.Array) else pc.cast(texts, pa.string())
        )
        blank = pc.equal(pc.utf8_trim_whitespace(texts), pa.scalar(""))
        ntok = pc.cast(
            pc.count_substring_regex(texts, pattern=_TOKEN_PAT), pa.int64()
        )
        return pa.table(
            {
                "h": fps,
                "source": batch["source"],
                "blank": pc.cast(blank, pa.int64()),
                "ntok": ntok,
                "n_chars": batch["n_chars"],
            }
        )

    rows = _read_docs(sf_dir, ["text", "source", "n_chars"]).map_batches(
        prep, batch_format="pyarrow"
    )

    def mark_dups(df: "pd.DataFrame") -> pa.Table:
        schema = pa.schema(
            [("source", pa.string()), ("blank", pa.int64()),
             ("ntok", pa.int64()), ("n_chars", pa.int64()),
             ("is_dup", pa.int64())]
        )
        if df.empty:
            return schema.empty_table()
        size = df.groupby("h", sort=False)["h"].transform("size")
        return pa.table(
            {
                "source": pa.array(df["source"].tolist(), pa.string()),
                "blank": pa.array(df["blank"].to_numpy(), pa.int64()),
                "ntok": pa.array(df["ntok"].to_numpy(), pa.int64()),
                "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
                "is_dup": pa.array(
                    (size.to_numpy() > 1).astype(np.int64), pa.int64()
                ),
            },
            schema=schema,
        )

    marked = key_partitioned(rows, ["h"]).map_batches(
        mark_dups, batch_format="pandas", batch_size=None
    )
    return lowcard_groupagg(
        marked,
        ["source"],
        [([], "count_all"), ("blank", "sum"), ("ntok", "sum"),
         ("n_chars", "sum"), ("is_dup", "sum")],
        {"count_all": "n_docs", "blank_sum": "n_blank",
         "ntok_sum": "sum_tokens", "n_chars_sum": "sum_chars",
         "is_dup_sum": "n_dup_docs"},
    )


def quality_percentile_docs(sf_dir: str):
    """Corpus-wide QUALITY PERCENTILE attach — the "drop the bottom X% by
    quality" primitive of curation pipelines, here over token counts: every
    doc gets its exact ``percent_rank`` (min-rank tie semantics,
    ``(rank-1)/(N-1)`` — one IEEE division of integers) and a low/mid/high
    band on the 10th/90th boundaries.

    Two-phase distributed CDF: a domain-bounded token-count histogram (one
    keyed combine over distinct counts — vocabulary-of-values sized, not
    corpus sized) comes back to the driver as (value, n) rows, the
    cumulative "docs strictly below" map broadcasts once, and one streamed
    pass attaches ranks — the corpus itself never shuffles.
    """
    import ray

    from ..functions.groupagg import highcard_groupagg

    def tokrows(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_TOKEN_PAT), pa.int64()
        )
        return pa.table({"doc_id": batch["doc_id"], "ntok": n})

    from ..state.partitioning import materialize_clean

    # the tiny (doc_id, ntok) table feeds BOTH the histogram and the attach
    # pass — materialize it once so the text scan + tokenize run once
    docs = materialize_clean(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            tokrows, batch_format="pyarrow"
        )
    )

    hist = highcard_groupagg(
        docs.map_batches(
            lambda t: pa.table({"ntok": t["ntok"]}), batch_format="pyarrow"
        ),
        ["ntok"],
        [([], "count_all")],
        {"count_all": "n"},
    ).to_pandas().sort_values("ntok")
    n_total = int(hist["n"].sum())
    below = np.concatenate([[0], np.cumsum(hist["n"].to_numpy())[:-1]]).astype(np.int64)
    values = hist["ntok"].to_numpy().astype(np.int64)  # sorted ascending
    lut_ref = ray.put((values, below))
    denom = float(max(n_total - 1, 1))

    def attach(t: pa.Table) -> pa.Table:
        values_, below_ = ray.get(lut_ref)
        ntok = t["ntok"].to_numpy(zero_copy_only=False)
        # every ntok is present in the histogram: one vectorized searchsorted
        low = below_[np.searchsorted(values_, ntok)]
        pr = low.astype(np.float64) / denom
        band = np.where(pr < 0.1, "low", np.where(pr < 0.9, "mid", "high"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["ntok"],
                "pct_rank": pa.array(pr, pa.float64()),
                "quality_band": pa.array(band.tolist(), pa.string()),
            }
        )

    return docs.map_batches(attach, batch_format="pyarrow")


def vocab_coverage(sf_dir: str):
    """Head-vocabulary COVERAGE curve — the tokenizer-budget question "how
    many distinct words cover 50/90/99% of all token occurrences?".  All
    boundaries are exact integer comparisons (cum*100 >= total*pct), so the
    single output row hash-matches SQL.

    Distributed part: per-block ``value_counts`` partials -> one
    vocabulary-keyed combine (exchange bounded by vocabulary size, not
    corpus size).  The ranked cumulative walk happens on the collected
    vocabulary table — bounded by |vocab|, documented as the driver-side
    term (the same bound ``top_ngrams_corpus`` rides); for 1e9+ vocabularies
    the upgrade path is a distributed sort + prefix pass like
    ``pack_sequences_docs``.
    """
    import ray.data as rd

    docs = _read_docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        if len(flat) == 0:
            return pa.table(
                {"w": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(flat)
        return pa.table(
            {"w": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    totals = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
        .to_pandas()  # vocabulary-bounded
    )
    if totals.empty:
        return rd.from_items(
            [{"n_words": 0, "n_distinct_words": 0, "v50": 0, "v90": 0, "v99": 0}]
        )
    totals = totals.sort_values(["n", "w"], ascending=[False, True], kind="mergesort")
    c = totals["n"].to_numpy()
    cum = np.cumsum(c)
    total = int(cum[-1])
    out = {"n_words": total, "n_distinct_words": int(len(c))}
    for pct in (50, 90, 99):
        out[f"v{pct}"] = int(np.searchsorted(cum * 100, total * pct) + 1)
    return rd.from_items([out])


def bpe_merge_candidates(sf_dir: str, k: int = 20):
    """Tokenizer induction, step one: the top-``k`` most frequent ADJACENT
    CHARACTER pairs inside words — exactly the first merge candidates a BPE
    trainer scores (Sennrich et al., public knowledge).

    The combiner is a FIXED-SIZE count table (the sketch-free analogue of
    ``event_type_counts_cms``): each block folds all its within-token byte
    pairs into one 65,536-cell bincount (first byte * 256 + second byte) —
    64 KiB per block regardless of rows — tables sum on the driver, and the
    top-k reads straight off the table.  Fully vectorized: one joined-bytes
    view + two shifted slices per batch, no per-token Python.  ASCII corpus
    assumption (codepoints == bytes, validated by ``validate_docs``) —
    the same basis ``media_chunk_dedup`` documents.
    """
    import ray.data as rd

    docs = _read_docs(sf_dir, ["text"])

    def table_partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        norm = pc.replace_substring_regex(trimmed, pattern=r"\s+", replacement=" ")
        joined = " ".join(norm.to_pylist()) if batch.num_rows else ""
        b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
        if len(b) < 2:
            counts = np.zeros(65536, dtype=np.int64)
        else:
            first, second = b[:-1], b[1:]
            ok = (first != 32) & (second != 32)  # exclude cross-token pairs
            key = first[ok].astype(np.int64) * 256 + second[ok]
            counts = np.bincount(key, minlength=65536).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    rows = docs.map_batches(table_partial, batch_format="pyarrow").to_pandas()
    total = np.zeros(65536, dtype=np.int64)
    for payload in rows["counts"]:
        total += np.frombuffer(payload, dtype=np.int64)
    nz = np.flatnonzero(total)
    pairs = [chr(i // 256) + chr(i % 256) for i in nz]
    import pandas as pd

    df = pd.DataFrame({"pair": pairs, "n": total[nz]})
    df = df.sort_values(["n", "pair"], ascending=[False, True], kind="mergesort").head(k)
    return rd.from_pandas(df.reset_index(drop=True))


class _PostingsBuilder:
    """Actor-pool postings tokenizer shared by the full index build and
    incremental :func:`term_index_upsert` (ONE tokenization definition, so
    maintained indexes stay bit-compatible with rebuilds)."""

    def __init__(self, n_buckets: int):
        from ..functions.hashing import TokenHasher

        self.n_buckets = n_buckets
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32()),
                "bucket_v": pa.array([], pa.int32()),
            }
        )
        if n == 0:
            return empty
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "term": flat,
                "doc_id": pa.array(doc_ids[row_idx], pa.int64()),
            }
        ).filter(pc.not_equal(flat, pa.scalar("")))
        if tbl.num_rows == 0:
            return empty
        agg = tbl.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        terms_py = agg["term"].to_pylist()
        # hash only the block's (already unique-per-doc) terms; the
        # TokenHasher cache amortizes blake2b across the actor lifetime
        h = self.hasher.hash_tokens(terms_py)
        bucket = (h % np.uint64(self.n_buckets)).astype(np.int32)
        return pa.table(
            {
                "term": agg["term"],
                "doc_id": pc.cast(agg["doc_id"], pa.int64()),
                "tf": pc.cast(agg["count_all"], pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
                "bucket_v": pa.array(bucket, pa.int32()),
            }
        )


def build_term_index(sf_dir: str, index_dir: str, n_buckets: int = 64) -> dict:
    """PERSISTED INVERTED INDEX: (term, doc_id, tf) postings written as
    parquet partitioned by ``bucket = blake2b64(term) % n_buckets`` (hive
    layout ``postings/bucket=N/``) — the lexical-search counterpart of the
    storage-pruning family (:func:`~..pipelines.ann.build_ivf_index` hash
    cells, ``sources/io`` range zone-maps and hive categories).  A query for
    ``|terms|`` terms lists and reads ONLY those terms' bucket directories:
    at 100 TB the scan cost drops from the whole corpus to
    ``~|terms|/n_buckets`` of the postings at the STORAGE layer.

    Tokenization matches :func:`keyword_search_docs` exactly (whitespace
    split of trimmed text); per-(doc, term) tf is block-local because each
    document is one row.  Layout: ``{index_dir}/postings/bucket=N/*.parquet``
    (term, doc_id, tf, bucket_v) + ``manifest.json`` (n_docs for the idf
    numerator, n_buckets, buckets_written).  Returns the manifest dict.

    Reference parity: the build/refresh of the server's in-memory feature
    index (``ndd/server_ndd.py:244-265``) as a persisted, partition-pruned
    artifact instead of a resident matrix.
    """
    import json
    import os
    import shutil

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()
    all_ids = [
        int(v)
        for b in docs.select_columns(["doc_id"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        for v in b["doc_id"].to_pylist()
    ]

    post_dir = os.path.join(index_dir, "postings")
    # a rebuild must not mix stale buckets with new ones (write_parquet
    # appends UUID-named files)
    if os.path.isdir(post_dir):
        shutil.rmtree(post_dir)
    os.makedirs(post_dir, exist_ok=True)
    docs.map_batches(
        _PostingsBuilder, fn_constructor_kwargs={"n_buckets": n_buckets},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    ).write_parquet(post_dir, partition_cols=["bucket"])
    _write_term_index_registry(index_dir, all_ids)
    manifest = {
        "n_docs": int(n_docs),
        "n_buckets": int(n_buckets),
        "corpus_fingerprint": _corpus_fingerprint(sf_dir),
        "buckets_written": sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(post_dir)
            if d.startswith("bucket=")
        ),
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _corpus_fingerprint(sf_dir: str) -> str:
    """Cheap source-identity token for index staleness checks: path + size +
    mtime of the documents parquet (a content digest would re-read the
    corpus the index exists to avoid)."""
    import hashlib
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(path)
        raw = f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        raw = os.path.abspath(path)
    return hashlib.md5(raw.encode()).hexdigest()


def keyword_search_indexed(sf_dir: str, terms: tuple = ("spark", "window", "hash"),
                           k: int = 10, index_dir: str | None = None,
                           n_buckets: int = 64, _stats: dict | None = None,
                           tombstone_root: str | None = None):
    """Ranked lexical search over a :func:`build_term_index` artifact —
    OUTPUT-IDENTICAL to the streaming :func:`keyword_search_docs` (same
    exact-rational tf-idf, same tie order, SAME DuckDB oracle), but the scan
    touches only the query terms' bucket directories: un-probed partitions
    are never listed, opened, or shipped.

    The index is (re)built when missing; pass ``index_dir`` to reuse a
    prebuilt artifact across queries.  ``_stats`` (tests) receives
    ``probed_buckets`` / ``total_buckets``.
    """
    import json
    import os

    from ..functions.groupagg import global_topk
    from ..functions.hashing import hash_token
    from ..state.partitioning import key_partitioned, materialize_clean

    terms = list(terms)
    auto_dir = index_dir is None
    if index_dir is None:
        safe = sf_dir.strip("/").replace("/", "_")
        index_dir = f"/tmp/ndd_term_index/{safe}_{n_buckets}"
    man_path = os.path.join(index_dir, "manifest.json")
    stale = True
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if auto_dir:
            # the /tmp cache must never silently serve a changed corpus
            stale = (
                man.get("corpus_fingerprint") != _corpus_fingerprint(sf_dir)
                or man.get("n_buckets") != n_buckets
            )
        else:
            # an explicit index_dir is the caller's artifact (possibly
            # incrementally maintained via term_index_upsert/delete whose
            # fingerprint is intentionally source-detached) — trust it
            stale = man.get("n_buckets") != n_buckets
    if stale:
        # missing OR built from different data/config: rebuild — a cached
        # index must never silently serve results for a changed corpus
        build_term_index(sf_dir, index_dir, n_buckets=n_buckets)
    with open(man_path) as f:
        man = json.load(f)
    n_docs = int(man["n_docs"])

    want = sorted({hash_token(t) % man["n_buckets"] for t in terms})
    written = set(man["buckets_written"])
    bucket_dirs = [
        os.path.join(index_dir, "postings", f"bucket={b}")
        for b in want
        if b in written
    ]
    paths = [
        os.path.join(d, f)
        for d in bucket_dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if _stats is not None:
        _stats["probed_buckets"] = len(bucket_dirs)
        _stats["total_buckets"] = len(man["buckets_written"])

    import ray.data as rd

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_hit_terms", pa.int64()),
         ("score", pa.float64())]
    )
    if not paths:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    term_set = pa.array(terms, pa.string())

    def hits_only(t: pa.Table) -> pa.Table:
        return t.select(["term", "doc_id", "tf"]).filter(
            pc.is_in(t["term"], value_set=term_set)
        )

    hits = rd.read_parquet(paths).map_batches(hits_only, batch_format="pyarrow")
    if tombstone_root is not None:
        # compliance guard (round-3 verdict item #8): a persisted index can
        # hold postings for since-forgotten docs; the reader anti-filters
        # them so no query ever returns a tombstoned doc_id.  Corpus-level
        # stats (n_docs) reflect the index build until a rebuild/delete.
        from ..stages.tombstone import apply_tombstones

        hits = apply_tombstones(hits, tombstone_root, id_column="doc_id")
    postings = materialize_clean(hits)
    if postings.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    # per-term document frequencies: one tiny partial row per block
    def df_partial(t: pa.Table) -> pa.Table:
        tm = t["term"]
        return pa.table(
            {
                f"c{i + 1}": pa.array(
                    [int(pc.sum(pc.cast(pc.equal(tm, pa.scalar(term)),
                                        pa.int64())).as_py() or 0)],
                    pa.int64(),
                )
                for i, term in enumerate(terms)
            }
        )

    df_rows = postings.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    dfs = [int(df_rows[f"c{i + 1}"].sum()) for i in range(len(terms))]
    eff = np.array([d if d > 0 else 1 for d in dfs], dtype=np.int64)
    den = int(np.prod(eff))
    coef = {t: int(n_docs * (den // e)) for t, e in zip(terms, eff)}

    def score_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        num_row = np.zeros(t.num_rows, dtype=np.int64)
        for term in terms:
            m = pc.equal(t["term"], pa.scalar(term)).to_numpy(zero_copy_only=False)
            num_row[m] = tf[m] * coef[term]
        part = pa.table(
            {"doc_id": t["doc_id"], "num": pa.array(num_row, pa.int64())}
        ).group_by(["doc_id"]).aggregate([("num", "sum"), ([], "count_all")])
        return pa.table(
            {
                "doc_id": pc.cast(part["doc_id"], pa.int64()),
                "n_hit_terms": pc.cast(part["count_all"], pa.int64()),
                "score": pa.array(
                    part["num_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
                    / float(den),
                    pa.float64(),
                ),
            }
        )

    # a doc's postings for different terms live in different buckets —
    # co-locate by doc before the pivot
    scored = key_partitioned(postings, ["doc_id"]).map_batches(
        score_block, batch_format="pyarrow", batch_size=None
    )
    return global_topk(scored, ["score", "doc_id"], [True, False], k)


def lang_confusion(sf_dir: str):
    """LABEL-QUALITY CONFUSION MATRIX: declared ``lang`` metadata crossed
    with the stopword-voting prediction of :func:`lang_id_docs` — the
    standard audit of a metadata column against a content-derived signal
    (disagreement cells flag mislabeled or code-switched sources before a
    language filter drops good data).

    One batch map attaches the vectorized prediction next to the declared
    label (no join — both live on the same row), then the (lang, pred) cell
    counts fold via the low-cardinality combiner.  Output:
    ``lang, lang_pred, n_docs``.
    """
    from ..functions.groupagg import lowcard_groupagg

    def fn(batch: pa.Table) -> pa.Table:
        pred = _lang_pred_arr(batch["text"], batch.num_rows)
        return pa.table(
            {
                "lang": batch["lang"],
                "lang_pred": pa.array(pred.tolist(), pa.string()),
            }
        )

    cells = _read_docs(sf_dir, ["lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return lowcard_groupagg(
        cells, ["lang", "lang_pred"], [([], "count_all")],
        {"count_all": "n_docs"},
    )


def checksum_docs(sf_dir: str):
    """ORDER-INSENSITIVE TABLE CHECKSUM (anti-entropy): one row with the
    exact row count and the 63-bit XOR of every document's content hash —
    the cheap equality certificate two replicas / two pipeline stages
    exchange to prove a 100-TB table survived a copy, a compaction or a
    re-partition bit-for-bit, without moving any data.

    Thin wrapper over ``sources/io.parquet_checksum`` (the single home of
    the md5/mask derivation; SQL parity documented there — the oracle
    recomputes via ``bit_xor(md5_number_lower(text) & (2^63 - 1))``).
    """
    import ray.data as rd

    from ..sources.io import parquet_checksum

    return rd.from_items([parquet_checksum(f"{sf_dir}/documents.parquet", "text")])


def encode_docs(sf_dir: str, vocab_size: int = 512):
    """TOKENIZER APPLY: build a top-``vocab_size`` frequency vocabulary
    (rank by count DESC, token ASC — deterministic ties) and re-emit every
    document as its space-joined token-id sequence (OOV -> 0) — the
    vocabulary-encode step between corpus prep and sequence packing
    (:func:`pack_sequences_docs` counts tokens; this materializes the ids).

    Two scale-shaped passes: (1) vocabulary = per-block token-count
    partials -> one token-keyed combine -> bounded ``global_topk`` (the
    corpus never ships raw tokens twice); (2) encoding broadcasts the tiny
    id table once and runs ONE vectorized ``pc.index_in`` per batch; the
    id string rebuilds through Arrow list offsets + ``binary_join_element_
    wise`` — no Python per row.  Output: ``doc_id, n_tok, ids`` (ids = ''
    for blank docs).
    """
    import ray

    from ..functions.groupagg import global_topk, highcard_groupagg

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        tbl = pa.table({"tok": flat}).filter(pc.not_equal(flat, pa.scalar("")))
        agg = tbl.group_by(["tok"]).aggregate([([], "count_all")])
        return agg.rename_columns(["tok", "cnt"])

    counts = highcard_groupagg(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        ["tok"], [("cnt", "sum")], {"cnt_sum": "cnt"},
    )
    vocab = (
        global_topk(counts, ["cnt", "tok"], [True, False], vocab_size)
        .to_pandas()
        .reset_index(drop=True)
    )
    # id = 1-based frequency rank; OOV encodes as 0
    vocab_arr = pa.array(vocab["tok"].tolist(), pa.string())
    vocab_ref = ray.put(vocab_arr)

    def encode(batch: pa.Table) -> pa.Table:
        varr = ray.get(vocab_ref)
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+").combine_chunks()
        flat = pc.list_flatten(toks)
        idx = pc.index_in(flat, value_set=varr)
        ids = pc.add(pc.fill_null(pc.cast(idx, pa.int64()), -1), 1)
        ids_str = pc.cast(ids, pa.string())
        if isinstance(ids_str, pa.ChunkedArray):
            ids_str = ids_str.combine_chunks()
        offsets = toks.offsets
        id_list = pa.ListArray.from_arrays(offsets, ids_str)
        joined = pc.binary_join(id_list, pa.scalar(" "))
        n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
        blank = pc.equal(trimmed, pa.scalar(""))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pc.if_else(blank, pa.scalar(0, pa.int64()), n_tok),
                "ids": pc.if_else(blank, pa.scalar("", pa.string()), joined),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")


def _term_index_registry(index_dir: str):
    import os

    import pyarrow.parquet as pq

    path = os.path.join(index_dir, "doc_ids.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path)["doc_id"].to_numpy(zero_copy_only=False)


def _write_term_index_registry(index_dir: str, ids) -> None:
    import os

    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(ids, dtype=np.int64))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        os.path.join(index_dir, "doc_ids.parquet"),
    )


def term_index_delete(index_dir: str, doc_ids, _refresh: bool = True) -> int:
    """Evict documents from a persisted inverted index (D4 parity, the
    vanished-video eviction of ``ndd/server_ndd.py:246-261``): every bucket
    file's ``doc_id`` column is membership-tested (column-pruned read) and
    only files that actually contain evicted postings rewrite.  The doc-id
    REGISTRY (``doc_ids.parquet`` sidecar) keeps ``n_docs`` — the idf
    numerator — exact across maintenance.  Returns postings removed."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    want = np.unique(np.asarray([int(d) for d in doc_ids], dtype=np.int64))
    post_dir = os.path.join(index_dir, "postings")
    removed = 0
    for f in glob.glob(os.path.join(post_dir, "bucket=*", "*.parquet")):
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy(
            zero_copy_only=False
        )
        mask = np.isin(ids, want)
        if not mask.any():
            continue
        t = pq.read_table(f)
        keep = t.filter(pa.array(~mask))
        removed += int(mask.sum())
        if keep.num_rows:
            pq.write_table(keep, f)
        else:
            os.remove(f)
    for d in glob.glob(os.path.join(post_dir, "bucket=*")):
        if not os.listdir(d):
            os.rmdir(d)
    if _refresh:
        reg = _term_index_registry(index_dir)
        if reg is not None:
            _write_term_index_registry(index_dir, reg[~np.isin(reg, want)])
        _refresh_term_index_manifest(index_dir)
    return removed


def term_index_upsert(index_dir: str, docs) -> dict:
    """Incrementally ingest (doc_id, text) rows into a persisted inverted
    index (T3 parity, ``update_index``'s refresh-changed + add-new,
    ``ndd/server_ndd.py:227-257``): incoming ids are evicted first
    (last-writer-wins), postings append through the same PostingsBuilder
    actor pool the full build uses (one shared tokenization — index
    equality with a rebuild is pinned in tests), and the registry/manifest
    refresh keeps ``n_docs`` exact.  Returns the refreshed manifest."""
    import os

    ids = [
        int(v)
        for b in docs.select_columns(["doc_id"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        for v in b["doc_id"].to_pylist()
    ]
    term_index_delete(index_dir, ids, _refresh=False)

    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    post_dir = os.path.join(index_dir, "postings")
    docs.map_batches(
        _PostingsBuilder,
        fn_constructor_kwargs={"n_buckets": man["n_buckets"]},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    ).write_parquet(post_dir, partition_cols=["bucket"])

    reg = _term_index_registry(index_dir)
    merged = np.concatenate(
        [reg if reg is not None else np.array([], np.int64),
         np.asarray(ids, np.int64)]
    )
    _write_term_index_registry(index_dir, merged)
    return _refresh_term_index_manifest(index_dir)


def _refresh_term_index_manifest(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    post_dir = os.path.join(index_dir, "postings")
    man["buckets_written"] = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(post_dir)
        if d.startswith("bucket=") and os.listdir(os.path.join(post_dir, d))
    )
    reg = _term_index_registry(index_dir)
    if reg is not None:
        man["n_docs"] = int(len(reg))
    # maintenance invalidates the whole-corpus fingerprint on purpose: the
    # index no longer mirrors any single source file
    man["corpus_fingerprint"] = f"maintained:{man['n_docs']}"
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    return man


def unigram_logprob_docs(sf_dir: str):
    """Corpus UNIGRAM-LM document scoring — the classic perplexity-style
    quality filter (a doc of globally-common tokens scores near 0; rare-token
    noise scores very negative): ``avg_logprob = mean_t ln(count(t) / N)``
    over the corpus's own unigram distribution.

    Two keyed stages, no driver vocabulary: (1) per-block (doc, term, tf)
    partials (C-level pandas groupby over the flattened Arrow token lists);
    (2) ONE term-keyed partition where each term's global count is the local
    sum — every (doc, term) row picks up ``tf * ln(c)`` right there; (3) ONE
    doc-keyed partition sums the contributions.  The global token total N is
    an integer fold over the bounded per-doc table (materialized — it is the
    output-sized table, not the corpus), so only ``- ln N`` shifts the score
    at the end.  Output: ``doc_id, n_tokens, avg_logprob`` for every non-empty
    doc; same algebraic form as the SQL oracle (sum(tf*ln c)/n - ln N)."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_block(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        schema = pa.schema(
            [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
        )
        if batch.num_rows == 0:
            return schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        )
        row_idx, _ = _token_row_index(toks, batch.num_rows)
        d = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[row_idx],
                "term": pc.list_flatten(toks).to_pandas(),
            }
        )
        out = d.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(out["term"].tolist(), pa.string()),
                "tf": pa.array(out["tf"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    def attach_contrib(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "tf": pd.Series([], dtype=np.int64),
                 "contrib": pd.Series([], dtype=np.float64)}
            )
        df = df.copy()
        c = df.groupby("term", sort=False)["tf"].transform("sum")
        df["contrib"] = df["tf"].to_numpy() * np.log(c.to_numpy().astype(np.float64))
        return df[["doc_id", "tf", "contrib"]]

    per_doc_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("s", pa.float64())]
    )

    def per_doc(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return per_doc_schema.empty_table()
        g = df.groupby("doc_id", sort=False).agg(
            n_tokens=("tf", "sum"), s=("contrib", "sum")
        )
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(), pa.int64()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(), pa.int64()),
                "s": pa.array(g["s"].to_numpy(), pa.float64()),
            },
            schema=per_doc_schema,
        )

    tf = docs.map_batches(tf_block, batch_format="pyarrow")
    contrib = key_partitioned(tf, ["term"]).map_batches(
        attach_contrib, batch_format="pandas", batch_size=None
    )
    doc_tbl = key_partitioned(contrib, ["doc_id"]).map_batches(
        per_doc, batch_format="pandas", batch_size=None
    ).materialize()
    n_total = int(doc_tbl.sum("n_tokens") or 0)
    ln_n = float(np.log(n_total)) if n_total else 0.0

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                # rounded to 8 decimals on BOTH sides: exact-dup docs have
                # identical token multisets, so last-ulp summation noise
                # would otherwise flip the hash's row sort on their ties
                "avg_logprob": pa.array(np.round(s / n - ln_n, 8), pa.float64()),
            }
        )

    return doc_tbl.map_batches(finish, batch_format="pyarrow")


def bottomk_sample_docs(sf_dir: str, k: int = 25):
    """Deterministic UNIFORM bottom-k sample — the fixed-SIZE sibling of the
    fixed-RATE ``sample_docs``: keep the ``k`` docs with the smallest
    ``md5_low64(str(doc_id))`` (doc_id tiebreak).  Hash-ordered, so the
    selected set is independent of partitioning and parallelism, stable
    under corpus APPEND ONLY up to the usual bottom-k churn (each new doc
    evicts at most one), and mergeable: per-block local bottom-k partials
    (bounded k rows each) fold to the global answer — the top-k-sketch
    pattern, never a global sort.  SQL parity via DuckDB
    ``md5_number_lower`` (bit-identical basis, hashing.py)."""
    import ray.data as rd

    from ..functions.hashing import md5_low64

    docs = _read_docs(sf_dir, ["doc_id", "lang", "n_chars", "source"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("sample_key", pa.array([], pa.uint64()))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = np.fromiter(
            (md5_low64(str(int(d))) for d in ids), np.uint64, len(ids)
        )
        order = np.lexsort((ids, keys))[:k]
        return t.take(pa.array(order)).append_column(
            "sample_key", pa.array(keys[order], pa.uint64())
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sample_key", "doc_id"], kind="mergesort").head(k)
    return pa.table(
        {
            "doc_id": pa.array(parts["doc_id"].to_numpy(), pa.int64()),
            "lang": pa.array(parts["lang"].tolist(), pa.string()),
            "n_chars": pa.array(parts["n_chars"].to_numpy(), pa.int64()),
            "source": pa.array(parts["source"].tolist(), pa.string()),
        }
    )


def lexical_diversity_docs(sf_dir: str):
    """Type-token ratio per document — the classic lexical-diversity quality
    signal (template/spam text repeats a tiny vocabulary; TTR near 1 means
    every token is fresh).  One vectorized block pass: whitespace tokens per
    row from the Arrow list offsets, per-row distinct via ONE pandas
    drop_duplicates over (row, token) — docs never straddle blocks at the
    read, so no shuffle at all.  Output: ``doc_id, n_tokens,
    n_distinct_tokens, ttr`` (one IEEE division) for non-empty docs."""
    import pandas as pd

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("n_distinct_tokens", pa.int64()), ("ttr", pa.float64())]
    )

    def block(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        if batch.num_rows == 0:
            return schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        )
        row_idx, lens = _token_row_index(toks, batch.num_rows)
        d = pd.DataFrame(
            {"row": row_idx, "term": pc.list_flatten(toks).to_pandas()}
        )
        distinct = (
            d.drop_duplicates().groupby("row", sort=True).size()
        )
        n_tok = lens.astype(np.int64)
        n_dist = np.zeros(batch.num_rows, dtype=np.int64)
        n_dist[distinct.index.to_numpy()] = distinct.to_numpy()
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct_tokens": pa.array(n_dist, pa.int64()),
                "ttr": pa.array(n_dist / n_tok, pa.float64()),
            },
            schema=schema,
        )

    return docs.map_batches(block, batch_format="pyarrow")


_SENT_END_PAT = r"[.!?]+"


def sentence_stats_docs(sf_dir: str):
    """Sentence-shape census per document: terminal-punctuation runs
    (``[.!?]+``, RE2 on both sides) approximate sentence ends — a doc with
    zero enders and 10k chars is a list/table dump, not prose; mean chars
    per sentence separates telegraphic from run-on text.  Fully vectorized:
    one ``pc.count_substring_regex`` + arithmetic.  Output: ``doc_id,
    n_chars, n_sentences, avg_sentence_chars`` (chars / max(enders, 1))."""
    docs = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def block(batch: pa.Table) -> pa.Table:
        ends = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_SENT_END_PAT),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n_chars = pc.cast(batch["n_chars"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        denom = np.maximum(ends, 1)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_sentences": pa.array(ends, pa.int64()),
                "avg_sentence_chars": pa.array(n_chars / denom, pa.float64()),
            }
        )

    return docs.map_batches(block, batch_format="pyarrow")


def source_length_deciles(sf_dir: str):
    """Per-source DOC-LENGTH DECILES (exact order statistics, DuckDB
    ``quantile_disc`` semantics: the element at 1-based rank ceil(q*n)) —
    the corpus-mix diagnostic read before setting length filters per source.

    ONE source-keyed partition (bounded partials would not help: quantiles
    need the values), then an in-block sort + rank pick — each source's
    lengths sit in one block, the partition key is low-cardinality but the
    per-block work is O(n log n) vectorized numpy.  Skewed sources are fine:
    a block holds one source's int64 lengths only.  Output: ``source,
    decile (1..9), n_chars``."""
    import math

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["source", "n_chars"])

    schema = pa.schema(
        [("source", pa.string()), ("decile", pa.int64()),
         ("n_chars", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        import pandas as pd

        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        rows = []
        for src, g in df.groupby("source", sort=True):
            v = np.sort(g["n_chars"].to_numpy())
            n = len(v)
            for d in range(1, 10):
                rank = max(1, math.ceil(d / 10 * n))
                rows.append((src, d, int(v[rank - 1])))
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "decile": pa.array([r[1] for r in rows], pa.int64()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            },
            schema=schema,
        )

    return key_partitioned(docs, ["source"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def source_mixing_weights(sf_dir: str, alpha: float = 0.5):
    """TEMPERATURE-WEIGHTED data-mixing plan — the standard LLM-corpus
    recipe for upweighting small high-quality sources: source ``i`` with
    ``n_i`` docs samples with probability ``n_i^alpha / sum_j n_j^alpha``
    (alpha=1 is natural mixing, alpha=0 uniform).  Per-source counts fold
    through bounded partials (one row per source per block); the weight
    arithmetic runs on the bounded final table.  Output: ``source, n_docs,
    weight, expected_docs`` (weight * corpus size, the per-source quota a
    sampler enforces)."""
    import pandas as pd

    from ..functions.groupagg import lowcard_groupagg

    docs = _read_docs(sf_dir, ["source"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source"]).aggregate([([], "count_all")])
        return pa.table(
            {"source": g["source"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = lowcard_groupagg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], [("n", "sum")], {"n_sum": "n_docs"},
    ).to_pandas().sort_values("source").reset_index(drop=True)
    n = counts["n_docs"].to_numpy().astype(np.float64)
    total = float(n.sum())
    pw = np.power(n, alpha)
    w = pw / pw.sum()
    return pa.table(
        {
            "source": pa.array(counts["source"].tolist(), pa.string()),
            "n_docs": pa.array(counts["n_docs"].to_numpy(), pa.int64()),
            "weight": pa.array(np.round(w, 8), pa.float64()),
            "expected_docs": pa.array(np.round(w * total, 6), pa.float64()),
        }
    )


def token_length_histogram(sf_dir: str):
    """Corpus-wide histogram of whitespace-token CHARACTER lengths — the
    tokenizer-design census (length-1 spikes mean split artifacts; a heavy
    20+ tail means URLs/base64 junk).  Token lengths come straight off the
    Arrow list offsets (``utf8_length`` on the flattened tokens), fold as
    bounded per-block histogram partials, and finish in the small combiner.
    Output: ``token_len, n_tokens``."""
    from ..functions.groupagg import lowcard_groupagg

    docs = _read_docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        if batch.num_rows == 0:
            return pa.table(
                {"token_len": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
            )
        )
        lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
        u, n = np.unique(lens, return_counts=True)
        return pa.table(
            {"token_len": pa.array(u.astype(np.int64), pa.int64()),
             "n": pa.array(n, pa.int64())}
        )

    return lowcard_groupagg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token_len"], [("n", "sum")], {"n_sum": "n_tokens"},
    )


def zipf_slope_corpus(sf_dir: str, k: int = 1000):
    """Zipf rank-frequency fit over the corpus unigram distribution: OLS of
    ``ln(count)`` on ``ln(rank)`` for the top-``k`` terms (rank order =
    count desc, term asc).  A healthy natural-language corpus fits a slope
    near -1; template/boilerplate-heavy data flattens the head.  The
    distributed part is the two-level unigram count (per-block
    ``value_counts`` combiner, then the vocabulary-sized groupby) and the
    bounded :func:`global_topk` head; the k-row regression itself is driver
    math.  Output one row: ``slope, intercept, r2, n_terms``."""
    from ..functions.groupagg import global_topk

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        text = pc.utf8_trim_whitespace(batch["text"])
        batch = batch.filter(pc.not_equal(text, pa.scalar("")))
        if batch.num_rows == 0:
            return empty
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
            )
        )
        vc = pc.value_counts(toks)
        return pa.table(
            {"term": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    parts = _read_docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
    totals = parts.groupby("term").sum("n").rename_columns({"sum(n)": "n"})
    head = global_topk(totals, ["n", "term"], [True, False], k).to_pandas()
    # head arrives globally sorted by (n desc, term asc) == rank order
    y = np.log(head["n"].to_numpy().astype(np.float64))
    x = np.log(np.arange(1, len(y) + 1, dtype=np.float64))
    xm, ym = x.mean(), y.mean()
    sxx = float(((x - xm) ** 2).sum())
    sxy = float(((x - xm) * (y - ym)).sum())
    syy = float(((y - ym) ** 2).sum())
    slope = sxy / sxx
    intercept = ym - slope * xm
    r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else 1.0
    return pa.table(
        {
            "slope": pa.array([round(slope, 6)], pa.float64()),
            "intercept": pa.array([round(intercept, 6)], pa.float64()),
            "r2": pa.array([round(r2, 6)], pa.float64()),
            "n_terms": pa.array([len(y)], pa.int64()),
        }
    )


def doc_length_gini(sf_dir: str):
    """Gini coefficient of the document-length distribution (`n_chars`) —
    the data-balance census behind "is my corpus a few giant docs plus
    dust?".  Uses the sorted-rank identity
    ``G = sum_i (2i - n - 1) x_(i) / (n * sum x)`` computed EXACTLY from the
    bounded length histogram: per-block ``np.unique`` partials fold to one
    vocabulary-of-lengths table, and the rank sums per equal-value run are
    closed-form (no global sort of the table, tie-invariant).  The final
    arithmetic runs in Python ints on the tiny histogram, so no overflow at
    any scale.  Output one row: ``gini, n_docs, mean_len``."""
    from ..functions.groupagg import lowcard_groupagg

    docs = _read_docs(sf_dir, ["n_chars"])

    def hist_block(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"len": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    hist = lowcard_groupagg(
        docs.map_batches(hist_block, batch_format="pyarrow"),
        ["len"], [("n", "sum")], {"n_sum": "n"},
    ).to_pandas().sort_values("len").reset_index(drop=True)
    lens = [int(v) for v in hist["len"]]
    cnts = [int(v) for v in hist["n"]]
    n = sum(cnts)
    tot = sum(x * c for x, c in zip(lens, cnts))
    num = 0
    start = 1  # 1-based rank of the first item in the current run
    for x, c in zip(lens, cnts):
        # sum_{i=start}^{start+c-1} (2i - n - 1) == 2*(c*start + c*(c-1)/2) - c*(n+1)
        num += (2 * (c * start + c * (c - 1) // 2) - c * (n + 1)) * x
        start += c
    gini = num / (n * tot) if n and tot else 0.0
    return pa.table(
        {
            "gini": pa.array([round(gini, 6)], pa.float64()),
            "n_docs": pa.array([n], pa.int64()),
            "mean_len": pa.array([round(tot / n, 6)], pa.float64()),
        }
    )


def mask_tokens_docs(sf_dir: str, mask_pct: int = 15, token_salt: int = 1009):
    """Deterministic MLM-STYLE TOKEN CORRUPTION — the masked-language-model
    data-prep step: every (doc, position) token is masked with a fixed
    pseudo-random rate using the same affine-permutation arithmetic as
    ``epoch_shuffle_docs`` (``(48271*(doc_id*salt + pos) + 11) mod (2^31-1)
    mod 100 < pct``), so the corruption is reproducible across runs, engines
    and the SQL oracle — no RNG state to ship.

    Fully vectorized and row-local (embarrassingly parallel, zero shuffles):
    one Arrow ``split_pattern``, the mask key computed over the FLAT token
    array (doc-of/pos-of vectors from the list offsets), one ``if_else``
    substitution, and a ``binary_join`` reassembly on the original offsets.
    Single-space split matches DuckDB ``string_split(text, ' ')`` exactly
    (consecutive spaces yield empty tokens on both sides).
    """
    P = 2147483647

    def fn(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"].combine_chunks(), pattern=" ")
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(off)
        flat = toks.flatten()
        doc_of = np.repeat(ids, counts)
        # 1-based position to match SQL generate_subscripts
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], counts) + 1
        key = (48271 * (doc_of * token_salt + pos) + 11) % P % 100
        mask = pa.array(key < mask_pct)
        newflat = pc.if_else(mask, pa.scalar("<mask>"), flat)
        rebuilt = pa.ListArray.from_arrays(pa.array(off, pa.int32()), newflat)
        n_masked = np.zeros(len(ids), np.int64)
        np.add.at(n_masked, np.repeat(np.arange(len(ids)), counts),
                  key < mask_pct)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "masked_text": pc.binary_join(rebuilt, " "),
                "n_masked": pa.array(n_masked, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def bigram_logprob_docs(sf_dir: str):
    """Corpus BIGRAM-LM document scoring — the conditional-probability
    upgrade of :func:`unigram_logprob_docs`: ``avg_logprob = mean over a
    doc's bigrams of ln( c(w1 w2) / c(w1 ·) )`` where both counts come from
    the corpus itself (every doc bigram is therefore observed — no smoothing
    term to pick).  Low scores flag locally-incoherent token sequences that
    unigram frequency cannot see.

    Distributed plan (no driver vocabulary, corpus never collected): one
    per-block (doc, bigram, prefix, tf) partial table, materialized once and
    split into two contribution streams — ``+tf*ln c(bigram)`` attached
    under a bigram-keyed partition, ``-tf*ln c(prefix·)`` attached under a
    prefix-keyed partition (each key's LOCAL sum is its global count after
    the co-shuffle) — then one doc-keyed sum.  Three keyed exchanges, each
    bounded by the distinct-gram table, mirroring the SQL oracle's algebra
    term for term (both sides round to 8 decimals; summation order is the
    only divergence)."""
    import pandas as pd  # noqa: F401 (closures below run with this binding)

    from ..state.partitioning import key_partitioned, materialize_clean

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("big", pa.string()),
         ("pre", pa.string()), ("tf", pa.int64())]
    )

    def tf_block(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        if batch.num_rows == 0:
            return tf_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch["text"]), pattern=r"\s+"
        ).combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.chunk(0) if toks.num_chunks else pa.array([], toks.type)
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(off)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        L = len(flat)
        if L < 2:
            return tf_schema.empty_table()
        w1 = flat[: L - 1]
        big = w1 + " "
        big = big + flat[1:]
        # a bigram is valid when both tokens fall inside the same doc
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = doc_of[: L - 1] == doc_of[1:]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[doc_of[: L - 1][valid]]
        d = pd.DataFrame({"doc_id": ids, "big": big[valid], "pre": w1[valid]})
        out = (
            d.groupby(["doc_id", "big", "pre"], sort=False)
            .size().reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "big": pa.array(out["big"].tolist(), pa.string()),
                "pre": pa.array(out["pre"].tolist(), pa.string()),
                "tf": pa.array(out["tf"].to_numpy(), pa.int64()),
            },
            schema=tf_schema,
        )

    tf = materialize_clean(docs.map_batches(tf_block, batch_format="pyarrow"))

    contrib_schema = {
        "doc_id": pd.Series([], dtype=np.int64),
        "tf": pd.Series([], dtype=np.int64),
        "contrib": pd.Series([], dtype=np.float64),
    }

    def attach_big(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame(contrib_schema)
        c = df.groupby("big", sort=False)["tf"].transform("sum")
        out = df[["doc_id", "tf"]].copy()
        out["contrib"] = df["tf"].to_numpy() * np.log(
            c.to_numpy().astype(np.float64)
        )
        return out

    def attach_pre(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame(contrib_schema)
        c = df.groupby("pre", sort=False)["tf"].transform("sum")
        out = df[["doc_id"]].copy()
        out["tf"] = np.int64(0)  # bigram count already carried by stream A
        out["contrib"] = -df["tf"].to_numpy() * np.log(
            c.to_numpy().astype(np.float64)
        )
        return out

    stream_a = key_partitioned(tf, ["big"]).map_batches(
        attach_big, batch_format="pandas", batch_size=None
    )
    stream_b = key_partitioned(tf, ["pre"]).map_batches(
        attach_pre, batch_format="pandas", batch_size=None
    )

    per_doc_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("s", pa.float64())]
    )

    def per_doc(df: "pd.DataFrame") -> pa.Table:
        if df.empty:
            return per_doc_schema.empty_table()
        g = df.groupby("doc_id", sort=False).agg(
            n_bigrams=("tf", "sum"), s=("contrib", "sum")
        )
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(), pa.int64()),
                "n_bigrams": pa.array(g["n_bigrams"].to_numpy(), pa.int64()),
                "s": pa.array(g["s"].to_numpy(), pa.float64()),
            },
            schema=per_doc_schema,
        )

    doc_tbl = key_partitioned(stream_a.union(stream_b), ["doc_id"]).map_batches(
        per_doc, batch_format="pandas", batch_size=None
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "avg_logprob": pa.array(np.round(s / n, 8), pa.float64()),
            }
        )

    return doc_tbl.map_batches(finish, batch_format="pyarrow")


def weighted_sample_docs(sf_dir: str, k: int = 50, num_blocks: int | None = None):
    """WEIGHT-PROPORTIONAL SYSTEMATIC SAMPLE — the deterministic "sample by
    length" primitive of training-mix construction: lay all docs on the
    integer number line as [lo, hi) char intervals (doc_id order), walk a
    fixed stride ``S = total_chars // k``, and keep every doc whose interval
    contains a stride multiple (``n_hits = hi//S - lo//S``, i.e. selection
    probability exactly proportional to weight, long docs counted with
    multiplicity).  Every quantity is an integer, so the output hash-matches
    the SQL window-function oracle with zero float risk.

    Same distributed-prefix-sum plan as :func:`pack_sequences_docs`
    (SURVEY §2 custom-operator ladder, step (c)): the text never moves —
    only (doc_id, n_chars) rows sort into ordered blocks; P block totals
    reach the driver; one remote task per block attaches its offset and
    emits the selected rows."""
    import ray
    import ray.data as rd

    from ..sources.io import read_parquet_clean

    counts = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "w": pc.cast(t["n_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    if num_blocks:
        counts = counts.repartition(num_blocks)
    sorted_mat = counts.sort("doc_id").materialize()
    refs = [
        ref
        for bundle in sorted_mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_chars", pa.int64()), ("n_hits", pa.int64())]
    )
    if not refs:
        return out_schema.empty_table()

    @ray.remote
    def block_total(t: pa.Table) -> int:
        return int(t["w"].to_numpy(zero_copy_only=False).sum())

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    stride = max(1, int(sum(totals)) // k)

    @ray.remote
    def pick(t: pa.Table, off: int, s: int) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        hi = off + np.cumsum(w)
        lo = hi - w
        hits = hi // s - lo // s
        keep = hits >= 1
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_chars": t["w"].filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep], pa.int64()),
            },
            schema=out_schema,
        )

    picked = [pick.remote(r, int(o), stride) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(picked)


def bm25_search_docs(sf_dir: str, terms: tuple = ("spark", "window", "hash"),
                     k: int = 10):
    """BM25 RANKED RETRIEVAL over the corpus — the probabilistic-IR scoring
    family next to :func:`keyword_search_docs`'s rational tf-idf (SURVEY §2
    S11/O1, the reference's score-the-corpus query path
    ``ndd/server_ndd.py:108-123``): Okapi BM25 with k1=1.2, b=0.75,
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` and per-term saturation
    ``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

    Float-parity discipline: every constant is the same IEEE double on both
    sides (the SQL oracle spells them ``1.2e0``-style — plain ``1.2`` is
    DECIMAL in DuckDB), the per-term partial scores are added in one fixed
    left-to-right order (three explicit ``+``s, not an aggregate), and the
    final score is rounded to 8 decimals BEFORE the top-k cut so the
    boundary tiebreak (score desc, doc_id asc) sees identical keys.

    Distributed shape: one map pass reduces each doc to ``(doc_id, dl,
    tf_1..tf_T)`` — 5 ints/doc, the text never shuffles; corpus stats
    (Σdl, df_t) ride one tiny partial row per block; scoring is a
    stateless vectorized second pass over the stats table; the top-k rides
    bounded per-block partials (:func:`global_topk`), never a global sort.
    Output: ``doc_id, dl, score``."""
    import math

    from ..functions.groupagg import global_topk
    from ..state.partitioning import materialize_clean

    K1, B, TOP = 1.2, 0.75, 2.2  # TOP = k1+1 as a shared literal
    terms = list(terms)
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count

    stat_schema = pa.schema(
        [("doc_id", pa.int64()), ("dl", pa.int64())]
        + [(f"tf{i + 1}", pa.int64()) for i in range(len(terms))]
    )

    def stat_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return stat_schema.empty_table()
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        dl = pc.cast(pc.list_value_length(toks), pa.int64())
        row_idx, _ = _token_row_index(toks, n)
        flat = pc.list_flatten(toks).combine_chunks()
        cols = {"doc_id": batch["doc_id"], "dl": dl}
        for i, t in enumerate(terms):
            mask = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
            cols[f"tf{i + 1}"] = pa.array(
                np.bincount(row_idx[mask], minlength=n).astype(np.int64)
            )
        return pa.table(cols, schema=stat_schema)

    stats = materialize_clean(docs.map_batches(stat_block, batch_format="pyarrow"))

    def corpus_partial(t: pa.Table) -> pa.Table:
        cols = {"sdl": pa.array(
            [int(t["dl"].to_numpy(zero_copy_only=False).sum())], pa.int64()
        )}
        for i in range(len(terms)):
            cols[f"c{i + 1}"] = pa.array(
                [int((t[f"tf{i + 1}"].to_numpy(zero_copy_only=False) > 0).sum())],
                pa.int64(),
            )
        return pa.table(cols)

    part = stats.map_batches(corpus_partial, batch_format="pyarrow").to_pandas()
    sum_dl = int(part["sdl"].sum()) if not part.empty else 0
    dfs = [int(part[f"c{i + 1}"].sum()) if not part.empty else 0
           for i in range(len(terms))]
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0
    idf = [math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in dfs]

    def score_block(t: pa.Table) -> pa.Table:
        m = t.num_rows
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("dl", pa.int64()), ("score", pa.float64())]
        )
        if m == 0:
            return out_schema.empty_table()
        tf_mat = [t[f"tf{i + 1}"].to_numpy(zero_copy_only=False)
                  for i in range(len(terms))]
        hit = np.logical_or.reduce([tf > 0 for tf in tf_mat])
        if not hit.any():
            return out_schema.empty_table()
        dl = t["dl"].to_numpy(zero_copy_only=False)[hit].astype(np.float64)
        norm = K1 * ((1.0 - B) + B * dl / avgdl)
        score = np.zeros(int(hit.sum()), np.float64)
        for i in range(len(terms)):  # fixed left-to-right term order
            tf = tf_mat[i][hit].astype(np.float64)
            score = score + idf[i] * (tf * TOP) / (tf + norm)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "dl": t["dl"].filter(pa.array(hit)),
                "score": pa.array(np.round(score, 8)),
            },
            schema=out_schema,
        )

    scored = stats.map_batches(score_block, batch_format="pyarrow")
    return global_topk(scored, ["score", "doc_id"], [True, False], k)


def source_distinctive_terms(sf_dir: str, k: int = 10, min_count: int = 5):
    """PER-SOURCE DISTINCTIVE VOCABULARY — "which words characterize each
    source": the Haldane-corrected log-odds ratio of a term's in-source vs
    rest-of-corpus odds, ``ln((y+.5)/(n_s-y+.5)) - ln((y_t-y+.5)/
    ((N-n_s)-(y_t-y)+.5))``, the classic corpus-comparison statistic — with
    a ``min_count`` support filter and the top-``k`` terms per source
    (score desc, term asc ties).  Every input to the two logs is an exact
    integer ± 0.5, so the SQL oracle reproduces the score bit-for-bit up to
    the shared round-8 ln tolerance.

    Distributed shape: per-block ``(source, term)`` C-level pandas partial
    counts (the corpus text reduces to count rows immediately); ONE
    term-keyed hash-partition where each term's corpus total is the local
    sum (the unigram-LM attach pattern — no second aggregation pass and no
    driver vocabulary); source totals are a low-cardinality combiner fold
    broadcast as a dict; the per-source top-k rides bounded per-block
    partials into one final merge.  Output: ``source, term, y, score``."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["source", "text"])

    cnt_schema = pa.schema(
        [("source", pa.string()), ("term", pa.string()), ("y", pa.int64())]
    )

    def count_block(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(pc.utf8_trim_whitespace(batch["text"]), pa.scalar(""))
        )
        if batch.num_rows == 0:
            return cnt_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"])), pattern=r"\s+"
        )
        row_idx, _ = _token_row_index(toks, batch.num_rows)
        d = pd.DataFrame(
            {
                "source": batch["source"].to_pandas().to_numpy()[row_idx],
                "term": pc.list_flatten(toks).to_pandas(),
            }
        )
        out = d.groupby(["source", "term"], sort=False).size().reset_index(name="y")
        return pa.table(
            {
                "source": pa.array(out["source"].tolist(), pa.string()),
                "term": pa.array(out["term"].tolist(), pa.string()),
                "y": pa.array(out["y"].to_numpy(), pa.int64()),
            },
            schema=cnt_schema,
        )

    counts = key_partitioned(
        docs.map_batches(count_block, batch_format="pyarrow"), ["source", "term"]
    ).map_batches(
        lambda t: t.group_by(["source", "term"]).aggregate([("y", "sum")])
        .rename_columns(["source", "term", "y"]),
        batch_format="pyarrow", batch_size=None,
    ).materialize()

    # low-cardinality source totals: tiny partial rows, broadcast as a dict
    ns_df = (
        counts.map_batches(
            lambda t: t.group_by(["source"]).aggregate([("y", "sum")])
            .rename_columns(["source", "n"]),
            batch_format="pyarrow",
        ).to_pandas()
    )
    ns = ns_df.groupby("source")["n"].sum().to_dict()
    n_total = int(sum(ns.values()))

    out_schema = pa.schema(
        [("source", pa.string()), ("term", pa.string()),
         ("y", pa.int64()), ("score", pa.float64())]
    )

    def score_block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        yt = df.groupby("term", sort=False)["y"].transform("sum").to_numpy(
            dtype=np.float64
        )
        y = df["y"].to_numpy(dtype=np.float64)
        n_s = df["source"].map(ns).to_numpy(dtype=np.float64)
        keep = df["y"].to_numpy() >= min_count
        score = (
            np.log((y + 0.5) / (n_s - y + 0.5))
            - np.log(((yt - y) + 0.5) / ((n_total - n_s) - (yt - y) + 0.5))
        )
        return pa.table(
            {
                "source": pa.array(df["source"].to_numpy()[keep], pa.string()),
                "term": pa.array(df["term"].to_numpy()[keep], pa.string()),
                "y": pa.array(df["y"].to_numpy()[keep], pa.int64()),
                "score": pa.array(np.round(score[keep], 8), pa.float64()),
            },
            schema=out_schema,
        )

    scored = key_partitioned(counts, ["term"]).map_batches(
        score_block, batch_format="pandas", batch_size=None
    )

    # grouped top-k: per-block per-source heads, one bounded final merge
    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.sort_values(["source", "score", "term"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("source", sort=False).head(k)
        )

    partials = scored.map_batches(topk_block, batch_format="pandas")
    return partials.repartition(1).map_batches(
        topk_block, batch_format="pandas", batch_size=None
    )


def compaction_plan(sf_dir: str, target_chars: int = 2048):
    """PARQUET COMPACTION PLAN — the table-maintenance primitive of a
    100-TB lake: assign every document to an output file per source so each
    file packs ~``target_chars`` of payload (start-offset bucketing over
    the doc_id-ordered cumulative size line: ``file_idx = floor(
    exclusive_prefix / target)`` — greedy fill, pure integer arithmetic,
    byte-stable against the SQL window oracle).  A resumable rewriter
    consumes this manifest one ``(source, file_idx)`` group at a time.

    Distributed shape: the text never moves — only ``(source, doc_id,
    n_chars)`` manifest rows (24 B/doc) hash-partition by source; the
    in-block sort + cumulative sum is C-level pandas.  Partitioning
    assumption (documented, same as the grouped-transform family): one
    source's MANIFEST rows fit a block — at 24 B/doc that is hundreds of
    millions of docs per source per 8-GiB block."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    docs = _read_docs(sf_dir, ["source", "doc_id", "n_chars"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=str),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_chars": pd.Series([], dtype=np.int64),
                    "file_idx": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        cum = df.groupby("source", sort=False)["n_chars"].cumsum().to_numpy()
        excl = cum - df["n_chars"].to_numpy()
        df = df.copy()
        df["file_idx"] = excl // target_chars
        return df[["source", "doc_id", "n_chars", "file_idx"]]

    return key_partitioned(docs, ["source"]).map_batches(
        plan, batch_format="pandas", batch_size=None
    )


def source_ols_trend(sf_dir: str):
    """GROUPED OLS — per-source least-squares line of token count against
    char count (the chars-per-token rate a tokenizer-budget planner uses,
    and the template for any per-group trend fit): ``slope = (n*Sxy -
    Sx*Sy) / (n*Sxx - Sx^2)``, intercept through the means, plus r².

    EXACT by construction: both regressands are integers, so all five
    moments (n, Σx, Σy, Σxy, Σx², Σy²) accumulate exactly in int64 — the
    combiner fold is associative with NO float-order drift; floats appear
    only in the final divisions, identical to the SQL oracle's
    explicit-moment algebra (not DuckDB's internal ``regr_slope``
    numerics).  One low-cardinality combine, zero shuffles.
    Output: ``source, n_docs, slope, intercept, r2`` (round 8)."""
    docs = _read_docs(sf_dir, ["source", "text", "n_chars"])

    part_schema = pa.schema(
        [("source", pa.string()), ("n", pa.int64()), ("sx", pa.int64()),
         ("sy", pa.int64()), ("sxy", pa.int64()), ("sxx", pa.int64()),
         ("syy", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return part_schema.empty_table()
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_TOKEN_PAT), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
                "syy": y * y,
            }
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.table(
            {c: pa.array(g[c].tolist(),
                         pa.string() if c == "source" else pa.int64())
             for c in part_schema.names},
            schema=part_schema,
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("source", sort=True).sum()
    n = g["n"].to_numpy(dtype=np.float64)
    sx = g["sx"].to_numpy(dtype=np.float64)
    sy = g["sy"].to_numpy(dtype=np.float64)
    sxy = g["sxy"].to_numpy(dtype=np.float64)
    sxx = g["sxx"].to_numpy(dtype=np.float64)
    syy = g["syy"].to_numpy(dtype=np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return pa.table(
        {
            "source": pa.array(g.index.tolist(), pa.string()),
            "n_docs": pa.array(g["n"].to_numpy(), pa.int64()),
            "slope": pa.array(np.round(slope, 8), pa.float64()),
            "intercept": pa.array(np.round(intercept, 8), pa.float64()),
            "r2": pa.array(np.round(r2, 8), pa.float64()),
        }
    )


def source_drift_psi(sf_dir: str, bin_width: int = 128, n_bins: int = 8):
    """SOURCE DRIFT MONITOR — the Population Stability Index of each
    source's doc-length distribution against the rest of the corpus:
    ``PSI = sum_b (p_b - q_b) * ln(p_b / q_b)`` over ``n_bins`` capped
    ``bin_width``-char buckets, with Haldane-style +0.5 smoothing per
    bucket so empty bins stay finite (``p_b = (c_b + 0.5) / (n + n_bins/2)``).
    The mix-monitoring primitive a data team tracks across crawl
    snapshots: PSI < 0.1 stable, > 0.25 drifted.

    Distributed shape: docs reduce to (source, bin) integer counts via one
    low-cardinality combine (n_sources x n_bins partial rows per block, no
    shuffle); the PSI algebra runs on the driver over that tiny table with
    the identical operation order as the SQL oracle.  Output: ``source,
    n_docs, psi`` (round 8)."""
    import pandas as pd

    docs = _read_docs(sf_dir, ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "bin": np.minimum(
                    batch["n_chars"].to_numpy(zero_copy_only=False) // bin_width,
                    n_bins - 1,
                ).astype(np.int64),
            }
        )
        g = df.groupby(["source", "bin"], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "bin": pa.array(g["bin"].to_numpy(), pa.int64()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = parts.groupby(["source", "bin"], sort=True)["c"].sum()
    sources = sorted(counts.index.get_level_values(0).unique())
    mat = np.zeros((len(sources), n_bins), np.int64)
    for (src, b), c in counts.items():
        mat[sources.index(src), b] = c
    total = mat.sum(axis=0)
    half = n_bins / 2.0
    out_s, out_n, out_psi = [], [], []
    for si, src in enumerate(sources):
        cs = mat[si].astype(np.float64)
        cr = (total - mat[si]).astype(np.float64)
        ns, nr = cs.sum(), cr.sum()
        p = (cs + 0.5) / (ns + half)
        q = (cr + 0.5) / (nr + half)
        psi = ((p - q) * np.log(p / q)).sum()
        out_s.append(src)
        out_n.append(int(ns))
        out_psi.append(round(psi, 8))
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "psi": pa.array(out_psi, pa.float64()),
        }
    )


def source_ttest_pairs(sf_dir: str):
    """TWO-SAMPLE WELCH t-STATISTICS between every pair of sources on mean
    token count — the A/B-test primitive of corpus curation ("did the new
    crawl change doc shape?"): ``t = (m1 - m2) / sqrt(v1/n1 + v2/n2)``
    with sample variances ``v = (Σy² - Σy·Σy/n) / (n - 1)``.

    EXACT moment fold: token counts are integers, so the per-source
    (n, Σy, Σy²) accumulate exactly in int64 — one low-cardinality combine
    over the corpus, no float-order drift; the t algebra runs on the
    bounded source table with the identical operation order as the SQL
    oracle.  Output: ``src_a, src_b, n_a, n_b, t_stat`` for src_a < src_b
    (round 8)."""
    docs = _read_docs(sf_dir, ["source", "text"])

    part_schema = pa.schema(
        [("source", pa.string()), ("n", pa.int64()), ("sy", pa.int64()),
         ("syy", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return part_schema.empty_table()
        y = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=_TOKEN_PAT), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas(), "n": 1, "sy": y, "syy": y * y}
        )
        g = df.groupby("source", sort=False).sum().reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "sy": pa.array(g["sy"].to_numpy(), pa.int64()),
                "syy": pa.array(g["syy"].to_numpy(), pa.int64()),
            },
            schema=part_schema,
        )

    g = (
        docs.map_batches(partial, batch_format="pyarrow")
        .to_pandas().groupby("source", sort=True).sum()
    )
    src = g.index.to_numpy()
    n = g["n"].to_numpy(dtype=np.float64)
    sy = g["sy"].to_numpy(dtype=np.float64)
    syy = g["syy"].to_numpy(dtype=np.float64)
    m = sy / n
    v = (syy - sy * sy / n) / (n - 1.0)
    out_a, out_b, out_na, out_nb, out_t = [], [], [], [], []
    for i in range(len(src)):
        for j in range(i + 1, len(src)):
            t = (m[i] - m[j]) / np.sqrt(v[i] / n[i] + v[j] / n[j])
            out_a.append(src[i])
            out_b.append(src[j])
            out_na.append(int(n[i]))
            out_nb.append(int(n[j]))
            out_t.append(round(float(t), 8))
    return pa.table(
        {
            "src_a": pa.array(out_a, pa.string()),
            "src_b": pa.array(out_b, pa.string()),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "t_stat": pa.array(out_t, pa.float64()),
        }
    )


def shard_assignment(sf_dir: str, n_shards: int = 16):
    """RENDEZVOUS (highest-random-weight) SHARD ROUTING — the placement
    primitive of a fixed-size multi-node serving tier: every doc goes to
    ``argmax_s md5(doc_id ':' s)`` and fails over to the runner-up, so
    adding/removing one shard only moves the docs that hashed to it
    (minimal-disruption placement, unlike mod-N).  Same md5-low64 basis as
    every SQL-checkable hash in the engine.

    One stateless streamed pass (hashing is inherently per-value — the
    per-row md5 matches DuckDB ``md5_number_lower`` bit-for-bit); no
    shuffle, no state.  Output: ``doc_id, shard, backup_shard``."""
    from ..functions.hashing import md5_low64

    docs = _read_docs(sf_dir, ["doc_id"])

    def route(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n = len(ids)
        scores = np.empty((n, n_shards), np.uint64)
        for r, d in enumerate(ids):
            for s in range(n_shards):
                scores[r, s] = md5_low64(f"{d}:{s}")
        # exact uint64 argmax; first-max tie semantics == the oracle's
        # (score DESC, shard ASC) row_number order
        shard = scores.argmax(axis=1)
        rows = np.arange(n)
        masked = scores.copy()
        masked[rows, shard] = 0
        backup = masked.argmax(axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard": pa.array(shard.astype(np.int64), pa.int64()),
                "backup_shard": pa.array(backup.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(route, batch_format="pyarrow")


def shard_rebalance_diff(sf_dir: str, n_shards: int = 16):
    """RENDEZVOUS REBALANCE DIFF — the docs that MOVE when one shard joins
    the ring (``n_shards`` -> ``n_shards + 1``): rendezvous hashing's
    minimal-disruption contract says every moved doc moves TO the new shard
    and the moved fraction is ~1/(n+1); this query materializes the exact
    moved set so the contract is SQL-checkable (and pytest-pinned).

    One stateless streamed pass — the (n+1) HRW scores per doc are computed
    once, ``before`` is the argmax over the first n columns, ``after`` over
    all n+1 (same first-max tie semantics as :func:`shard_assignment`).
    Output: ``doc_id, shard_before, shard_after`` for moved docs only."""
    from ..functions.hashing import md5_low64

    docs = _read_docs(sf_dir, ["doc_id"])

    def route(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n = len(ids)
        scores = np.empty((n, n_shards + 1), np.uint64)
        for r, d in enumerate(ids):
            for s in range(n_shards + 1):
                scores[r, s] = md5_low64(f"{d}:{s}")
        before = scores[:, :n_shards].argmax(axis=1)
        after = scores.argmax(axis=1)
        moved = before != after
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(moved)),
                "shard_before": pa.array(
                    before[moved].astype(np.int64), pa.int64()
                ),
                "shard_after": pa.array(
                    after[moved].astype(np.int64), pa.int64()
                ),
            }
        )

    return docs.map_batches(route, batch_format="pyarrow")


def heaps_vocab_growth(sf_dir: str):
    """HEAPS'-LAW VOCABULARY GROWTH CURVE: after ingesting docs 1..n in
    doc_id order, how many tokens has the corpus seen (``cum_tokens``) and
    how large is its distinct vocabulary (``cum_vocab``)?  The curve a
    tokenizer-budget or dedup-planning analysis reads V(N) ~ K*N^beta from —
    the growth-rate companion to the static ``zipf_slope_corpus`` /
    ``vocab_coverage`` views.

    The distributed trick is FIRST-OCCURRENCE ATTRIBUTION: a term
    contributes +1 to the doc where it FIRST appears, so cumulative vocab =
    prefix-sum of per-doc new-term counts.  One term-keyed shuffle of the
    distinct (term, doc) pairs computes min(doc) per term block-locally (all
    occurrences co-locate), a value-count turns first-docs into new-term
    counts, and the two running totals are one ordered prefix-sum over the
    |docs|-row counts table.  Token identity is the engine-standard
    normalized whitespace split (blank docs count 0 tokens, matching the
    oracle's CASE).  Output: ``doc_id, cum_tokens, cum_vocab``."""
    import pandas as pd

    from ..functions.similarity import _binary_column_view
    from ..pipelines.docs_dedup import ngram_grams_docs
    from ..state.partitioning import key_partitioned

    # per-doc token counts over normalized text (blanks -> 0)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        from ..functions.text import normalize_column

        ids = pc.cast(t["doc_id"], pa.int64())
        norm = normalize_column(t["text"])
        toks = pc.utf8_split_whitespace(norm)
        n = pc.list_value_length(toks)
        blank = pc.equal(pc.utf8_length(norm), 0)
        n = pc.if_else(blank, pa.scalar(0, pa.int32()), n)
        return pa.table(
            {"doc_id": ids, "n_tok": pc.cast(n, pa.int64())}
        )

    counts = docs.map_batches(tok_counts, batch_format="pyarrow").to_pandas()

    # distinct (term, doc) -> min doc per term -> new terms per doc
    sigs = ngram_grams_docs(sf_dir, 1)

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.uint64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        vals, m = _binary_column_view(batch["shingles"])
        row_idx = np.repeat(np.arange(len(m), dtype=np.int64), m)
        ids = pc.cast(batch["conv_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "bucket": pa.array(vals, pa.uint64()),
                "doc_id": pa.array(ids[row_idx], pa.int64()),
            }
        )

    def first_doc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        out = batch.group_by(["bucket"]).aggregate([("doc_id", "min")])
        vc = pc.value_counts(out["doc_id_min"].combine_chunks())
        return pa.table(
            {
                "doc_id": pc.cast(vc.field("values"), pa.int64()),
                "v": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    news = (
        key_partitioned(sigs.map_batches(explode, batch_format="pyarrow"),
                        ["bucket"])
        .map_batches(first_doc, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby("doc_id", sort=False)["v"].sum()
    )
    df = counts.sort_values("doc_id").reset_index(drop=True)
    v = df["doc_id"].map(news).fillna(0).to_numpy(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
            "cum_tokens": pa.array(
                np.cumsum(df["n_tok"].to_numpy(np.int64)), pa.int64()
            ),
            "cum_vocab": pa.array(np.cumsum(v), pa.int64()),
        }
    )


def skipgram_lift_pairs(sf_dir: str, w: int = 3, min_count: int = 5,
                        k: int = 30):
    """SKIP-GRAM WINDOW CO-OCCURRENCE LIFT — the word2vec/GloVe statistic:
    for every unordered token pair co-occurring within ``w`` positions
    (any gap 1..w, not just adjacency — the generalization of
    :func:`token_pmi_pairs`'s bigram lift), the PMI-proportional lift
    ``c_xy * N / (c_x * c_y)`` over exact integer counts; top-``k`` by
    unrounded lift with (w_a, w_b) ties.  The association table a
    phrase-vocabulary or embedding-pretrain prep reads.

    Distributed shape: per-block window-pair value-count partials (``w``
    shifted Arrow compares per block — no per-token Python), one
    pair-keyed shuffle for global c_xy; unigram counts fold via the
    vocabulary-bounded combine and broadcast ONCE as sorted arrays
    (``ray.put``) for a searchsorted attach — no second shuffle; the
    top-k rides bounded per-block partials.  Output: ``w_a, w_b, c_xy,
    lift`` (round 8), globally sorted."""
    import ray

    from ..functions.groupagg import global_topk, lowcard_groupagg
    from ..state.partitioning import key_partitioned, materialize_clean

    docs = _read_docs(sf_dir, ["text"])
    out_schema = pa.schema(
        [("w_a", pa.string()), ("w_b", pa.string()),
         ("c_xy", pa.int64()), ("lift", pa.float64())]
    )
    SEP = " "

    def norm_toks(t: pa.Table):
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t["text"].combine_chunks()), r"\s+", " "
            )
        )
        toks = pc.utf8_split_whitespace(norm)
        blank = pc.equal(pc.utf8_length(norm), 0).to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        row_idx = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
        )
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        return flat, row_idx, blank

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        flat, row_idx, blank = norm_toks(t)
        keep_tok = ~blank[row_idx] if len(row_idx) else np.zeros(0, bool)
        grams = []
        for d in range(1, w + 1):
            if len(flat) <= d:
                break
            same = (
                keep_tok[d:] & keep_tok[:-d] & (row_idx[d:] == row_idx[:-d])
            )
            if not same.any():
                continue
            mask = pa.array(same)
            w1 = flat.slice(0, len(flat) - d).filter(mask)
            w2 = flat.slice(d).filter(mask)
            lt = pc.less_equal(w1, w2)
            wa = pc.if_else(lt, w1, w2)
            wb = pc.if_else(lt, w2, w1)
            grams.append(pc.binary_join_element_wise(wa, wb, SEP))
        if not grams:
            return empty
        vc = pc.value_counts(pa.concat_arrays(
            [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
             for g in grams]
        ))
        return pa.table(
            {"gram": vc.field("values"), "c": pc.cast(vc.field("counts"), pa.int64())}
        )

    def uni_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        flat, row_idx, blank = norm_toks(t)
        keep_tok = ~blank[row_idx] if len(row_idx) else np.zeros(0, bool)
        vc = pc.value_counts(flat.filter(pa.array(keep_tok)))
        return pa.table(
            {"s": vc.field("values"), "c": pc.cast(vc.field("counts"), pa.int64())}
        )

    uni = (
        lowcard_groupagg(
            docs.map_batches(uni_partial, batch_format="pyarrow"),
            ["s"], [("c", "sum")], {"c_sum": "c"},
        )
        .to_pandas()
        .sort_values("s")
    )
    vocab = uni["s"].to_numpy(dtype=object)
    counts = uni["c"].to_numpy(dtype=np.int64)
    n_tokens = float(counts.sum())
    vocab_ref = ray.put((vocab, counts))

    pairs = key_partitioned(
        materialize_clean(docs.map_batches(pair_partial, batch_format="pyarrow")),
        ["gram"],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        agg = t.group_by(["gram"]).aggregate([("c", "sum")])
        c_xy = agg["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = c_xy >= min_count
        if not keep.any():
            return out_schema.empty_table()
        g = agg["gram"].combine_chunks().filter(pa.array(keep))
        c_xy = c_xy[keep]
        parts_ = pc.split_pattern(g, pattern=SEP)
        wa = pc.list_element(parts_, 0)
        wb = pc.list_element(parts_, 1)
        voc, cnt = ray.get(vocab_ref)
        pos_a = np.searchsorted(voc, np.asarray(wa.to_pylist(), dtype=object))
        pos_b = np.searchsorted(voc, np.asarray(wb.to_pylist(), dtype=object))
        c_x = cnt[pos_a].astype(np.float64)
        c_y = cnt[pos_b].astype(np.float64)
        lift = c_xy.astype(np.float64) * n_tokens / (c_x * c_y)
        return pa.table(
            {"w_a": wa, "w_b": wb,
             "c_xy": pa.array(c_xy, pa.int64()),
             "lift": pa.array(lift, pa.float64())},
            schema=out_schema,
        )

    ranked = pairs.map_batches(finish, batch_format="pyarrow", batch_size=None)
    top = global_topk(ranked, ["lift", "w_a", "w_b"], [True, False, False], k)
    df = top.to_pandas()
    df["lift"] = np.round(df["lift"].to_numpy(), 8)
    return pa.table(
        {
            "w_a": pa.array(df["w_a"].astype(str), pa.string()),
            "w_b": pa.array(df["w_b"].astype(str), pa.string()),
            "c_xy": pa.array(df["c_xy"].to_numpy(np.int64), pa.int64()),
            "lift": pa.array(df["lift"].to_numpy(), pa.float64()),
        }
    )
