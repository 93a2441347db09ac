"""Text normalization / tokenization / quality scalar functions.

These are the text analogues of the reference's image-prep maps (PAR-correct
resize ``ndd/extract_images.py:49-51``, letterbox trim ``ndd/utils.py:21-33``,
RGB+299x299 model prep ``ndd/extract_features.py:53-55``): deterministic,
content-shaping transforms applied before signature computation.

Every function here is pure and row-local so signatures are invariant to how
Ray Data splits batches.  SQL-parity notes are given where a DuckDB oracle
mirrors the function.
"""

from __future__ import annotations

import re
import unicodedata

# \s+ matches DuckDB regexp_replace(text, '\s+', ' ', 'g')
_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\S+")
# Python's re \d is ASCII-only with re.ASCII; keep ASCII classes for SQL parity.
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")  # ASCII punctuation blocks
_DIGIT_RE = re.compile(r"[0-9]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WORD_RE = re.compile(r"[a-z0-9']+")

# Tiny fixed stopword sets for the language-ID heuristic (n-gram/stopword
# voting; public-knowledge lists).
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to a in is it you that was for on are with as his they at".split()
    ),
    "de": frozenset(
        "der die und das ist ich nicht mit ein sie des auf für von dem ein".split()
    ),
    "fr": frozenset(
        "le la et les des en un une du est que pour dans qui pas sur".split()
    ),
    "es": frozenset(
        "el la los las y de que en un una es por con para su al no".split()
    ),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def normalize_text(text: str) -> str:
    """NFC-normalize, lowercase, collapse whitespace runs to single spaces, strip.

    This is the agreed normalization in FIXTURES.md §F3; the oracle and every
    engine stage must use exactly this function.
    """
    t = unicodedata.normalize("NFC", text)
    t = t.lower()
    t = _WS_RE.sub(" ", t).strip()
    return t


# Python's ``\s`` restricted to ASCII — the RE2 char class used by the Arrow
# fast path below.  [\t\n\x0b\f\r\x1c-\x1f ] is exactly the set of ASCII chars
# ``\s`` matches, so on pure-ASCII rows the Arrow kernel is bit-identical to
# ``normalize_text`` (NFC is the identity on ASCII; ``utf8_lower`` matches
# ``str.lower`` on ASCII).  Pinned in tests/test_text.py.
_ASCII_WS_RE2 = "[\\t\\n\\x0b\\f\\r\\x1c-\\x1f ]+"


def normalize_column(arr):
    """Vectorized :func:`normalize_text` over a string Arrow array.

    ASCII rows (the overwhelming majority of transcript text) ride
    ``utf8_lower`` + ONE RE2 whitespace-collapse + ``utf8_trim``; rows
    containing any non-ASCII byte fall back to the scalar ``normalize_text``
    (NFC / Unicode casing / Unicode whitespace can all diverge from the Arrow
    kernels there).  Shared by the documents adapter and the flagship
    assemble stage (round-4 verdict item #1)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    norm = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.utf8_lower(arr), pattern=_ASCII_WS_RE2, replacement=" "
        ),
        characters=" ",
    )
    # null rows ride the Arrow kernels (null in -> null out) and must NOT
    # enter the scalar fallback: fill the mask's nulls as True
    ascii_mask = pc.fill_null(
        pc.equal(pc.utf8_length(arr), pc.binary_length(arr)), True
    )
    if not pc.all(ascii_mask).as_py():
        am = ascii_mask.to_numpy(zero_copy_only=False).astype(bool)
        raw = arr.to_pylist()
        out = norm.to_pylist()
        for i in np.flatnonzero(~am):
            out[i] = normalize_text(raw[i])
        norm = pa.array(out, pa.string())
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    return norm


def token_count_normalized_column(norm):
    """Whitespace-token count per row of ALREADY-normalized text (single-space
    separated, trimmed): 0 for empty, else space-count + 1 — exactly
    ``len(tokenize(row))``.  int32 Arrow array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    counts = pc.add(pc.count_substring(norm, " "), 1)
    return pc.if_else(
        pc.equal(pc.binary_length(norm), 0), pa.scalar(0, pa.int64()), counts
    ).cast(pa.int32())


def tokenize(normalized: str) -> list[str]:
    """Whitespace tokens of already-normalized text.

    SQL parity: ``regexp_split_to_array(trim(lower(text)), '\\s+')`` (with the
    empty-string caveat handled by the caller).
    """
    if not normalized:
        return []
    return _TOKEN_RE.findall(normalized)


def token_count(text: str) -> int:
    """Whitespace token count of the raw text (0 for blank)."""
    return len(_TOKEN_RE.findall(text))


def shingle_tokens(tokens: list[str], w: int) -> list[str]:
    """Contiguous w-token shingles joined by single spaces.

    Documents shorter than ``w`` tokens yield ONE shingle covering all their
    tokens (so short docs still participate in similarity); empty docs yield
    none.  This boundary rule is part of the lineage config and must match the
    oracle bit-for-bit.
    """
    n = len(tokens)
    if n == 0:
        return []
    if n < w:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + w]) for i in range(n - w + 1)]


def quality_metrics(text: str) -> dict[str, float]:
    """Document quality features (ASCII-class based for DuckDB parity):

    - ``n_chars``: raw length
    - ``n_tokens``: whitespace token count
    - ``punct_ratio``: ASCII punctuation chars / n_chars
    - ``digit_ratio``: ASCII digits / n_chars
    - ``alpha_ratio``: ASCII letters / n_chars
    - ``stopword_ratio``: English stopword tokens / n_tokens
    - ``mean_token_len``: n_nonspace_chars / n_tokens

    All ratios are 0.0 for empty denominators.
    """
    n_chars = len(text)
    toks = _TOKEN_RE.findall(text)
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    n_digit = len(_DIGIT_RE.findall(text))
    n_alpha = len(_ALPHA_RE.findall(text))
    n_stop = sum(1 for t in toks if t.lower().strip(".,!?;:\"'()") in EN_STOPWORDS)
    n_nonspace = sum(len(t) for t in toks)
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "digit_ratio": n_digit / n_chars if n_chars else 0.0,
        "alpha_ratio": n_alpha / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_tokens if n_tokens else 0.0,
        "mean_token_len": n_nonspace / n_tokens if n_tokens else 0.0,
    }


def lang_id(text: str) -> str:
    """Stopword-voting language ID over {en, de, fr, es}; 'unknown' when no
    stopword from any list appears.  Deterministic tie-break: language name
    ascending among the max votes."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "unknown"
    scores = {
        lang: sum(1 for w in words if w in sw) for lang, sw in LANG_STOPWORDS.items()
    }
    best = max(scores.values())
    if best == 0:
        return "unknown"
    return min(lang for lang, s in scores.items() if s == best)


def winnow_fingerprints(hashes, window: int) -> list[int]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    slide a window of ``window`` consecutive k-gram hashes, keep each window's
    minimum (rightmost on ties) — guarantees shared fingerprints for any
    sufficiently long shared substring.  Input: iterable of ints.

    Vectorized (round 5): ``sliding_window_view`` + per-window argmin on the
    REVERSED window axis (NumPy argmin takes the first minimum, so reversing
    yields the rightmost) and a shifted-compare dedup of consecutive equal
    pick positions — bit-identical to the scalar scan (pinned by the
    winnowing SQL oracles and property tests)."""
    import numpy as np

    hs = (
        hashes.astype(np.uint64, copy=False)
        if isinstance(hashes, np.ndarray)
        else np.array(list(hashes), dtype=np.uint64)
    )
    n = hs.size
    if n == 0:
        return []
    if n <= window:
        return [int(hs.min())]
    win = np.lib.stride_tricks.sliding_window_view(hs, window)
    m = win.min(axis=1)
    # rightmost minimal position within each window, as a GLOBAL index
    j = np.arange(n - window + 1) + (window - 1) - np.argmin(win[:, ::-1], axis=1)
    keep = np.r_[True, j[1:] != j[:-1]]
    return [int(v) for v in m[keep]]
