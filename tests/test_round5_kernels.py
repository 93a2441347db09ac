"""Round-5 kernel pins: the shared Arrow kernels the flagship assemble /
fingerprint / winnowing rewrites ride, each checked against its scalar
reference implementation (no Ray needed — pure kernel parity)."""

import hashlib
import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from near_duplicate_detection_ray.functions.hashing import (
    md5_hex_column,
    md5_low64,
    md5_low64_column,
    md5_shingle_hashes,
    md5_shingle_sets,
)
from near_duplicate_detection_ray.functions.text import (
    normalize_column,
    normalize_text,
    shingle_tokens,
    token_count_normalized_column,
    tokenize,
    winnow_fingerprints,
)


def test_md5_hex_column_matches_hashlib_and_propagates_null():
    vals = ["", "x", "hello world", "Ü ascii-mix", None, "a" * 1000]
    out = md5_hex_column(pa.array(vals)).to_pylist()
    for v, h in zip(vals, out):
        if v is None:
            assert h is None  # DuckDB md5(NULL) parity
        else:
            assert h == hashlib.md5(v.encode("utf-8")).hexdigest()


def test_md5_hex_column_sliced_and_chunked_input():
    arr = pa.array(["aa", "bb", "cc", "dd"])
    sl = arr.slice(1, 2)
    assert md5_hex_column(sl).to_pylist() == [
        hashlib.md5(b"bb").hexdigest(), hashlib.md5(b"cc").hexdigest()
    ]
    ch = pa.chunked_array([["aa"], ["bb", "cc"]])
    assert md5_hex_column(ch).to_pylist() == [
        hashlib.md5(s).hexdigest() for s in (b"aa", b"bb", b"cc")
    ]


def test_md5_low64_column_matches_scalar_and_rejects_null():
    vals = ["", "x", "shingle one two", "Ü"]
    out = md5_low64_column(pa.array(vals))
    assert [int(v) for v in out] == [md5_low64(v) for v in vals]
    import pytest

    with pytest.raises(ValueError):
        md5_low64_column(pa.array(["x", None]))


def test_normalize_column_matches_scalar_with_nulls_and_nonascii():
    vals = [
        "", "  A  B\t\nC  ", "Ü X", None, "mixed Ü and ascii",
        "\x1c\x1d\x1e\x1f tabs", "ümlaut  RUN",
    ]
    out = normalize_column(pa.array(vals)).to_pylist()
    for v, o in zip(vals, out):
        assert o == (None if v is None else normalize_text(v)), repr(v)


def test_token_count_normalized_column():
    norms = ["", "one", "one two", "a b c d"]
    out = token_count_normalized_column(pa.array(norms)).to_pylist()
    assert out == [len(tokenize(n)) for n in norms]


def test_winnow_fingerprints_matches_scalar_reference():
    def scalar(hashes, window):
        hs = list(hashes)
        n = len(hs)
        if n == 0:
            return []
        if n <= window:
            return [min(hs)]
        out, last = [], -1
        for i in range(n - window + 1):
            w = hs[i : i + window]
            m = min(w)
            j = i + max(idx for idx, v in enumerate(w) if v == m)
            if j != last:
                out.append(m)
                last = j
        return out

    rng = random.Random(7)
    for _ in range(500):
        n = rng.randrange(0, 30)
        w = rng.randrange(1, 8)
        hs = [rng.randrange(0, 6) for _ in range(n)]  # tie-heavy domain
        assert winnow_fingerprints(hs, w) == scalar(hs, w), (hs, w)
        # ndarray input path (the hot-path callers)
        arr = np.array(hs, dtype=np.uint64)
        assert winnow_fingerprints(arr, w) == scalar(hs, w)


def test_md5_shingle_hashes_slices_match_per_doc_hashing():
    texts = ["a b c d e f", "", "one two", "x " * 20, "solo"]
    hs_all, counts = md5_shingle_hashes(texts, 5)
    assert len(counts) == len(texts)
    pos = 0
    for t, c in zip(texts, counts):
        sh = shingle_tokens(tokenize(t), 5)
        assert c == len(sh)
        assert [int(v) for v in hs_all[pos : pos + c]] == [md5_low64(s) for s in sh]
        pos += c
    assert pos == len(hs_all)
    # set variant: sorted-unique per doc
    sets = md5_shingle_sets(texts, 5)
    pos = 0
    for s, c in zip(sets, counts):
        want = np.unique(hs_all[pos : pos + c]) if c else np.empty(0, np.uint64)
        assert np.array_equal(s, want)
        pos += c


def test_group_offsets_boundaries():
    from near_duplicate_detection_ray.stages.assemble import group_offsets

    assert group_offsets(pa.array([], pa.string())).tolist() == [0]
    assert group_offsets(pa.array(["a"])).tolist() == [0, 1]
    arr = pa.array(["a", "a", "b", "c", "c", "c"])
    assert group_offsets(arr).tolist() == [0, 2, 3, 6]
