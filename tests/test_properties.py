"""Property tests (SURVEY §5.5): hypothesis-driven invariants for the
signature math, suffix arrays, and oracle monotonicity."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.functions.hashing import (
    TokenHasher,
    minhash_batch,
    minhash_params,
    shingle_hashes,
    simhash_batch,
)
from near_duplicate_detection_ray.functions.suffix import (
    is_substring,
    lcp_array,
    longest_common_substring,
    suffix_array,
)
from near_duplicate_detection_ray.functions.text import normalize_text
from near_duplicate_detection_ray.oracle import oracle_dup_pairs
from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

tokens_st = st.lists(st.sampled_from("abc de fg hij kl mno p".split()), max_size=60)


@given(tokens_st)
@settings(max_examples=50, deadline=None)
def test_signature_invariant_to_context(tokens):
    """A doc's signature depends only on its own tokens, never on what else
    shares the batch (row-local requirement for block invariance)."""
    hasher = TokenHasher()
    sh = shingle_hashes(hasher.hash_tokens(tokens), 5)
    a, b = minhash_params(32, seed=9)
    alone = minhash_batch([sh], a, b)
    other = np.unique(np.arange(10, dtype=np.uint64) * np.uint64(2654435761))
    together = minhash_batch([other, sh, other], a, b)
    assert np.array_equal(alone[0], together[1])
    assert simhash_batch([sh])[0] == simhash_batch([other, sh])[1]


@given(tokens_st)
@settings(max_examples=50, deadline=None)
def test_simhash_chunking_invariant(tokens):
    hasher = TokenHasher()
    sh = shingle_hashes(hasher.hash_tokens(tokens), 5)
    sets = [sh, sh[: len(sh) // 2], sh]
    assert np.array_equal(simhash_batch(sets), simhash_batch(sets, chunk_rows=3))


@given(st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(text):
    once = normalize_text(text)
    assert normalize_text(once) == once
    assert "  " not in once and once == once.strip()


@given(st.lists(st.integers(min_value=0, max_value=5), max_size=30))
@settings(max_examples=100, deadline=None)
def test_suffix_array_is_sorted_permutation(seq):
    arr = np.array(seq, dtype=np.int64)
    sa = suffix_array(arr)
    assert sorted(sa.tolist()) == list(range(len(arr)))
    suffixes = [tuple(arr[i:].tolist()) for i in sa]
    assert suffixes == sorted(suffixes)
    lcp = lcp_array(arr, sa)
    for i in range(1, len(arr)):
        k = int(lcp[i])
        assert tuple(arr[sa[i - 1] : sa[i - 1] + k].tolist()) == tuple(
            arr[sa[i] : sa[i] + k].tolist()
        )


@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=20),
    st.lists(st.integers(min_value=0, max_value=4), max_size=10),
    st.lists(st.integers(min_value=0, max_value=4), max_size=10),
)
@settings(max_examples=100, deadline=None)
def test_substring_detected(inner, pre, post):
    a = np.array(inner, dtype=np.int64)
    b = np.array(pre + inner + post, dtype=np.int64)
    assert is_substring(a, b)
    assert longest_common_substring(a, b) >= len(a)


def test_lcs_known_values():
    assert longest_common_substring(np.array([1, 2, 3]), np.array([9, 2, 3, 7])) == 2
    assert longest_common_substring(np.array([1]), np.array([2])) == 0
    assert longest_common_substring(np.empty(0, dtype=np.int64), np.array([1])) == 0
    assert is_substring(np.empty(0, dtype=np.int64), np.array([1]))
    assert not is_substring(np.array([1, 2]), np.array([2, 1]))


def test_oracle_recall_monotone_in_tau():
    """Raising tau can only shrink the dup-pair set (recall monotonicity)."""
    t, _ = synth_corpus(seed=42)
    docs = corpus_docs(t)
    p6 = oracle_dup_pairs(docs, NDDConfig(tau=0.6))
    p8 = oracle_dup_pairs(docs, NDDConfig(tau=0.8))
    p9 = oracle_dup_pairs(docs, NDDConfig(tau=0.95))
    assert p9 <= p8 <= p6


# --- invariants for the round-2 continuation kernels ------------------------

words_st = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
    min_size=0, max_size=40,
)


@given(st.lists(words_st, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_span_cut_conservation(corpora):
    """kept + removed == total tokens per doc, spans never overlap, every
    cut token is inside a reported span (dup_spans and cut_spans agree)."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile

    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        cut_spans_docs,
        dup_spans_docs,
    )

    texts = [" ".join(ws) for ws in corpora]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts), pa.string()),
                    "source": pa.array(["t"] * len(texts), pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            f"{d}/documents.parquet",
        )
        spans = dup_spans_docs(d).to_pandas()
        cut = cut_spans_docs(d).to_pandas().set_index("doc_id")

    # spans disjoint and within bounds; total span tokens == n_removed
    span_tokens = {i: 0 for i in range(len(texts))}
    if "doc_id" not in spans.columns:  # fully-empty result loses its schema
        spans = spans.reindex(columns=["doc_id", "start_tok", "end_tok", "n_tokens"])
    for doc, g in spans.groupby("doc_id"):
        g = g.sort_values("start_tok")
        prev_end = 0
        n_tok = len(texts[doc].split())
        for r in g.itertuples():
            assert r.start_tok > prev_end, "overlapping spans"
            assert 1 <= r.start_tok <= r.end_tok <= n_tok
            assert r.n_tokens == r.end_tok - r.start_tok + 1
            span_tokens[doc] += r.n_tokens
            prev_end = r.end_tok
    for i, t in enumerate(texts):
        n_tok = len(t.split())
        kept = cut.loc[i, "kept_text"]
        n_kept = len(kept.split()) if kept else 0
        assert n_kept + cut.loc[i, "n_removed"] == n_tok
        assert cut.loc[i, "n_removed"] == span_tokens[i]


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_redact_kernel_total_and_idempotent(s):
    """Redaction never raises, output contains no residual matches of the
    three PII patterns, and re-redacting is a fixpoint."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from near_duplicate_detection_ray.pipelines.text_analysis import (
        _EMAIL_PAT,
        _IP_PAT,
        _PHONE_PAT,
        redact_text_batch,
    )

    once = redact_text_batch(pa.array([s], pa.string()))
    red = once["redacted_text"]
    for pat in (_EMAIL_PAT, _PHONE_PAT, _IP_PAT):
        assert pc.count_substring_regex(red, pattern=pat).to_pylist() == [0]
    twice = redact_text_batch(red)
    assert twice["redacted_text"].to_pylist() == red.to_pylist()


@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 50)),
        min_size=1, max_size=300,
    ),
    st.integers(1, 12),
)
@settings(max_examples=10, deadline=None)
def test_global_topk_equals_sorted_head(rows, k):
    """Bounded-partial top-k == full sort + head for arbitrary data/k,
    regardless of how rows land in blocks."""
    import pandas as pd
    import ray.data as rd

    from near_duplicate_detection_ray.functions.groupagg import global_topk

    df = pd.DataFrame(rows, columns=["a", "b"])
    ds = rd.from_pandas(df).repartition(4)
    got = global_topk(ds, ["a", "b"], [True, False], k).to_pandas()
    want = (
        df.sort_values(["a", "b"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
