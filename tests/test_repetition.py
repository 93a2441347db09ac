"""repetition_docs (Gopher-style word-level repetition metrics) vs a scalar
Counter-based reference, including degenerate docs and multi-block inputs."""

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ref(text: str):
    toks = text.split()
    if not toks:
        return 0.0, 0.0, 0.0
    dup_word = 1.0 - (len(set(toks)) * 1.0 / len(toks))
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not bigrams:
        return dup_word, 0.0, 0.0
    c = Counter(bigrams)
    dup_bg = 1.0 - (len(c) * 1.0 / len(bigrams))
    top_bg = max(c.values()) * 1.0 / len(bigrams)
    return dup_word, dup_bg, top_bg


TEXTS = [
    "",  # blank -> all zeros
    "   ",  # whitespace-only -> all zeros
    "solo",  # one word: no bigrams
    "a a a a a",  # fully repeated: dup_word 0.8, one bigram repeated 4x
    "a b a b a b",  # alternating: 2 distinct bigrams
    "the quick brown fox jumps over the lazy dog",
    "x y x y z x y x y z",  # mixed runs
    "tab\tand  double  spaces",  # \s+ splitting
    "one two three four five six seven eight nine ten",  # all distinct
]


@pytest.fixture(scope="module")
def rep_docs_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("repdocs"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(TEXTS))), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    return d


def test_repetition_matches_scalar_reference(rep_docs_dir):
    from near_duplicate_detection_ray.pipelines.text_analysis import repetition_docs

    df = repetition_docs(rep_docs_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == len(TEXTS)
    for i, text in enumerate(TEXTS):
        dw, db, tb = _ref(text)
        assert df.loc[i, "dup_word_frac"] == pytest.approx(dw, abs=0), (i, text)
        assert df.loc[i, "dup_bigram_frac"] == pytest.approx(db, abs=0), (i, text)
        assert df.loc[i, "top_bigram_frac"] == pytest.approx(tb, abs=0), (i, text)


def test_repetition_invariant_under_blocking(rep_docs_dir, tmp_path):
    """Metrics are per-row; splitting the input across many small files (and
    hence blocks, each with its own dictionary encoding) must not change them."""
    from near_duplicate_detection_ray.pipelines.text_analysis import repetition_docs

    # one file per doc -> one block per doc at read time
    os.makedirs(f"{tmp_path}/many/documents.parquet")
    for i, text in enumerate(TEXTS):
        pq.write_table(
            pa.table(
                {"doc_id": pa.array([i], pa.int64()), "text": pa.array([text], pa.string())}
            ),
            f"{tmp_path}/many/documents.parquet/part-{i}.parquet",
        )
    one = repetition_docs(rep_docs_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    many = (
        repetition_docs(str(tmp_path / "many"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_top_ngrams_corpus_matches_counter(rep_docs_dir):
    """Corpus top-k bigrams vs a Counter reference, deterministic tie-break
    (n desc, gram asc)."""
    from collections import Counter

    from near_duplicate_detection_ray.pipelines.text_analysis import top_ngrams_corpus

    c = Counter()
    for text in TEXTS:
        toks = text.split()
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    df = top_ngrams_corpus(rep_docs_dir, k=20).to_pandas()
    got = list(zip(df["gram"], df["n"]))
    assert got == want


def test_clean_docs_matches_scalar(rep_docs_dir):
    """Stopword-removal rewrite vs a scalar reference (strip+lower membership,
    original token kept), including blank docs."""
    from near_duplicate_detection_ray.functions.text import LANG_STOPWORDS
    from near_duplicate_detection_ray.pipelines.text_analysis import clean_docs

    stop = LANG_STOPWORDS["en"]
    df = clean_docs(rep_docs_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(TEXTS):
        toks = text.split()
        kept = [t for t in toks if t.lower().strip(".,!?;:\"'()") not in stop]
        assert df.loc[i, "clean_text"] == " ".join(kept), (i, text)
        assert df.loc[i, "n_removed"] == len(toks) - len(kept), (i, text)
