"""Exact n-gram Jaccard set-similarity join (prefix filtering).

Two layers:

1. A pure-NumPy property test of the prefix-filter completeness lemma
   (All-Pairs/PPJoin): for random set pairs with J >= tau, the hash-ordered
   prefixes of length m - ceil(tau*m) + 1 must intersect.
2. End-to-end: ``ngram_jaccard_pairs`` equals the brute-force DuckDB
   inverted-index oracle on a corpus WITH planted near-dups (the sf testdata
   families plus adversarial short docs).
"""

import math
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NGRAM_DIR = "/tmp/ndd_ngram_docs"


def _prefix_len(m: int, tau: float) -> int:
    tau_ppm = round(tau * 1_000_000)
    alpha = -((-tau_ppm * m) // 1_000_000)
    return m - alpha + 1


def test_prefix_filter_completeness_property():
    """Random overlapping uint64 sets: every pair with J >= tau shares a
    prefix element under the ascending-hash canonical order."""
    rng = np.random.default_rng(13)
    for tau in (0.5, 0.7, 0.8, 0.9):
        for _ in range(300):
            na = int(rng.integers(1, 40))
            shared = int(rng.integers(0, na + 1))
            a = rng.choice(10_000, size=na, replace=False).astype(np.uint64)
            extra = rng.integers(10_000, 20_000, size=int(rng.integers(0, 10))).astype(
                np.uint64
            )
            b = np.unique(np.concatenate([rng.permutation(a)[:shared], extra]))
            a = np.unique(a)
            inter = len(np.intersect1d(a, b))
            union = len(a) + len(b) - inter
            if union == 0:
                continue
            j = inter / union
            if j < tau:
                continue
            pa_ = np.sort(a)[: _prefix_len(len(a), tau)]
            pb_ = np.sort(b)[: _prefix_len(len(b), tau)]
            assert len(np.intersect1d(pa_, pb_)) > 0, (
                f"completeness violated: tau={tau} J={j:.3f} |a|={len(a)} |b|={len(b)}"
            )


def test_exact_ceil_vs_float_ceil():
    """The integer ceil must not overshoot where float ceil(0.7*10)=8 would."""
    assert _prefix_len(10, 0.7) == 10 - 7 + 1
    assert _prefix_len(20, 0.8) == 20 - 16 + 1
    assert _prefix_len(1, 0.7) == 1


@pytest.fixture(scope="module")
def ngram_docs_dir(ray_session):
    """Corpus with planted n-gram near-dup structure: a base doc, an edited
    copy (high trigram overlap), an exact copy, short docs (< 3 tokens, the
    whole-text-gram fallback), and unique fillers."""
    rng = np.random.default_rng(29)
    vocab = [f"tok{i:04d}" for i in range(300)]

    def txt(n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=n))

    base = txt(120)
    toks = base.split()
    toks[60] = "EDITED"
    edited = " ".join(toks)  # one substitution: trigram J ~ (m-5)/(m+1)
    texts = [
        base,
        edited,
        base,                 # exact dup -> J = 1.0
        "one two",            # short doc (single whole-text gram)
        "one two",            # identical short doc -> J = 1.0
        "three four",         # different short doc
        "   ",                # blank -> excluded
    ] + [txt(100) for _ in range(8)]
    shutil.rmtree(NGRAM_DIR, ignore_errors=True)
    os.makedirs(NGRAM_DIR)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        f"{NGRAM_DIR}/documents.parquet",
    )
    return NGRAM_DIR


def test_ngram_jaccard_matches_duckdb_oracle(ngram_docs_dir):
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import ngram_jaccard_pairs

    got = (
        ngram_jaccard_pairs(ngram_docs_dir, n=3, tau=0.7)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{ngram_docs_dir}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["ngram_jaccard_pairs"])
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), f"{len(got)} pairs vs oracle {len(want)}"
    assert list(got["a"]) == list(want["a"].astype(int))
    assert list(got["b"]) == list(want["b"].astype(int))
    np.testing.assert_allclose(got["jaccard"], want["jaccard"], atol=1e-9)
    # the planted structure must actually be found
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 2) in pairs and (3, 4) in pairs and (0, 1) in pairs


def test_broadcast_and_shuffle_df_paths_equal(ngram_docs_dir):
    """The broadcast df-map path (default) and the two-shuffle fallback
    (forced via hot_gram_cap=0) must emit identical final pairs."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import ngram_jaccard_pairs

    def norm(ds):
        df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return df

    fast = norm(ngram_jaccard_pairs(ngram_docs_dir))
    slow = norm(ngram_jaccard_pairs(ngram_docs_dir, hot_gram_cap=0))
    assert fast.equals(slow)
    assert len(fast) > 0
