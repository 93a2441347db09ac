"""Exact directional n-gram containment join (probe-prefix x full-index).

Layers:

1. Pure-NumPy property test of the containment prefix-probe completeness
   lemma: for pairs with |A∩B|/|A| >= tau, A's first m - ceil(tau*m) + 1
   grams in any fixed global order intersect B's FULL set.
2. End-to-end vs the brute-force DuckDB inverted-index oracle on a corpus
   with planted containment structure (a short quote embedded in long docs —
   high containment, low Jaccard).
3. Broadcast-df and two-shuffle fallback paths emit identical pairs.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

CONT_DIR = "/tmp/ndd_containment_docs"


def _prefix_len(m: int, tau: float) -> int:
    tau_ppm = round(tau * 1_000_000)
    alpha = -((-tau_ppm * m) // 1_000_000)
    return m - alpha + 1


def test_containment_prefix_probe_completeness_property():
    """Random uint64 set pairs with containment(A in B) >= tau: A's
    hash-ordered probe prefix must hit B's full set (the asymmetric lemma —
    B indexes everything, so only A's prefix matters)."""
    rng = np.random.default_rng(31)
    for tau in (0.6, 0.8, 0.9, 1.0):
        for _ in range(300):
            na = int(rng.integers(1, 40))
            a = np.unique(rng.choice(10_000, size=na, replace=False).astype(np.uint64))
            shared = int(rng.integers(0, len(a) + 1))
            extra = rng.integers(10_000, 20_000, size=int(rng.integers(0, 30))).astype(
                np.uint64
            )
            b = np.unique(np.concatenate([rng.permutation(a)[:shared], extra]))
            inter = len(np.intersect1d(a, b))
            if inter / len(a) < tau:
                continue
            probe = np.sort(a)[: _prefix_len(len(a), tau)]
            assert len(np.intersect1d(probe, b)) > 0, (
                f"completeness violated: tau={tau} C={inter/len(a):.3f} |a|={len(a)}"
            )


@pytest.fixture(scope="module")
def containment_docs_dir(ray_session):
    """Planted containment structure: a 12-token quote verbatim inside two
    long distinct docs (containment(quote in long) = 1.0, Jaccard << tau),
    an exact dup pair (mutual containment), short docs, and fillers."""
    rng = np.random.default_rng(37)
    vocab = [f"tok{i:04d}" for i in range(300)]

    def txt(n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=n))

    quote = " ".join(vocab[i] for i in range(12))  # deterministic 12 tokens
    long_a = txt(80) + " " + quote + " " + txt(40)
    long_b = quote + " " + txt(110)
    base = txt(90)
    texts = [
        quote,      # 0: contained in 1 and 2 (containment 1.0 both)
        long_a,     # 1
        long_b,     # 2
        base,       # 3
        base,       # 4: exact dup of 3 -> both directions
        "one two",  # 5: short doc (single whole-text gram)
        "one two",  # 6: identical short doc
        "   ",      # 7: blank -> excluded
    ] + [txt(100) for _ in range(6)]
    shutil.rmtree(CONT_DIR, ignore_errors=True)
    os.makedirs(CONT_DIR)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        f"{CONT_DIR}/documents.parquet",
    )
    return CONT_DIR


def test_ngram_containment_matches_duckdb_oracle(containment_docs_dir):
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        ngram_containment_pairs,
    )

    got = (
        ngram_containment_pairs(containment_docs_dir, n=3, tau=0.9)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{containment_docs_dir}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["ngram_containment_pairs"])
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), f"{len(got)} pairs vs oracle {len(want)}"
    assert list(got["a"]) == list(want["a"].astype(int))
    assert list(got["b"]) == list(want["b"].astype(int))
    np.testing.assert_allclose(got["containment"], want["containment"], atol=1e-9)
    pairs = set(zip(got["a"], got["b"]))
    # quote contained in both long docs — DIRECTIONAL (long docs not in quote)
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (1, 0) not in pairs and (2, 0) not in pairs
    # exact dups fire both directions
    assert (3, 4) in pairs and (4, 3) in pairs
    assert (5, 6) in pairs and (6, 5) in pairs


def test_containment_broadcast_and_shuffle_paths_equal(containment_docs_dir):
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        ngram_containment_pairs,
    )

    def norm(ds):
        df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return list(map(tuple, df.itertuples(index=False)))

    fast = norm(ngram_containment_pairs(containment_docs_dir, n=3, tau=0.9))
    slow = norm(
        ngram_containment_pairs(containment_docs_dir, n=3, tau=0.9, hot_gram_cap=0)
    )
    assert fast == slow and len(fast) > 0
