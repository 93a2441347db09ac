"""sf0.001 oracle-conformance pins for the round-3 session-13 additions
(incremental_dup_pairs delta-constrained exact join, and the session's later
operators), plus structural equivalence pins (incremental == full join
filtered to delta-touching pairs) on both test scales."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "incremental_dup_pairs",
    "dup_pair_recall",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (
        df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    )


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle_sf0001(ray_session, name):
    import __ray_entry__ as entrymod

    got = entrymod.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) > 0, f"{name} returned no rows — planted families missing"
    want = _oracle(entrymod.oracle_sql()[name])
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False, rtol=0, atol=5e-9
    )


def test_incremental_equals_filtered_full_join(ray_session):
    """The delta-constrained plan must find EXACTLY the delta-touching subset
    of the full exact join's pairs — same prefix lemma, fewer candidates."""
    from near_duplicate_detection_ray.pipelines import docs_dedup

    inc = docs_dedup.incremental_dup_pairs(SF).to_pandas()
    full = docs_dedup.ngram_jaccard_pairs(SF).to_pandas()
    filt = full[(full.a % 10 == 0) | (full.b % 10 == 0)]
    pd.testing.assert_frame_equal(
        _norm(inc), _norm(filt), check_dtype=False, rtol=0, atol=5e-9
    )
    # the incremental output must be a strict subset when base-base dups exist
    assert len(filt) <= len(full)


def test_incremental_delta_mod_variants(ray_session):
    """Different delta slices select different pair subsets of the same full
    join — pins the delta flag arithmetic (mod on the numeric doc_id)."""
    from near_duplicate_detection_ray.pipelines import docs_dedup

    full = docs_dedup.ngram_jaccard_pairs(SF).to_pandas()
    for mod in (3, 7):
        inc = docs_dedup.incremental_dup_pairs(SF, delta_mod=mod).to_pandas()
        filt = full[(full.a % mod == 0) | (full.b % mod == 0)]
        pd.testing.assert_frame_equal(
            _norm(inc), _norm(filt), check_dtype=False, rtol=0, atol=5e-9
        )


def test_dup_pair_recall_structure(ray_session):
    """Structural pins beyond the SQL oracle: recall is found/true (not a
    constant), the 'all' row sums the bands, and n_found <= n_true per band
    (LSH ⊆ exact is a theorem of the verify stage)."""
    from near_duplicate_detection_ray.pipelines import docs_dedup

    df = docs_dedup.dup_pair_recall(SF).to_pandas()
    assert (df.n_found <= df.n_true).all()
    assert ((df.recall - df.n_found / df.n_true.where(df.n_true > 0, 1))
            .abs() < 1e-9).all()
    bands = df[df.band != "all"]
    allrow = df[df.band == "all"].iloc[0]
    assert allrow.n_true == bands.n_true.sum()
    assert allrow.n_found == bands.n_found.sum()
    # the north-star contract itself
    assert allrow.recall >= 0.99


def test_incremental_clusters_equals_full_rebuild(ray_session):
    """The incremental maintenance invariant directly: labels from
    (retained base pairs) UNION (delta-constrained pairs) must equal a
    from-scratch clustering over the full corpus pair set."""
    import duckdb

    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        incremental_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        incremental_clusters(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(e.oracle_sql()["incremental_clusters"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
    # the delta actually merges something: at least one cluster must span
    # base and delta membership (doc_id % 10 == 0 vs != 0)
    merged = got[got["cluster_id"] != got["doc_id"]]
    assert len(merged) > 0
