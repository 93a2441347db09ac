"""sf0.001 oracle-conformance pins for the sixth-session operators: each new
SQL-checked query is compared against its own oracle_sql() via DuckDB inside
the suite (the driver repeats this at sf0.01)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "forecast_revenue_q6",
    "user_event_entropy",
    "unigram_logprob_docs",
    "bottomk_sample_docs",
    "turn_length_stats",
    "label_coherence",
    "lexical_diversity_docs",
    "sentence_stats_docs",
    "source_length_deciles",
    "source_mixing_weights",
    "orders_cohort_retention",
    "supplier_distinct_parts",
    "conv_depth_histogram",
    "dedup_rate_by_source",
    "prefix_dup_docs",
    "cross_source_dup_pairs",
    "customer_spend_deciles",
    "token_length_histogram",
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
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
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
    want = _oracle(entrymod.oracle_sql()[name])
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_bottomk_is_prefix_of_hash_order(ray_session):
    """The bottom-k sample must be the k-prefix of the corpus-wide
    (md5_low64(doc_id), doc_id) order — i.e. growing k only appends."""
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        bottomk_sample_docs,
    )

    small = set(bottomk_sample_docs(SF, k=10)["doc_id"].to_pylist())
    big = set(bottomk_sample_docs(SF, k=25)["doc_id"].to_pylist())
    assert small < big and len(small) == 10 and len(big) == 25


def test_entropy_bounds(ray_session):
    """0 <= H <= ln(n_types) for every user (entropy sanity invariant)."""
    import numpy as np

    import __ray_entry__ as entrymod

    df = entrymod.queries()["user_event_entropy"](SF).to_pandas()
    assert (df["entropy"] >= -1e-12).all()
    assert (df["entropy"] <= np.log(df["n_types"]) + 1e-12).all()
