"""sf0.001 oracle-conformance pins for the fifth-session operators: each new
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
    "nation_market_share",
    "blame_suppliers",
    "events_hopping_counts",
    "qty_discount_spearman",
    "knn_classify",
    "keyword_search_indexed",
    "click_attribution",
    "dup_triangles",
    "event_type_cooccurrence",
    "profile_tables",
    "lang_confusion",
    "part_best_supplier",
    "monthly_revenue_growth",
    "weekday_hour_heatmap",
    "user_features",
    "role_transitions",
    "checksum_docs",
    "encode_docs",
    "order_line_share",
    "upsert_diff",
    "shipping_delay_histogram",
    "revenue_concentration",
    "order_status_census",
    "hourly_error_rate",
    "split_docs",
    "winsorize_events",
    "dup_pair_turn_overlap",
    "brand_weighted_price",
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
