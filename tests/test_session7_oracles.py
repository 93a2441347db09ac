"""sf0.001 oracle-conformance pins for the seventh-session operators: each new
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
    "zipf_slope_corpus",
    "doc_length_gini",
    "debounce_events",
    "fk_violations",
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


def test_debounce_never_keeps_more_than_total(ray_session):
    import __ray_entry__ as entrymod

    got = entrymod.queries()["debounce_events"](SF)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert (df["n_kept"] <= df["n_total"]).all()
    assert (df["n_kept"] >= 1).all()


def test_debounce_window_zero_keeps_everything(ray_session):
    """With a 0-second window only exact same-microsecond repeats drop;
    a negative-window debounce must keep every event."""
    from near_duplicate_detection_ray.pipelines.relational import debounce_events

    df = debounce_events(SF, window_s=-1).to_pandas()
    assert (df["n_kept"] == df["n_total"]).all()


def test_gini_bounds_and_mean(ray_session):
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.text_analysis import doc_length_gini

    df = doc_length_gini(SF).to_pandas()
    g = float(df["gini"].iloc[0])
    assert 0.0 <= g < 1.0
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    exp_mean = t["n_chars"].to_pandas().mean()
    assert abs(float(df["mean_len"].iloc[0]) - exp_mean) < 1e-4
