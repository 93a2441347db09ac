"""sf0.001 oracle-conformance pins for the ninth-session operators, plus
structural invariants (BM25 monotonicity, graph/moment kernels)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "bm25_search_docs",
    "dup_pagerank",
    "embedding_covariance",
    "source_distinctive_terms",
    "embedding_outliers",
    "hard_negatives",
    "dup_components_docs",
    "compaction_plan",
    "kmeans_assign_embeddings",
    "distinct_kmv_events",
    "source_ols_trend",
    "dup_loss_weights",
    "source_drift_psi",
    "source_ttest_pairs",
    "event_gap_ks",
    "shard_assignment",
    "brand_basket_lift",
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
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False, rtol=0, atol=5e-9
    )


def test_bm25_scores_positive_and_bounded(ray_session):
    """Every returned score is positive (hit docs only) and bounded by the
    theoretical maximum sum of idf_t * (k1 + 1)."""
    import math

    import __ray_entry__ as entrymod

    df = entrymod.queries()["bm25_search_docs"](SF).to_pandas()
    assert len(df) > 0
    assert (df["score"] > 0).all()
    # recompute the idf bound from the oracle's own stats
    stats = _oracle(r"""
        WITH s AS (
            SELECT len(list_filter(w, x -> x = 'spark'))  AS tf1,
                   len(list_filter(w, x -> x = 'window')) AS tf2,
                   len(list_filter(w, x -> x = 'hash'))   AS tf3
            FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS w
                  FROM documents)
        )
        SELECT count(*) AS n,
               sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
               sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
               sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
        FROM s
    """)
    n = int(stats["n"][0])
    bound = sum(
        math.log(1.0 + (n - int(stats[c][0]) + 0.5) / (int(stats[c][0]) + 0.5))
        for c in ("df1", "df2", "df3")
    ) * 2.2
    assert (df["score"] <= bound + 1e-9).all()
    # descending by score with doc_id tiebreak
    s = df["score"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()


def test_pagerank_exchange_path_equals_broadcast(ray_session):
    """The salted-join exchange loop (the >broadcast_max_nodes regime) must
    produce the identical table to the zero-shuffle broadcast loop."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import dup_pagerank

    a = dup_pagerank(SF)
    a = (a.to_pandas() if hasattr(a, "to_pandas") else a)
    if hasattr(a, "to_pandas"):
        a = a.to_pandas()
    b = dup_pagerank(SF, force_exchange=True).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, rtol=0, atol=5e-9)


def test_pagerank_mass_conservation(ray_session):
    """Power-method invariant: total rank mass stays 1 (the graph has no
    dangling nodes), and every rank is >= the teleport floor."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import dup_pagerank

    df = dup_pagerank(SF)
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    n = len(df)
    assert n > 0
    assert abs(df["pr"].sum() - 1.0) < 1e-6
    assert (df["pr"] >= (1.0 - 0.85) / n - 1e-12).all()


def test_embedding_covariance_is_psd(ray_session):
    """The reconstructed full matrix is symmetric positive-semidefinite with
    nonnegative diagonal (a real covariance), pinned against in-process
    numpy.cov on the whole sf0.001 table."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.ann import embedding_covariance

    t = embedding_covariance(SF)
    t = t.to_pandas() if hasattr(t, "to_pandas") else t
    if hasattr(t, "to_pandas"):
        t = t.to_pandas()
    d = int(t["j"].max()) + 1
    c = np.zeros((d, d))
    c[t["i"], t["j"]] = t["cov"]
    c[t["j"], t["i"]] = t["cov"]
    assert (np.diag(c) >= 0).all()
    assert np.linalg.eigvalsh(c).min() >= -1e-8
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.stack(emb["embedding"].to_pylist()).astype(np.float64)
    want = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(c, want, atol=1e-7)


def test_dup_components_distributed_path_equals_driver(ray_session):
    """Forcing max_driver_edges=0 routes through large-star/small-star label
    propagation; the label table must equal the driver union-find's."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        dup_components_docs,
    )

    a = dup_components_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dup_components_docs(SF, max_driver_edges=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kmv_estimate_accuracy(ray_session):
    """The KMV estimate lands within 3/sqrt(k) relative error of the true
    per-type distinct user count (k=64 -> ~37%; typical error is ~12%)."""
    import duckdb

    from near_duplicate_detection_ray.pipelines.relational import (
        distinct_kmv_events,
    )

    t = distinct_kmv_events(SF)
    t = t.to_pandas() if hasattr(t, "to_pandas") else t
    if hasattr(t, "to_pandas"):
        t = t.to_pandas()
    truth = _oracle(
        "SELECT event_type, count(DISTINCT user_id) AS nd "
        "FROM events GROUP BY 1"
    ).set_index("event_type")["nd"]
    for _, row in t.iterrows():
        nd = float(truth[row["event_type"]])
        assert abs(row["est_distinct"] - nd) / nd <= 3.0 / (64 ** 0.5)


def test_pairs_cache_memoizes_default_config(ray_session):
    """Default-config near-dup pairs are materialized once per sf_dir and
    shared by the dup-graph family; an explicit cfg bypasses the cache."""
    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.pipelines import docs_dedup

    docs_dedup.clear_pairs_cache()
    a = docs_dedup.near_dup_pairs_docs(SF)
    b = docs_dedup.near_dup_pairs_docs(SF)
    assert a is b  # memoized materialized dataset
    c = docs_dedup.near_dup_pairs_docs(SF, NDDConfig())
    assert c is not a
    pd.testing.assert_frame_equal(
        a.to_pandas().sort_values(["a", "b"]).reset_index(drop=True),
        c.to_pandas().sort_values(["a", "b"]).reset_index(drop=True),
    )
    docs_dedup.clear_pairs_cache()


def test_shard_assignment_minimal_disruption(ray_session):
    """HRW property: dropping one shard only re-routes the docs that were
    assigned to it (everyone else keeps their shard), and they fail over to
    their precomputed backup."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        shard_assignment,
    )
    from near_duplicate_detection_ray.functions.hashing import md5_low64

    df = shard_assignment(SF).to_pandas()
    dropped = int(df["shard"].mode()[0])
    for _, row in df.head(80).iterrows():
        scores = {
            s: md5_low64(f"{int(row.doc_id)}:{s}")
            for s in range(16) if s != dropped
        }
        new = max(scores, key=lambda s: (scores[s], -s))
        if row["shard"] == dropped:
            assert new == row["backup_shard"]
        else:
            assert new == row["shard"]
