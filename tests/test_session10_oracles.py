"""sf0.001 oracle-conformance pins for the tenth-session operators, plus
structural invariants."""

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
    "customer_survival_km",
    "event_type_counts_cms",
    "snm_dup_pairs",
    "kmv_user_overlap",
    "shard_rebalance_diff",
    "curriculum_order_docs",
    "source_quota_sample",
    "tf_cosine_pairs",
    "k_anonymity_events",
    "daily_revenue_holt",
    "benford_audit_orders",
    "heaps_vocab_growth",
    "daily_revenue_cusum",
    "dup_bfs_depths",
    "dup_kcore",
    "skipgram_lift_pairs",
    "orders_keyset_page",
    "event_value_ecdf",
    "daily_revenue_features",
    "type_hour_independence",
    "brand_triple_support",
    "join_size_cms",
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


def test_km_curve_is_monotone_nonincreasing(ray_session):
    """S(t) must start below 1, never increase, and the at-risk counts must
    strictly decrease along event times."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["customer_survival_km"](SF).to_pandas()
    assert len(df) > 0
    s = df.sort_values("t_days")["s_km"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()
    assert s[0] < 1.0 and (s > 0.0).all()
    n = df.sort_values("t_days")["n_risk"].to_numpy()
    assert (np.diff(n) < 0).all()
    assert (df["d"] >= 1).all() and (df["d"] <= df["n_risk"]).all()


def test_snm_tiny_blocks_equal_default(ray_session):
    """Force sorted blocks tinier than the window (600 docs / 97 blocks ~= 6
    rows at w=6): window pairs must span 3+ blocks through the CHAINED tails
    and still produce the identical pair set."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import snm_dup_pairs

    base = snm_dup_pairs(SF).to_pandas()
    tiny = snm_dup_pairs(SF, num_blocks=97).to_pandas()
    key = ["a", "b"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        tiny.sort_values(key).reset_index(drop=True),
    )
    assert len(base) > 0


def test_kmv_overlap_tracks_exact_intersections(ray_session):
    """KMV union/intersection estimates stay within the sketch's relative
    error envelope (~1/sqrt(k-2) ~ 13% at k=64, allow 3x) of the exact values,
    and degenerate exactly when both sketches hold the full sets."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["kmv_user_overlap"](SF).to_pandas()
    assert len(df) > 0
    exact = _oracle("""
        WITH s AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(DISTINCT a.user_id) FILTER (
                   WHERE b.user_id = a.user_id) AS n_inter
        FROM s a JOIN s b ON a.event_type < b.event_type
                          AND a.user_id = b.user_id
        GROUP BY 1, 2
    """)
    m = df.merge(exact, on=["type_a", "type_b"], how="left").fillna(0)
    assert (df["jaccard_est"].between(0.0, 1.0)).all()
    rel = (m["est_inter"] - m["n_inter"]).abs() / m["n_inter"].clip(lower=1)
    assert (rel <= 0.40).all(), rel.describe()


def test_rebalance_moves_only_to_new_shard(ray_session):
    """Rendezvous minimal-disruption: every moved doc moves TO the joining
    shard (id 16), no doc moves between old shards, and the moved fraction
    is ~1/17 within binomial tolerance."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["shard_rebalance_diff"](SF).to_pandas()
    assert len(df) > 0
    assert (df["shard_after"] == 16).all()
    assert (df["shard_before"] != 16).all()
    n_docs = len(_oracle("SELECT doc_id FROM documents"))
    frac = len(df) / n_docs
    assert abs(frac - 1 / 17) < 4 * (((1 / 17) * (16 / 17) / n_docs) ** 0.5)


def test_curriculum_tiny_blocks_equal_default(ray_session):
    """The sorted-block offset math (global ranks, NTILE boundaries) must be
    invariant to how many blocks the sort emits."""
    from near_duplicate_detection_ray.pipelines.curate import (
        curriculum_order_docs,
    )

    base = curriculum_order_docs(SF).to_pandas()
    tiny = curriculum_order_docs(SF, num_blocks=63).to_pandas()
    s = ["position"]
    pd.testing.assert_frame_equal(
        base.sort_values(s).reset_index(drop=True),
        tiny.sort_values(s).reset_index(drop=True),
    )
    # interleave property: inside a decile, a source never repeats before
    # every other source active at that rn has appeared (rn_src blocks are
    # contiguous and sorted by source)
    g = base.sort_values("position").groupby("decile", sort=False)
    for _, grp in g:
        rn = grp["rn_src"].to_numpy()
        assert (np.diff(rn) >= 0).all()


def test_quota_sums_to_budget_and_tracks_mix(ray_session):
    """Quotas sum exactly to the budget and each source's share differs from
    its corpus share by less than one slot (the Hamilton guarantee)."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["source_quota_sample"](SF).to_pandas()
    assert len(df) == 100
    got = df.groupby("source").size()
    want = _oracle(
        "SELECT source, count(*) AS n FROM documents GROUP BY source"
    ).set_index("source")["n"]
    share = 100 * want / want.sum()
    for s in want.index:
        assert abs(got.get(s, 0) - share[s]) < 1.0


def test_cms_join_size_never_underestimates(ray_session):
    """The CMS inner product is an overestimate-only estimator: for every
    type pair, est >= the exact join size sum_u c_a(u)*c_b(u), and within
    the eps*Na*Nb additive envelope (eps = e/2048, generous 4x slack)."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["join_size_cms"](SF).to_pandas()
    assert len(df) > 0
    exact = _oracle("""
        WITH c AS (SELECT event_type, user_id, count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(sum(a.n * b.n) AS BIGINT) AS true_size,
               (SELECT count(*) FROM events WHERE event_type = a.event_type)
                   * (SELECT count(*) FROM events
                      WHERE event_type = b.event_type) AS nanb
        FROM c a JOIN c b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
        GROUP BY 1, 2
    """)
    m = df.merge(exact, on=["type_a", "type_b"], how="left").fillna(0)
    assert (m["est_join_size"] >= m["true_size"]).all()
    eps = 4 * 2.718281828 / 2048
    assert (m["est_join_size"] - m["true_size"] <= eps * m["nanb"] + 1).all()
