"""sf0.001 oracle-conformance pins for the eighth-session operators, plus
structural invariants (skyline minimality, shuffle-rank bijectivity)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "skyline_orders",
    "epoch_shuffle_docs",
    "top_event_days",
    "mask_tokens_docs",
    "order_fulfillment_recon",
    "dup_jaccard_histogram",
    "nation_profit",
    "bigram_logprob_docs",
    "customer_rfm_scores",
    "daily_revenue_anomaly",
    "price_band_stats",
    "daily_revenue_ewma",
    "weighted_sample_docs",
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
    # atol 5e-9 with rtol 0: every float column is rounded to >= 8 decimals
    # on both sides, so identical values differ by 0 and any real round-8
    # drift differs by >= 1e-8 — the default rtol=1e-5 would silently pass
    # 8th-decimal divergence on 1e8-scale values
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False, rtol=0, atol=5e-9
    )


def test_epoch_shuffle_is_a_permutation(ray_session):
    """Positions are exactly 0..N-1 with no gaps and no repeats, and the
    order is reproducible run to run."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["epoch_shuffle_docs"](SF).to_pandas()
    n = len(df)
    assert sorted(df["pos"].tolist()) == list(range(n))
    assert df["doc_id"].nunique() == n
    df2 = entrymod.queries()["epoch_shuffle_docs"](SF).to_pandas()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = df2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_skyline_block_kernel_vs_brute_force():
    """Vectorized Pareto kernel equals the O(n^2) dominance definition on a
    tie-heavy random grid (small value domain forces equal prices AND equal
    dates across rows)."""
    import numpy as np

    from near_duplicate_detection_ray.pipelines.relational import _skyline_block

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        price = rng.integers(0, 6, n).astype(np.float64)
        date = rng.integers(0, 6, n).astype(np.int64)
        keep = set(_skyline_block(price, date).tolist())
        for i in range(n):
            dominated = any(
                price[j] >= price[i] and date[j] >= date[i]
                and (price[j] > price[i] or date[j] > date[i])
                for j in range(n)
            )
            assert (i not in keep) == dominated, (trial, i)


def test_skyline_merge_invariance(ray_session):
    """The distributed (local partials -> merge) result equals a single-block
    skyline over the whole table — the closure-under-union property the plan
    relies on."""
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import _skyline_block

    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    price = t["o_totalprice"].to_numpy()
    date = t["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64)
    idx = _skyline_block(price, date)
    want = sorted(t["o_orderkey"].to_numpy()[idx].tolist())
    got = entrymod.queries()["skyline_orders"](SF).to_pandas()
    assert sorted(got["o_orderkey"].tolist()) == want


def test_ties_topk_includes_all_ties(ray_session):
    """Every kept (type, day) count must be >= the 3rd-largest count of its
    type, and every dropped day's count strictly below it — rank()<=k
    semantics, not row_number."""
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries()["top_event_days"](SF).to_pandas()
    full = _oracle(
        """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2"""
    )
    for et, grp in full.groupby("event_type"):
        kept = got[got["event_type"] == et]
        thresh = sorted(grp["n"], reverse=True)[: 3][-1]
        assert (kept["n"] >= thresh).all()
        dropped = grp[~grp["day"].isin(kept["day"])]
        assert (dropped["n"] < thresh).all()


def test_mask_tokens_reversible_structure(ray_session):
    """Masking never changes token COUNT (only token content), and the mask
    rate lands near the configured 15%."""
    import __ray_entry__ as entrymod
    import pyarrow.parquet as pq

    got = entrymod.queries()["mask_tokens_docs"](SF).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    m = got.merge(src, on="doc_id")
    assert (
        m["masked_text"].str.split(" ").str.len()
        == m["text"].str.split(" ").str.len()
    ).all()
    total = m["text"].str.split(" ").str.len().sum()
    rate = m["n_masked"].sum() / total
    assert 0.10 < rate < 0.20, rate


def test_skyline_block_empty_input():
    import numpy as np

    from near_duplicate_detection_ray.pipelines.relational import _skyline_block

    out = _skyline_block(np.empty(0, np.float64), np.empty(0, np.int64))
    assert len(out) == 0


def test_weighted_sample_multi_block_prefix(ray_session):
    """The distributed prefix sum must give the same picks regardless of
    block split (forced multi-block vs whatever the read produced)."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        weighted_sample_docs,
    )

    a = weighted_sample_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        weighted_sample_docs(SF, num_blocks=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # selection probability proportional to weight: total hits == k (+-1 edge)
    assert abs(int(a["n_hits"].sum()) - 50) <= 1
