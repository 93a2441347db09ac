"""Round-2 additions: as-of join tie/boundary semantics, running-spend window,
pivot and JSON-extraction aggregates vs the DuckDB oracle at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, sf_dir: str = SF, tables=("events", "orders")) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def asof_tie_dir(ray_session, tmp_path_factory):
    """Boundary cases: view at the SAME ts as a click (smaller event_id ->
    counts; larger event_id -> does not), click with no prior view, and
    interleaved users."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (event_id, ts, user_id, type)
        (0, base + 0 * s, 1, "view"),
        (1, base + 5 * s, 1, "click"),   # matches view 0, gap 5s
        (2, base + 9 * s, 1, "view"),
        (3, base + 9 * s, 1, "click"),   # equal ts, view id 2 < 3 -> matches, gap 0
        (4, base + 20 * s, 1, "view"),   # equal ts as click 5 but id 4 < 5
        (5, base + 20 * s, 1, "click"),  # matches view 4, gap 0
        (6, base + 30 * s, 2, "click"),  # user 2 has no view -> dropped
        (7, base + 31 * s, 2, "view"),
        (8, base + 40 * s, 3, "error"),  # other types ignored entirely
        (9, base + 41 * s, 3, "click"),  # no view for user 3 -> dropped
    ]
    d = str(tmp_path_factory.mktemp("asof_events"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    return d


def test_asof_join_tie_semantics(asof_tie_dir):
    from near_duplicate_detection_ray.pipelines.relational import events_asof_join

    got = (
        events_asof_join(asof_tie_dir)
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    assert list(got.index) == [1, 3, 5]
    assert got.loc[1, "view_id"] == 0 and got.loc[1, "gap_us"] == 5_000_000
    assert got.loc[3, "view_id"] == 2 and got.loc[3, "gap_us"] == 0
    assert got.loc[5, "view_id"] == 4 and got.loc[5, "gap_us"] == 0


def test_asof_join_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import events_asof_join

    got = _sorted(events_asof_join(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["events_asof_join"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_running_spend_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        customer_running_spend,
    )

    got = _sorted(customer_running_spend(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["customer_running_spend"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_top_event_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import user_top_event

    got = _sorted(user_top_event(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["user_top_event"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_order_histogram_zero_bucket(ray_session, tmp_path_factory):
    """The n=0 bucket (customers with no orders) never occurs in the
    testdata, so plant it: 4 customers, one of whom has no orders."""
    from near_duplicate_detection_ray.pipelines.relational import (
        customer_order_histogram,
    )

    d = str(tmp_path_factory.mktemp("q13"))
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
            }
        ),
        f"{d}/orders.parquet",
    )
    got = _sorted(customer_order_histogram(d).to_pandas())
    import __ray_entry__ as entrymod

    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["customer_order_histogram"],
            sf_dir=d,
            tables=("customer", "orders"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    as_map = dict(zip(got["n_orders"], got["n_customers"]))
    assert as_map == {0: 2, 1: 1, 2: 1}


def test_histogram_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        customer_order_histogram,
    )

    got = _sorted(customer_order_histogram(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["customer_order_histogram"],
            tables=("customer", "orders"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_event_sequence_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        user_event_sequence,
    )

    got = _sorted(user_event_sequence(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["user_event_sequence"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_brand_supplier_counts_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        brand_supplier_counts,
    )

    got = _sorted(brand_supplier_counts(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["brand_supplier_counts"],
            tables=("lineitem", "part"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pivot_and_props_match_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        orders_priority_pivot,
        props_key_stats,
    )

    got = _sorted(orders_priority_pivot(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["orders_priority_pivot"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = _sorted(props_key_stats(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["props_key_stats"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_repeat_customers_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import repeat_customers

    got = _sorted(repeat_customers(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["repeat_customers"],
            tables=("orders", "customer", "nation"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # sf0.001 has repeat customers in 1996+1997


def test_event_value_stats_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import event_value_stats

    got = _sorted(event_value_stats(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["event_value_stats"]))
    # exact value equality INCLUDING the float columns: both sides evaluate
    # the identical IEEE expression over identical integer partials
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["stddev_pop"] >= 0).all()


def test_user_funnel_stages(ray_session, tmp_path_factory):
    """Crafted streams covering every funnel stage, including out-of-order
    events (purchase BEFORE click must not count) and ts ties broken by
    event_id."""
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("funnel"))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (event_id, ts, user_id, type)
        (0, base + 0 * s, 1, "view"),      # user 1: full funnel -> 3
        (1, base + 1 * s, 1, "click"),
        (2, base + 2 * s, 1, "purchase"),
        (3, base + 0 * s, 2, "purchase"),  # user 2: purchase first -> view,click only -> 2
        (4, base + 1 * s, 2, "view"),
        (5, base + 2 * s, 2, "click"),
        (6, base + 0 * s, 3, "view"),      # user 3: view only -> 1
        (7, base + 1 * s, 3, "error"),
        (8, base + 0 * s, 4, "signup"),    # user 4: nothing -> 0
        (9, base + 5 * s, 5, "click"),     # user 5: ts tie, view id 10 > click id 9
        (10, base + 5 * s, 5, "view"),     #   -> order click,view -> stage 1
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    from near_duplicate_detection_ray.pipelines.relational import user_funnel

    got = user_funnel(d).to_pandas().set_index("user_id")["funnel_stage"].to_dict()
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_user_funnel_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import user_funnel

    got = _sorted(user_funnel(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["user_funnel"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["funnel_stage"].max() == 3  # sf0.001 has full-funnel users


def test_idle_customer_balance_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        idle_customer_balance,
    )

    got = _sorted(idle_customer_balance(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["idle_customer_balance"],
            tables=("customer", "orders", "nation"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_customers"].sum() >= 1  # populated at sf0.001


def test_user_event_gaps_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import user_event_gaps

    got = _sorted(user_event_gaps(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["user_event_gaps"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["max_gap_us"] >= 0).all()


def test_lapsed_customers_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import lapsed_customers

    got = _sorted(lapsed_customers(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["lapsed_customers"],
            tables=("orders", "customer", "nation"),
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_event_types_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import user_event_types

    got = _sorted(user_event_types(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["user_event_types"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_full_global_sort_is_ordered_across_blocks(ray_session):
    """O1's full-sort form (no limit): Dataset.sort produces a globally
    monotone stream across block boundaries.  The LIMIT-k queries instead
    use functions/groupagg.global_topk (bounded partials) — this pins the
    full-sort operator itself, which a user needs for ordered exports."""
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    s = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
    prev = None
    n = 0
    for batch in s.iter_batches(batch_size=512, batch_format="pandas"):
        vals = list(zip((-batch["o_totalprice"]).tolist(), batch["o_orderkey"].tolist()))
        assert vals == sorted(vals)
        if prev is not None:
            assert prev <= vals[0]
        prev = vals[-1]
        n += len(vals)
    assert n == ds.count()


def test_global_topk_equals_full_sort(ray_session):
    from near_duplicate_detection_ray.functions.groupagg import global_topk
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    got = global_topk(ds, ["o_totalprice", "o_orderkey"], [True, False], 25).to_pandas()
    want = (
        ds.to_pandas()
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_promo_revenue_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import promo_revenue

    got = _sorted(promo_revenue(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["promo_revenue"], tables=("lineitem", "part")
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    row = got.iloc[0]
    assert 0 < row["promo_rev_c4"] < row["total_rev_c4"]


def test_top_supplier_matches_oracle_and_returns_ties(ray_session, tmp_path_factory):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import top_supplier

    got = _sorted(top_supplier(SF).to_pandas())
    want = _sorted(
        _oracle(
            entrymod.oracle_sql()["top_supplier"], tables=("lineitem", "supplier")
        )
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # tie semantics: two suppliers with IDENTICAL max revenue both return
    d = str(tmp_path_factory.mktemp("q15tie"))
    base = np.datetime64("1997-06-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3], pa.int64()),
                "l_partkey": pa.array([1, 1, 1], pa.int64()),
                "l_suppkey": pa.array([7, 8, 9], pa.int64()),
                "l_linenumber": pa.array([1, 1, 1], pa.int32()),
                "l_quantity": pa.array([1.0, 1.0, 1.0]),
                "l_extendedprice": pa.array([100.0, 100.0, 50.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0]),
                "l_tax": pa.array([0.0, 0.0, 0.0]),
                "l_returnflag": pa.array(["N"] * 3),
                "l_linestatus": pa.array(["O"] * 3),
                "l_shipdate": pa.array([base] * 3, pa.timestamp("us")),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([7, 8, 9], pa.int64()),
                "s_name": pa.array(["sa", "sb", "sc"]),
                "s_nationkey": pa.array([0, 0, 0], pa.int32()),
                "s_acctbal": pa.array([0.0, 0.0, 0.0]),
            }
        ),
        f"{d}/supplier.parquet",
    )
    ties = top_supplier(d).to_pandas()
    assert sorted(ties["s_suppkey"]) == [7, 8]


def test_event_transitions_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import event_transitions

    got = _sorted(event_transitions(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["event_transitions"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every (prev, next) count >= 1 and the matrix keys are event types
    assert (got["n_transitions"] >= 1).all()


def test_normalize_docs_matches_scalar_reference(ray_session):
    """The vectorized normalize map equals functions.text.normalize_text and
    the DuckDB oracle row-for-row."""
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.functions.text import normalize_text
    from near_duplicate_detection_ray.pipelines.text_analysis import normalize_docs

    got = (
        normalize_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["normalize_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    raw = con.execute("SELECT text FROM documents ORDER BY doc_id").df()["text"]
    assert list(got["norm_text"]) == [normalize_text(t) for t in raw]


def test_empty_window_queries_do_not_crash(ray_session):
    """Review finding: year windows matching no rows must return empty/zero
    results with stable schemas, not raise."""
    from near_duplicate_detection_ray.pipelines.relational import (
        promo_revenue,
        top_supplier,
    )

    # Ray drops zero-row blocks at to_pandas (documented platform gotcha),
    # so the contract here is "empty result, no crash"
    ts = top_supplier(SF, year=2015).to_pandas()
    assert len(ts) == 0
    pr = promo_revenue(SF, year=2015).to_pandas()
    assert len(pr) == 1
    assert pr.iloc[0]["total_rev_c4"] == 0 and pr.iloc[0]["promo_ratio"] == 0.0


def test_session_conversion_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        session_conversion,
        user_sessions,
    )

    got = _sorted(session_conversion(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["session_conversion"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # session counts must agree with the independent user_sessions query
    us = user_sessions(SF).to_pandas().set_index("user_id")["n_sessions"]
    sc = got.set_index("user_id")["n_sessions"]
    assert (us.sort_index() == sc.sort_index()).all()
    assert (got["n_converted"] <= got["n_sessions"]).all()


def test_global_value_quantiles_matches_oracle(ray_session, tmp_path_factory):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.relational import (
        global_value_quantiles,
    )

    got = _sorted(global_value_quantiles(SF).to_pandas())
    want = _sorted(_oracle(entrymod.oracle_sql()["global_value_quantiles"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # selection-rule pin on tiny even/odd corpora (quantile_disc lower-element)
    for vals in ([1.0, 2.0, 3.0, 4.0], [5.0, 1.0, 3.0], [2.25]):
        d = str(tmp_path_factory.mktemp("gq"))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(vals)), pa.int64()),
                    "ts": pa.array(
                        [np.datetime64("2024-01-01", "us")] * len(vals),
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([1] * len(vals), pa.int64()),
                    "event_type": pa.array(["x"] * len(vals)),
                    "value": pa.array(vals, pa.float64()),
                    "props": pa.array(["{}"] * len(vals)),
                }
            ),
            f"{d}/events.parquet",
        )
        g = _sorted(global_value_quantiles(d).to_pandas())
        w = _sorted(
            _oracle(
                entrymod.oracle_sql()["global_value_quantiles"],
                sf_dir=d,
                tables=("events",),
            )
        )
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_returned_customer_revenue_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(
        entrymod.oracle_sql()["returned_customer_revenue"],
        tables=("customer", "orders", "lineitem", "nation"),
    )
    got = relational.returned_customer_revenue(SF).to_pandas()
    assert len(got) == 20
    # output arrives globally sorted (revenue desc, custkey asc)
    rv = got["revenue_c4"].to_numpy()
    assert (rv[:-1] >= rv[1:]).all()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_nation_pair_trade_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    # sf0.001 has no suppliers in the default NATION_1/2 — pick a pair that
    # trades at this scale and parameterize the oracle the same way
    n1, n2 = "NATION_18", "NATION_19"
    sql = entrymod.oracle_sql()["nation_pair_trade"].replace(
        "NATION_1'", f"{n1}'"
    ).replace("NATION_2'", f"{n2}'")
    want = _oracle(
        sql, tables=("lineitem", "supplier", "nation", "orders", "customer")
    )
    got = relational.nation_pair_trade(SF, n1=n1, n2=n2).to_pandas()
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)
    assert set(got["supp_nation"]) <= {n1, n2}
    assert (got["supp_nation"] != got["cust_nation"]).all()
    assert got["l_year"].isin([1996, 1997]).all()


def test_nation_pair_trade_empty_side_guard(ray_session):
    """Default NATION_1/2 have no suppliers at sf0.001: the all-empty Acero
    join side must be guarded, returning an empty schema-stable result."""
    from near_duplicate_detection_ray.pipelines import relational

    t = relational.nation_pair_trade(SF)
    # empty results come back as a schema-carrying pyarrow Table (an empty
    # Ray Dataset drops its column names through to_pandas)
    assert isinstance(t, pa.Table)
    assert t.schema.names == [
        "supp_nation", "cust_nation", "l_year", "revenue_c4", "n_items"
    ]
    assert t.num_rows == 0
    assert list(t.to_pandas().columns) == t.schema.names


def test_events_rolling_stats_hand_semantics(ray_session, tmp_path):
    """Window clamps at each user's first rows; ties on ts break by event_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from near_duplicate_detection_ray.pipelines import relational

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (event_id, ts, user_id, value)
        (0, base + 0 * s, 1, 1.00),
        (1, base + 1 * s, 1, 2.00),
        (2, base + 2 * s, 1, 3.00),
        (3, base + 3 * s, 1, 4.00),
        (4, base + 4 * s, 1, 5.00),   # full window: 2+3+4+5
        (5, base + 9 * s, 2, 10.00),  # new user resets the frame
        (6, base + 9 * s, 2, 20.00),  # same ts, larger id -> later in frame
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        relational.events_rolling_stats(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["sum_c"].tolist() == [100, 300, 600, 1000, 1400, 1000, 3000]
    assert got["n_win"].tolist() == [1, 2, 3, 4, 4, 1, 2]
    assert got["avg_value"].tolist() == [1.0, 1.5, 2.0, 2.5, 3.5, 10.0, 15.0]


def test_events_rolling_stats_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(entrymod.oracle_sql()["events_rolling_stats"], tables=("events",))
    got = relational.events_rolling_stats(SF).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_late_event_stats_hand_semantics(ray_session, tmp_path):
    """Planted out-of-order arrivals: event_id is arrival order; lateness is
    measured against the user's running max ts over earlier arrivals."""
    from near_duplicate_detection_ray.pipelines import relational

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (event_id=arrival order, ts, user_id)
        (0, base + 10 * s, 1),
        (1, base + 5 * s, 1),    # late by 5s
        (2, base + 20 * s, 1),
        (3, base + 19 * s, 1),   # late by 1s
        (4, base + 0 * s, 2),    # first arrival never late
        (5, base + 1 * s, 2),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        relational.late_event_stats(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == [4, 2]
    assert got["n_late"].tolist() == [2, 0]
    assert got["max_late_us"].tolist() == [5_000_000, 0]


def test_late_event_stats_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(entrymod.oracle_sql()["late_event_stats"], tables=("events",))
    got = relational.late_event_stats(SF).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_hourly_active_users_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(entrymod.oracle_sql()["hourly_active_users"], tables=("events",))
    got = relational.hourly_active_users(SF).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)
    # distinct users per hour can never exceed events per hour
    ev = _oracle(
        "SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1",
        tables=("events",),
    ).set_index("hour")["n"]
    g = got.set_index("hour")["n_users"]
    assert (g <= ev[g.index]).all()


def test_late_shipment_priority_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(
        entrymod.oracle_sql()["late_shipment_priority"],
        tables=("orders", "lineitem"),
    )
    got = relational.late_shipment_priority(SF).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)
    assert got["n_orders"].sum() > 0


def test_user_event_runs_hand_semantics(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines import relational

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [  # (event_id, ts, user_id, type)
        (0, base + 0 * s, 1, "a"),
        (1, base + 1 * s, 1, "a"),
        (2, base + 2 * s, 1, "b"),
        (3, base + 3 * s, 1, "a"),   # 'a' again -> NEW run, not merged
        (4, base + 0 * s, 2, "b"),
        (5, base + 1 * s, 2, "b"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        relational.user_event_runs(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "run_idx"])
        .reset_index(drop=True)
    )
    assert list(
        zip(got["user_id"], got["run_idx"], got["event_type"], got["run_len"])
    ) == [(1, 1, "a", 2), (1, 2, "b", 1), (1, 3, "a", 1), (2, 1, "b", 2)]


def test_user_event_runs_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(entrymod.oracle_sql()["user_event_runs"], tables=("events",))
    got = relational.user_event_runs(SF).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)
    # run lengths per user sum to the user's event count
    ev = _oracle("SELECT user_id, count(*) AS n FROM events GROUP BY 1",
                 tables=("events",)).set_index("user_id")["n"]
    s = got.groupby("user_id")["run_len"].sum()
    assert (s == ev[s.index]).all()


def test_key_skew_report_matches_oracle(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines import relational

    want = _oracle(entrymod.oracle_sql()["key_skew_report"], tables=("events",))
    got = relational.key_skew_report(SF).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(want), check_dtype=False
    )
    row = got.iloc[0]
    assert row["p50_count"] <= row["p99_count"] <= row["max_count"]


def test_key_skew_report_planted_hot_key(ray_session, tmp_path):
    """A planted hot key must surface as top_key with the right max_count."""
    from near_duplicate_detection_ray.pipelines import relational

    base = np.datetime64("2024-01-01T00:00:00", "us")
    uid = [7] * 50 + [1, 2, 3, 4, 5]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array([base] * len(uid), pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = relational.key_skew_report(str(tmp_path)).to_pandas().iloc[0]
    assert got["top_key"] == 7 and got["max_count"] == 50
    assert got["n_keys"] == 6 and got["n_rows"] == 55
    assert got["p50_count"] == 1 and got["p99_count"] == 50
