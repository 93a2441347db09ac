"""Relational operator-parity queries over the TPC-H-ish testdata tables.

Each query exercises one operator family from SURVEY §2 in Ray-Data-idiomatic
form, with an exact DuckDB SQL oracle (see ``__ray_entry__.oracle_sql``):

- grouped aggregation (A1) via the map-side-combine pattern
  (``functions/groupagg.lowcard_groupagg``) / two-level aggregation (A2)
- global sort + limit (O1) and grouped-dedup top-k (O2/D1)
- broadcast small-side join (J3) and keyed interval join (J1)
- distinct (A6), filters/projections (M12/M5), time-bucket grouping (§2.9)

Float aggregates are rounded identically on both sides (summation order
differs between engines at the last ULP).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.groupagg import lowcard_groupagg


def _read(sf_dir: str, table: str, columns=None):
    from ..sources.io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_floats(ds, cols: list[str], digits: int = 4):
    def fn(batch: pa.Table) -> pa.Table:
        out = {}
        for name in batch.column_names:
            col = batch[name]
            if name in cols:
                out[name] = pa.array(
                    np.round(col.to_numpy(zero_copy_only=False), digits), pa.float64()
                )
            else:
                out[name] = col
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregation over lineitem: columns pruned at
    the read, computed column vectorized, partial Arrow group_by per block,
    tiny final combine (averages derived as sum/count)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def compute(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return batch.append_column("disc_price", disc_price)

    agg = lowcard_groupagg(
        ds.map_batches(compute, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum"),
            ("l_extendedprice", "sum"),
            ("disc_price", "sum"),
            ("l_discount", "sum"),
            ([], "count_all"),
        ],
        {
            "l_quantity_sum": "sum_qty",
            "l_extendedprice_sum": "sum_base_price",
            "disc_price_sum": "sum_disc_price",
            "l_discount_sum": "sum_disc",
            "count_all": "count_order",
        },
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["count_order"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(
                    np.round(batch["sum_qty"].to_numpy(zero_copy_only=False), 4)
                ),
                "sum_base_price": pa.array(
                    np.round(batch["sum_base_price"].to_numpy(zero_copy_only=False), 4)
                ),
                "sum_disc_price": pa.array(
                    np.round(batch["sum_disc_price"].to_numpy(zero_copy_only=False), 4)
                ),
                "avg_qty": pa.array(
                    np.round(batch["sum_qty"].to_numpy(zero_copy_only=False) / n, 4)
                ),
                "avg_disc": pa.array(
                    np.round(batch["sum_disc"].to_numpy(zero_copy_only=False) / n, 4)
                ),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_orders(sf_dir: str, k: int = 10):
    """Global top-k (O1 semantics: ORDER BY ... LIMIT k) — served by bounded
    per-block partials + one tiny merge (``functions/groupagg.global_topk``)
    instead of a full-table ``Dataset.sort``, which would be an all-to-all
    shuffle of the whole orders table for k rows."""
    from ..functions.groupagg import global_topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return global_topk(ds, ["o_totalprice", "o_orderkey"], [True, False], k)


def order_priority_counts(sf_dir: str):
    """Filter (vectorized predicate) + combiner grouped count."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    filtered = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ),
        batch_format="pyarrow",
    )
    return lowcard_groupagg(
        filtered, ["o_orderpriority"], [([], "count_all")], {"count_all": "n_orders"}
    )


def nation_revenue(sf_dir: str, num_partitions: int | None = None):
    """Revenue per nation: orders JOIN customer (hash join on the large keys)
    with the tiny nation table BROADCAST via ray.put (J3 — no shuffle for the
    small side); final rollup via map-side combine."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    nmap_ref = _nation_lut_ref(sf_dir)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def label(batch: pa.Table) -> pa.Table:
        names = ray.get(nmap_ref)[batch["c_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {"n_name": pa.array(names.tolist(), pa.string()), "o_totalprice": batch["o_totalprice"]}
        )

    agg = lowcard_groupagg(
        joined.map_batches(label, batch_format="pyarrow"),
        ["n_name"],
        [("o_totalprice", "sum")],
        {"o_totalprice_sum": "revenue"},
    )
    return _round_floats(agg, ["revenue"], 4)


def shipped_within_90d(sf_dir: str, num_partitions: int | None = None):
    """Keyed interval join (J1 analogue): lineitems shipped within
    [o_orderdate, o_orderdate + 90 days), counted per order status."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = items.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def in_window(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        mask = (sd >= od) & (sd < od + np.timedelta64(90, "D"))
        return batch.filter(pa.array(mask)).select(["o_orderstatus"])

    return lowcard_groupagg(
        joined.map_batches(in_window, batch_format="pyarrow"),
        ["o_orderstatus"],
        [([], "count_all")],
        {"count_all": "n_items"},
    )


def grouped_topk_events(sf_dir: str, k: int = 5):
    """Grouped-dedup top-k (O2/D1 semantics, without the reference's
    off-by-one): best event per user (value desc, event_id asc), then global
    top-k across users."""
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])

    def best_per_user_block(df):
        # users are co-located by the keyed repartition; vectorized dedup
        df = df.sort_values(["value", "event_id"], ascending=[False, True],
                            kind="mergesort")
        return df.drop_duplicates("user_id", keep="first")

    best = key_partitioned(ds, ["user_id"]).map_batches(
        best_per_user_block, batch_format="pandas", batch_size=None
    )
    # `best` is user-cardinality at scale: bounded partials serve the LIMIT
    from ..functions.groupagg import global_topk

    return global_topk(best, ["value", "event_id"], [True, False], k)


def distinct_event_types(sf_dir: str):
    """Distinct values (A6) with counts, via map-side combine."""
    return lowcard_groupagg(
        _read(sf_dir, "events", ["event_type"]),
        ["event_type"],
        [([], "count_all")],
        {"count_all": "n"},
    )


def events_hourly(sf_dir: str):
    """Time-bucket grouping (the engine's tumbling-window analogue, SURVEY
    §2.9): events per (hour, event_type) with summed value; hour buckets are
    low-cardinality so the combiner pattern applies."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {"hour": hour, "event_type": batch["event_type"], "value": batch["value"]}
        )

    agg = lowcard_groupagg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["hour", "event_type"],
        [([], "count_all"), ("value", "sum")],
        {"count_all": "n_events", "value_sum": "sum_value"},
    )
    return _round_floats(agg, ["sum_value"], 4)


def supplier_balance_by_nation(sf_dir: str):
    """Two-level aggregation (A2): per-nation supplier account-balance stats
    over a small dimension chain (supplier JOIN nation broadcast)."""
    import ray

    nmap_ref = _nation_lut_ref(sf_dir)
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def label(batch: pa.Table) -> pa.Table:
        names = ray.get(nmap_ref)[batch["s_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "n_name": pa.array(names.tolist(), pa.string()),
                "s_acctbal": batch["s_acctbal"],
            }
        )

    agg = lowcard_groupagg(
        ds.map_batches(label, batch_format="pyarrow"),
        ["n_name"],
        [
            ("s_acctbal", "sum"),
            ("s_acctbal", "min"),
            ("s_acctbal", "max"),
            ([], "count_all"),
        ],
        {
            "s_acctbal_sum": "total_bal",
            "s_acctbal_min": "min_bal",
            "s_acctbal_max": "max_bal",
            "count_all": "n_suppliers",
        },
    )
    return _round_floats(agg, ["total_bal"], 4)


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization (the engine's streaming/window analogue, SURVEY §2.9):
    per user, a new session starts when the gap to the previous event exceeds
    ``gap_minutes``.  One keyed shuffle on user_id + vectorized block-local
    pandas (sorted by ts, event_id); equivalent SQL uses lag() over a window.
    Returns user_id, n_sessions, n_events."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def block(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [("user_id", pa.int64()), ("n_sessions", pa.int64()), ("n_events", pa.int64())]
        )
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ts = df.groupby("user_id")["ts"].shift(1)
        new_session = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        g = df.assign(new_session=new_session.astype("int64")).groupby("user_id")
        out = g.agg(n_sessions=("new_session", "sum"), n_events=("ts", "size")).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "n_sessions": pa.array(out["n_sessions"].to_numpy(), pa.int64()),
                "n_events": pa.array(out["n_events"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def user_session_intervals(sf_dir: str, gap_minutes: int = 30):
    """Per-user session INTERVALS (user_id, session_id, t_start, t_end):
    the interval-producing half of sessionization — one keyed shuffle on
    user_id, vectorized block-local gap detection (same rule as
    ``user_sessions``)."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("t_start", pa.timestamp("us")),
            ("t_end", pa.timestamp("us")),
        ]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ts = df.groupby("user_id")["ts"].shift(1)
        new_session = (prev_ts.isna() | ((df["ts"] - prev_ts) > gap)).astype("int64")
        df = df.assign(session_id=new_session.groupby(df["user_id"]).cumsum())
        g = df.groupby(["user_id", "session_id"])
        out = g["ts"].agg(t_start="min", t_end="max").reset_index()
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def session_event_stats(sf_dir: str, gap_minutes: int = 30):
    """Events matched back into their session INTERVALS via the general keyed
    interval join (``stages/rangejoin.interval_join`` — SURVEY §2 J1), then a
    grouped rollup: (user_id, session_id, t_start, t_end, n_events).

    Every event falls in exactly one session interval (sessions partition a
    user's timeline with > gap between them), so the rollup reproduces the
    session sizes — which is what the windowed-SQL oracle computes
    independently via a running new-session sum."""
    from ..functions.groupagg import highcard_groupagg
    from ..stages.rangejoin import interval_join

    points = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    intervals = user_session_intervals(sf_dir, gap_minutes)
    joined = interval_join(
        points, intervals, key=["user_id"], point_col="ts",
        lo_col="t_start", hi_col="t_end", closed="both",
    )
    stats = highcard_groupagg(
        joined.select_columns(["user_id", "session_id", "t_start", "t_end"]),
        ["user_id", "session_id", "t_start", "t_end"],
        [([], "count_all")],
        {"count_all": "n_events"},
    )
    return stats


def events_trailing_1h(sf_dir: str, window_minutes: int = 60):
    """Per-event TRAILING sliding-window aggregate (§2.9 widening): for every
    event, the count and value-sum of the same user's events with
    ``ts in (ts_i - window, ts_i]``.

    One keyed hash-partition on user_id, then a fully vectorized block kernel:
    events sorted by (user, ts, event_id) are mapped to a single monotone
    int64 key (user-rank banding wider than the window, so window arithmetic
    can never cross users), window boundaries come from two global
    ``np.searchsorted`` calls, and window sums from one prefix-cumsum
    difference — no per-user loop, no per-event loop, no self-join shuffle.

    Values are summed as integer CENTS (``sum_cents``): float summation order
    differs between engines, integer sums are exact on both sides — the SQL
    oracle sums the same ``CAST(round(value*100) AS BIGINT)``.
    """
    import pandas as pd

    from ..state.partitioning import key_partitioned

    window_us = np.int64(window_minutes) * 60 * 1_000_000
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("n_trailing", pa.int64()),
         ("sum_cents", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rank = pd.factorize(df["user_id"], sort=False)[0].astype(np.int64)
        tmin = ts.min()
        span = (ts.max() - tmin) + window_us + 1
        key = rank * span + (ts - tmin)
        left = np.searchsorted(key, key - window_us, side="right")
        right = np.searchsorted(key, key, side="right")
        cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                "n_trailing": pa.array(right - left, pa.int64()),
                "sum_cents": pa.array(csum[right] - csum[left], pa.int64()),
            },
            schema=out_schema,
        )

    parts = key_partitioned(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        ["user_id"],
    )
    return parts.map_batches(block, batch_format="pandas", batch_size=None)


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1995-03-15", k: int = 10,
                      num_partitions: int | None = None):
    """TPC-H Q3 shape: top-k unshipped-revenue orders for a market segment —
    a 3-relation chain exercising broadcast semi-join + hash join + keyed
    group-agg + global sort/limit in one pipeline.

    The segment's customer keys are the SMALL side: collected off the pruned
    customer read, broadcast once (``ray.put``), applied to orders with one
    vectorized ``pc.is_in`` (at extreme scale this becomes a hash join; the
    segment filter keeps it broadcast-sized here).  Revenue is summed in
    integer 1e-4 units (price-cents x (100 - discount-cents)): float addition
    order differs between engines, integer sums are exact — the SQL oracle
    sums the identical casts.  Ties are broken (revenue desc, o_orderdate
    asc, l_orderkey asc), so top-k is deterministic."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    cutoff_d = np.datetime64(cutoff)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], segment)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    key_arr = pa.concat_tables(
        [b for b in keys.iter_batches(batch_size=65536, batch_format="pyarrow")
         if b.num_columns]
    )["c_custkey"].combine_chunks()
    keys_ref = ray.put(key_arr)

    def keep_segment(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        return t.filter(pc.is_in(t["o_custkey"], value_set=ks))

    def before_cutoff(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(od < cutoff_d))

    def after_cutoff(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(sd > cutoff_d))

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(before_cutoff, batch_format="pyarrow")
        .map_batches(keep_segment, batch_format="pyarrow")
    )
    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(after_cutoff, batch_format="pyarrow")

    # tiny scale factors leave the filters sparse enough to produce
    # schema-less empty blocks, which crash the Acero join (the Ray 2.49
    # failure materialize_clean exists for) — scrub both join inputs
    from ..state.partitioning import materialize_clean

    items_m = materialize_clean(items)
    orders_m = materialize_clean(orders)
    out_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
         ("revenue_c4", pa.int64())]
    )
    if items_m.count() == 0 or orders_m.count() == 0:
        import ray.data as rd

        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    joined = items_m.join(
        orders_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def revenue(t: pa.Table) -> pa.Table:
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "rev": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    from ..functions.groupagg import highcard_groupagg

    agg = highcard_groupagg(
        joined.map_batches(revenue, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate"],
        [("rev", "sum")],
        {"rev_sum": "revenue_c4"},
    )
    from ..functions.groupagg import global_topk

    # per-order agg output is order-cardinality at scale: bounded partials,
    # not a full sort, serve the LIMIT k
    return global_topk(
        agg, ["revenue_c4", "o_orderdate", "l_orderkey"], [True, False, False], k
    )


def large_quantity_orders(sf_dir: str, threshold: int = 300, k: int = 10,
                          num_partitions: int | None = None):
    """TPC-H Q18 shape: orders whose total line quantity exceeds ``threshold``,
    with customer attribution — the HAVING-filter + join-back pattern (an
    aggregate produces the key set that then drives two hash joins).

    Quantities are integral doubles; each is cast to int64 before summing so
    both engines sum exactly (no float addition-order sensitivity).  The
    post-HAVING key set is tiny (~0.1% of orders at threshold 300), so the
    join chain runs at small ``num_partitions``; a materialize_clean barrier
    scrubs the sparse-join empty-block footgun between the two joins."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import materialize_clean

    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "q": pa.array(q, pa.int64())})

    per_order = highcard_groupagg(
        items.map_batches(qty, batch_format="pyarrow"),
        ["l_orderkey"],
        [("q", "sum")],
        {"q_sum": "total_qty"},
    )
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], threshold)),
        batch_format="pyarrow",
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    j = materialize_clean(
        big.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = j.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = j2.select_columns(
        ["c_name", "o_custkey", "l_orderkey", "o_orderdate", "o_totalprice", "total_qty"]
    )
    from ..functions.groupagg import global_topk

    return global_topk(
        out, ["o_totalprice", "o_orderdate", "l_orderkey"], [True, False, False], k
    )


def customers_without_orders(sf_dir: str, year: int = 1997):
    """ANTI-join (TPC-H Q22 family; the batch form of SURVEY §2 D4
    stale-entry eviction): customers with NO orders in ``year``, rolled up
    per nation.

    The year's order-customer key set is built OFF-DRIVER (per-block unique +
    remote tree merge — ``state/partitioning.distinct_values_ref``) and the
    anti-side applies one vectorized inverted ``pc.is_in`` per batch; the
    tiny nation table is broadcast for labeling.  No shuffle touches the
    customer table at all."""
    import ray

    from ..state.partitioning import distinct_values_ref

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def in_year(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((od >= lo) & (od < hi)))

    ids_ref, _n = distinct_values_ref(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            in_year, batch_format="pyarrow"
        ),
        ["o_custkey"],
    )

    nmap_ref = _nation_lut_ref(sf_dir)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def anti(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        keep = pc.invert(pc.is_in(batch["c_custkey"], value_set=ids))
        t = batch.filter(keep)
        names = ray.get(nmap_ref)[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {"n_name": pa.array(names.tolist(), pa.string()), "c_acctbal": t["c_acctbal"]}
        )

    agg = lowcard_groupagg(
        cust.map_batches(anti, batch_format="pyarrow"),
        ["n_name"],
        [("c_acctbal", "sum"), ([], "count_all")],
        {"c_acctbal_sum": "total_bal", "count_all": "n_customers"},
    )
    return _round_floats(agg, ["total_bal"], 4)


def event_value_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99)):
    """Per-group DISCRETE quantiles of event value — the order-statistic
    aggregate family (quantiles don't decompose into partials, so this is a
    keyed repartition + block-local sorted-group scan, NOT a combiner agg).

    Discrete (element-picking) quantiles are used deliberately: numpy's
    ``method='inverted_cdf'`` and DuckDB's ``quantile_disc`` return the
    identical corpus element (verified bit-exact across sizes/q), so the
    oracle hash matches with no interpolation-ULP risk.  At scale each
    event_type group must fit a block; for heavy-hitter groups the upgrade
    path is a distributed t-digest sketch (approximate) or a two-pass
    count-then-select."""
    from ..functions.groupagg import lowcard_groupagg  # noqa: F401  (family ref)
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def block(batch: pa.Table) -> pa.Table:
        cols = {
            "event_type": [],
            "n_events": [],
            **{f"p{int(q * 100):02d}": [] for q in qs},
        }
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    **{f"p{int(q * 100):02d}": pa.array([], pa.float64()) for q in qs},
                }
            )
        enc = batch["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        ends = np.append(starts[1:], len(cs))
        for s, e in zip(starts, ends):
            cols["event_type"].append(enc.dictionary[cs[s]].as_py())
            cols["n_events"].append(int(e - s))
            seg = vs[s:e]  # already sorted
            for q in qs:
                cols[f"p{int(q * 100):02d}"].append(
                    float(np.quantile(seg, q, method="inverted_cdf"))
                )
        return pa.table(
            {
                "event_type": pa.array(cols["event_type"], pa.string()),
                "n_events": pa.array(cols["n_events"], pa.int64()),
                **{
                    f"p{int(q * 100):02d}": pa.array(
                        cols[f"p{int(q * 100):02d}"], pa.float64()
                    )
                    for q in qs
                },
            }
        )

    return key_partitioned(ds, ["event_type"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def event_value_quantiles_cont(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99)):
    """Per-group CONTINUOUS (linearly interpolated) quantiles — the
    ``quantile_cont`` / ``percentile_cont`` flavor, completing the
    order-statistic family next to the discrete picker above.  Same keyed
    repartition + block-local sorted-group scan; the interpolation
    ``lo + frac * (hi - lo)`` at ``pos = (n-1)*q`` is the identical IEEE
    expression DuckDB's quantile_cont evaluates (probed bit-equal across
    sizes and q), so the gate hash matches despite the floats."""
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_type", "value"])
    names = [f"p{int(q * 100):02d}" for q in qs]

    def block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                **{nm: pa.array([], pa.float64()) for nm in names},
            }
        )
        if batch.num_rows == 0 or batch.num_columns == 0:
            return empty
        enc = batch["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        ends = np.append(starts[1:], len(cs))
        cols = {"event_type": [], "n_events": [], **{nm: [] for nm in names}}
        for s, e in zip(starts, ends):
            cols["event_type"].append(enc.dictionary[cs[s]].as_py())
            n = int(e - s)
            cols["n_events"].append(n)
            seg = vs[s:e]
            for q, nm in zip(qs, names):
                pos = (n - 1) * q
                lo = int(np.floor(pos))
                hi = min(lo + 1, n - 1)
                frac = pos - lo
                cols[nm].append(float(seg[lo] + frac * (seg[hi] - seg[lo])))
        return pa.table(
            {
                "event_type": pa.array(cols["event_type"], pa.string()),
                "n_events": pa.array(cols["n_events"], pa.int64()),
                **{nm: pa.array(cols[nm], pa.float64()) for nm in names},
            }
        )

    return key_partitioned(ds, ["event_type"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def nation_yearly_rollup(sf_dir: str, num_partitions: int | None = None):
    """ROLLUP aggregate (nation, order-year) -> per-nation subtotal -> grand
    total, as one base aggregation plus two derived re-aggregations of the
    TINY base result unioned together — the multi-level-agg composition
    (SURVEY §2 A2 generalized).  Subtotal rows use sentinels ('ALL', -1)
    instead of SQL ROLLUP NULLs so hashing is dtype-stable.  Revenue is
    summed in integer cents: re-aggregating rounded floats would drift at
    the last ULP, integers re-aggregate exactly at every level."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    nmap_ref = _nation_lut_ref(sf_dir)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def label(batch: pa.Table) -> pa.Table:
        names = ray.get(nmap_ref)[batch["c_nationkey"].to_numpy(zero_copy_only=False)]
        yr = pc.cast(pc.year(batch["o_orderdate"]), pa.int64())
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array(names.tolist(), pa.string()),
                "yr": yr,
                "cents": pa.array(cents, pa.int64()),
            }
        )

    base = lowcard_groupagg(
        joined.map_batches(label, batch_format="pyarrow"),
        ["n_name", "yr"],
        [("cents", "sum"), ([], "count_all")],
        {"cents_sum": "revenue_c", "count_all": "n_orders"},
    )

    # the base result is tiny (nations x years); derive the upper levels
    # from it rather than re-scanning the fact table
    base_tbl = pa.concat_tables(
        b for b in base.iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_columns
    )
    df = base_tbl.to_pandas()
    sub = (
        df.groupby("n_name", as_index=False)[["revenue_c", "n_orders"]]
        .sum()
        .assign(yr=-1)
    )
    tot = pa.table(
        {
            "n_name": pa.array(["ALL"], pa.string()),
            "yr": pa.array([-1], pa.int64()),
            "revenue_c": pa.array([int(df["revenue_c"].sum())], pa.int64()),
            "n_orders": pa.array([int(df["n_orders"].sum())], pa.int64()),
        }
    )
    cols = ["n_name", "yr", "revenue_c", "n_orders"]
    sub_tbl = pa.Table.from_pandas(sub[cols], preserve_index=False).cast(tot.schema)
    import ray.data as rd

    return rd.from_arrow(
        pa.concat_tables([base_tbl.select(cols).cast(tot.schema), sub_tbl, tot])
    )


def brand_revenue(sf_dir: str, num_partitions: int | None = None):
    """Revenue per part brand: lineitem JOIN part — the MEDIUM-dimension
    case where the dimension (part, ~SF x 200k rows) is too large to
    broadcast, so it takes a real hash join, followed by the combiner
    rollup onto the small brand key.  Revenue in integer 1e-4 units
    (price-cents x (100 - discount-cents)) so both engines sum exactly."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    items = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = items.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def revenue(t: pa.Table) -> pa.Table:
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "rev": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    return lowcard_groupagg(
        joined.map_batches(revenue, batch_format="pyarrow"),
        ["p_brand"],
        [("rev", "sum"), ([], "count_all")],
        {"rev_sum": "revenue_c4", "count_all": "n_items"},
    )


def region_revenue(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q5 family: revenue per region — a TWO-LEVEL broadcast snowflake
    (nation -> region both tiny: one composed customer-key -> region-name
    lookup shipped via ray.put) over the orders JOIN customer hash join.
    Exercises the last otherwise-unused table (region) and the snowflake-
    dimension-collapse pattern: pre-join the dimension chain driver-side,
    broadcast the collapsed map once."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    lut = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    lut[nation["n_nationkey"].to_numpy()] = [
        rname[k] for k in nation["n_regionkey"]
    ]
    rmap_ref = ray.put(lut)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def label(batch: pa.Table) -> pa.Table:
        names = ray.get(rmap_ref)[batch["c_nationkey"].to_numpy(zero_copy_only=False)]
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "r_name": pa.array(names.tolist(), pa.string()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return lowcard_groupagg(
        joined.map_batches(label, batch_format="pyarrow"),
        ["r_name"],
        [("cents", "sum"), ([], "count_all")],
        {"cents_sum": "revenue_c", "count_all": "n_orders"},
    )


def events_asof_join(sf_dir: str, point_type: str = "click",
                     ref_type: str = "view"):
    """AS-OF join (the general form of SURVEY §2 J1's nearest-previous
    lookup, cf. reference ``server_ndd.py:217-220`` keeping the LAST shot
    starting before a frame timestamp): for every ``point_type`` event, the
    same user's most recent PRECEDING ``ref_type`` event.

    "Preceding" is defined on the total order (ts, event_id) — deterministic
    even under equal timestamps, and exactly what the windowed-SQL oracle
    computes with ``last_value(... IGNORE NULLS) ... 1 PRECEDING``.

    One keyed hash-partition on user_id, then a fully vectorized block
    kernel: rows sorted by (user, ts, event_id) get dense positions; the
    as-of match for each point is the reference row at the largest position
    below it (one ``np.searchsorted``), valid only when it belongs to the
    same user.  No per-user loop, no self-join shuffle — the same partition
    discipline scales to any number of users."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("view_id", pa.int64()), ("gap_us", pa.int64())]
    )
    types = pa.array([point_type, ref_type])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=types))

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy()
        is_ref = (df["event_type"] == ref_type).to_numpy()
        pos = np.arange(len(df))
        ref_pos = pos[is_ref]
        pt_pos = pos[~is_ref]
        if len(ref_pos) == 0 or len(pt_pos) == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        idx = np.searchsorted(ref_pos, pt_pos) - 1
        cand = ref_pos[np.clip(idx, 0, None)]
        valid = (idx >= 0) & (users[cand] == users[pt_pos])
        p, c = pt_pos[valid], cand[valid]
        return pa.table(
            {
                "event_id": pa.array(eid[p], pa.int64()),
                "user_id": pa.array(users[p], pa.int64()),
                "view_id": pa.array(eid[c], pa.int64()),
                "gap_us": pa.array(ts[p] - ts[c], pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
        keep, batch_format="pyarrow"
    )
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def customer_running_spend(sf_dir: str):
    """Per-customer RUNNING total of order value — the cumulative-window
    aggregate (SQL ``SUM() OVER (PARTITION BY ... ORDER BY ...)``), which
    does not decompose into combiner partials: one keyed hash-partition on
    o_custkey, then a block-local vectorized prefix-cumsum with per-group
    rebasing (global cumsum minus each group's start offset — no per-group
    loop).  Values accumulate as integer cents so both engines sum exactly
    in any association order."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_orderdate", pa.timestamp("us")), ("spend_c", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        cust = df["o_custkey"].to_numpy()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        cs = np.cumsum(cents)
        starts = np.flatnonzero(np.concatenate(([True], cust[1:] != cust[:-1])))
        grp_base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
        base = np.repeat(grp_base, np.diff(np.append(starts, len(cust))))
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "o_custkey": pa.array(cust, pa.int64()),
                "o_orderdate": pa.array(
                    df["o_orderdate"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "spend_c": pa.array(cs - base, pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])
    return key_partitioned(ds, ["o_custkey"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def orders_priority_pivot(sf_dir: str):
    """PIVOT-style conditional aggregation: order counts per year x priority,
    one column per (known, low-cardinality) priority.  The pivot becomes
    five vectorized indicator columns summed by the map-side combiner — no
    wide shuffle, no per-row Python; identical to SQL's
    ``COUNT(CASE WHEN ...)`` family."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def indicators(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        cols = {"yr": yr}
        for p in _PRIORITIES:
            name = "p" + p.split("-")[0]
            cols[name] = pc.cast(pc.equal(t["o_orderpriority"], p), pa.int64())
        return pa.table(cols)

    names = ["p" + p.split("-")[0] for p in _PRIORITIES]
    return lowcard_groupagg(
        ds.map_batches(indicators, batch_format="pyarrow"),
        ["yr"],
        [(n, "sum") for n in names] + [([], "count_all")],
        {**{f"{n}_sum": n for n in names}, "count_all": "n_orders"},
    )


def priority_unpivot(sf_dir: str):
    """UNPIVOT / melt — the wide-to-long reshape inverse of
    :func:`orders_priority_pivot`: the per-year priority-count columns melt
    back into (yr, priority, n_orders) rows.  The melt runs over the TINY
    pivoted table (|years| rows) with one vectorized repeat/tile — the
    distributed work is the same single combiner aggregation the pivot
    does; reshaping never touches the raw table."""
    import ray.data as rd

    wide = pa.concat_tables(
        b for b in orders_priority_pivot(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    )
    names = ["p" + p.split("-")[0] for p in _PRIORITIES]
    n = wide.num_rows
    yr = wide["yr"].to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            "yr": pa.array(np.repeat(yr, len(_PRIORITIES)), pa.int64()),
            "priority": pa.array(
                np.tile(np.asarray(_PRIORITIES, object), n), pa.string()),
            "n_orders": pa.array(
                np.stack(
                    [wide[nm].to_numpy(zero_copy_only=False) for nm in names],
                    axis=1,
                ).reshape(-1),
                pa.int64(),
            ),
        }
    )
    return rd.from_arrow(out)


def props_key_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of the
    JSON ``props`` string column with ONE vectorized RE2 kernel
    (``pc.extract_regex`` — no per-row json.loads), then the combiner
    grouped aggregate per event_type.  The SQL oracle extracts with the
    identical regex, so both sides parse the same bytes."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    agg = lowcard_groupagg(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        [("k", "sum"), ("k", "count"), ([], "count_all")],
        {"k_sum": "sum_k", "k_count": "n_with_k", "count_all": "n_events"},
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = np.round(
            t["sum_k"].to_numpy(zero_copy_only=False)
            / t["n_with_k"].to_numpy(zero_copy_only=False),
            4,
        )
        return t.append_column("avg_k", pa.array(avg, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def user_top_event(sf_dir: str):
    """MODE / arg-max aggregate per group: each user's most frequent event
    type (ties broken alphabetically), with its count and the user's total.

    The mode does not decompose into combiner partials over high-cardinality
    groups, so the shape is the order-statistic one: ONE keyed hash-partition
    on user_id, then a block-local vectorized kernel (pandas group count ->
    sort by (user, count desc, type) -> first row per user) — no per-user
    Python, no second shuffle.  The SQL oracle ranks with the identical
    (n DESC, event_type) window order."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("top_event", pa.string()),
         ("n_top", pa.int64()), ("n_events", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        c = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        totals = c.groupby("user_id", sort=False)["n"].transform("sum")
        c = c.assign(n_events=totals).sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = c.drop_duplicates("user_id", keep="first")
        return pa.table(
            {
                "user_id": pa.array(top["user_id"].to_numpy(), pa.int64()),
                "top_event": pa.array(top["event_type"].tolist(), pa.string()),
                "n_top": pa.array(top["n"].to_numpy(), pa.int64()),
                "n_events": pa.array(top["n_events"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def customer_order_histogram(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q13 shape — LEFT-join-with-zero-fill histogram: how many
    customers placed exactly n orders, INCLUDING n = 0.

    No actual left join runs: per-customer order counts come from one keyed
    aggregate over orders alone; the counts-of-counts rollup is tiny
    (combiner pattern); and the n=0 bucket is derived from two off-driver
    scalars (total customers - customers with orders) — the zero-fill side
    of a left join costs two counts instead of shuffling the whole customer
    table."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray.data as rd

    from ..functions.groupagg import highcard_groupagg

    per_cust = highcard_groupagg(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"],
        [([], "count_all")],
        {"count_all": "n_orders"},
        num_partitions=num_partitions,
    )
    hist = lowcard_groupagg(
        per_cust.select_columns(["n_orders"]),
        ["n_orders"],
        [([], "count_all")],
        {"count_all": "n_customers"},
    )
    tbl = pa.concat_tables(
        b for b in hist.iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_columns
    )
    n_customers_total = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with_orders = int(pc.sum(tbl["n_customers"]).as_py()) if tbl.num_rows else 0
    n_zero = n_customers_total - n_with_orders
    schema = pa.schema(
        [("n_orders", pa.int64()), ("n_customers", pa.int64())]
    )
    parts = [tbl.cast(schema)] if tbl.num_rows else []
    if n_zero > 0:  # the zero bucket exists only when some customer has no order
        parts.append(
            pa.table(
                {"n_orders": pa.array([0], pa.int64()),
                 "n_customers": pa.array([n_zero], pa.int64())},
                schema=schema,
            )
        )
    return rd.from_arrow(pa.concat_tables(parts) if parts else schema.empty_table())


def brand_supplier_counts(sf_dir: str, num_partitions: int | None = None):
    """GROUPED COUNT(DISTINCT) (TPC-H Q16 family): distinct suppliers and
    distinct parts shipped per part brand.

    Distinct-count does not combine, so the shape is dedup-then-count: one
    keyed hash-partition on the (brand-carrying) join output deduped
    block-locally per (brand, supplier) / (brand, part), then the tiny
    counts-per-brand rollup via the map-side combiner.  The brand arrives
    by hash join with part (the medium dimension, same as
    ``brand_revenue``)."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    from ..functions.groupagg import highcard_groupagg

    items = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    parts = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = items.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    # dedup (brand, suppkey) and (brand, partkey) in ONE keyed pass each;
    # group_by with no aggregates = distinct rows within the co-located block
    supp = highcard_groupagg(
        joined.select_columns(["p_brand", "l_suppkey"]),
        ["p_brand", "l_suppkey"],
        [([], "count_all")],
        {"count_all": "_n"},
        num_partitions=num_partitions,
    )
    part_d = highcard_groupagg(
        joined.select_columns(["p_brand", "l_partkey"]),
        ["p_brand", "l_partkey"],
        [([], "count_all")],
        {"count_all": "_n"},
        num_partitions=num_partitions,
    )
    ns = lowcard_groupagg(
        supp.select_columns(["p_brand"]), ["p_brand"], [([], "count_all")],
        {"count_all": "n_suppliers"},
    ).to_pandas()
    np_ = lowcard_groupagg(
        part_d.select_columns(["p_brand"]), ["p_brand"], [([], "count_all")],
        {"count_all": "n_parts"},
    ).to_pandas()
    import ray.data as rd

    out = ns.merge(np_, on="p_brand")
    return rd.from_arrow(
        pa.table(
            {
                "p_brand": pa.array(out["p_brand"].tolist(), pa.string()),
                "n_suppliers": pa.array(out["n_suppliers"].to_numpy(), pa.int64()),
                "n_parts": pa.array(out["n_parts"].to_numpy(), pa.int64()),
            }
        )
    )


def user_event_sequence(sf_dir: str):
    """ORDERED string aggregation per group (collect_list / string_agg
    family — the relational cousin of the flagship's transcript assemble,
    `stages/assemble.py`): each user's comma-joined event-type sequence in
    (ts, event_id) order, plus its length.

    One keyed hash-partition on user_id, then a block-local vectorized
    kernel: sort once, then per-group join via pandas' C-level groupby-agg
    (no per-user Python function).  The SQL oracle uses string_agg with the
    identical ORDER BY."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("event_seq", pa.string()),
         ("n_events", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=True)["event_type"]
        out = g.agg([("event_seq", ",".join), ("n_events", "size")]).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "event_seq": pa.array(out["event_seq"].tolist(), pa.string()),
                "n_events": pa.array(out["n_events"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def _nation_lut_ref(sf_dir: str):
    """Broadcast nationkey -> name lookup (ray.put once, read per task)."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    lut = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    lut[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    return ray.put(lut)


def _two_year_custkey_refs(sf_dir: str, y1: int, y2: int):
    """Distinct order-customer keys for BOTH years from ONE scan of orders:
    per-block distinct (custkey, year-tag) partials, a remote dedup tree,
    and one split task returning two object-store arrays — the driver never
    touches keys and orders is read once, not once per year."""
    import ray

    bounds = [
        (np.datetime64(f"{y}-01-01", "us"), np.datetime64(f"{y + 1}-01-01", "us"))
        for y in (y1, y2)
    ]

    def block_pairs(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        ks, ys = [], []
        for tag, (lo, hi) in enumerate(bounds, start=1):
            u = np.unique(ck[(od >= lo) & (od < hi)])
            ks.append(u)
            ys.append(np.full(len(u), tag, np.int8))
        return pa.table(
            {"k": pa.array(np.concatenate(ks), pa.int64()),
             "y": pa.array(np.concatenate(ys), pa.int8())}
        )

    refs = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(block_pairs, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def merge(*tables):
        tt = [t for t in tables if t.num_rows and t.num_columns]
        if not tt:
            return pa.table(
                {"k": pa.array([], pa.int64()), "y": pa.array([], pa.int8())}
            )
        cat = pa.concat_tables(tt)
        df = cat.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 64]) for i in range(0, len(refs), 64)]

    @ray.remote(num_returns=2)
    def split(t):
        k = t["k"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.array(np.unique(k[y == 1])), pa.array(np.unique(k[y == 2]))

    return split.remote(refs[0])


def _customers_per_nation(sf_dir: str, keys_ref):
    """Count customers per nation among those whose key is in ``keys_ref``
    (broadcast ``pc.is_in`` filter + nation-label combiner rollup)."""
    import ray

    nmap_ref = _nation_lut_ref(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch["c_custkey"], value_set=ray.get(keys_ref)))
        names = ray.get(nmap_ref)[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table({"n_name": pa.array(names.tolist(), pa.string())})

    return lowcard_groupagg(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            keep, batch_format="pyarrow"
        ),
        ["n_name"],
        [([], "count_all")],
        {"count_all": "n_customers"},
    )


def repeat_customers(sf_dir: str, y1: int = 1996, y2: int = 1997):
    """INTERSECT of two derived key sets (set-op family): customers with at
    least one order in BOTH ``y1`` and ``y2``, rolled up per nation.

    Both years' distinct keys come from ONE off-driver orders scan
    (``_two_year_custkey_refs``); the intersection happens in one remote
    task (the driver never sees keys); the result broadcasts into a single
    ``pc.is_in`` filter over customer + the nation combiner rollup."""
    import ray

    r1, r2 = _two_year_custkey_refs(sf_dir, y1, y2)

    @ray.remote
    def intersect(a, b):
        return pa.array(
            np.intersect1d(
                a.to_numpy(zero_copy_only=False), b.to_numpy(zero_copy_only=False)
            )
        )

    return _customers_per_nation(sf_dir, intersect.remote(r1, r2))


def event_value_stats(sf_dir: str):
    """Per-group VARIANCE family (mean + population stddev): decomposes into
    combiner partials (n, sum, sum-of-squares).  Values are summed as exact
    integer CENTS (and squared cents) so both engines aggregate identically
    in any association order; only the final mean/stddev expression is
    floating point, and it is the IDENTICAL IEEE expression on both sides."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"],
             "c": pa.array(c, pa.int64()),
             "c2": pa.array(c * c, pa.int64())}
        )

    agg = lowcard_groupagg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["event_type"],
        [("c", "sum"), ("c2", "sum"), ([], "count_all")],
        {"c_sum": "sum_c", "c2_sum": "sum_c2", "count_all": "n_events"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["sum_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t["sum_c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        # NO rounding: both engines compute these exact IEEE expressions over
        # identical integer partials, so the doubles are bit-identical as-is;
        # a final round() would REINTRODUCE divergence (np.round is half-even,
        # DuckDB round is half-away — they differ on representable half-ties)
        mean = s / n / 100.0
        var = (s2 / n - (s / n) * (s / n)) / 10000.0
        std = np.sqrt(np.maximum(var, 0.0))
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "mean_value": pa.array(mean, pa.float64()),
                "stddev_pop": pa.array(std, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def qty_discount_corr(sf_dir: str):
    """Per-group Pearson CORRELATION + population COVARIANCE between two
    measures (corr(l_quantity, l_discount) by l_returnflag).  Same exactness
    strategy as :func:`event_value_stats`: both measures are converted to
    integer CENTS per row, the five sufficient sums (sx, sy, sxx, syy, sxy)
    plus the count are aggregated as exact int64 partials (associative in any
    Ray merge order), and only the final covariance/correlation expression is
    floating point — an IEEE expression written IDENTICALLY on the engine and
    DuckDB sides, so the doubles are bit-equal.

    Cents keep the partials exact for any 2-decimal input; int64 headroom for
    sum(x*x) with quantity <= 50 (x <= 5000) holds to ~3.7e11 rows per group,
    beyond the 1e12-turn design point only if one group held every row —
    at that scale swap the partials to float64 (documented, not needed here).
    """
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        x = np.round(t["l_quantity"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        y = np.round(t["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xx": pa.array(x * x, pa.int64()),
                "yy": pa.array(y * y, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
            }
        )

    agg = lowcard_groupagg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag"],
        [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"),
         ("xy", "sum"), ([], "count_all")],
        {"x_sum": "sx", "y_sum": "sy", "xx_sum": "sxx", "yy_sum": "syy",
         "xy_sum": "sxy", "count_all": "n_rows"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_rows"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        # the exact parenthesization below is mirrored in the oracle SQL
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) * (sx / n)
        vy = syy / n - (sy / n) * (sy / n)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_rows": t["n_rows"],
                "covar_pop": pa.array(cov / 10000.0, pa.float64()),
                "corr_qty_discount": pa.array(cov / np.sqrt(vx * vy), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_cube(sf_dir: str):
    """GROUP BY CUBE (all four grouping sets of two keys) over lineitem.

    The distributed work is ONE fine-grained partial aggregation (integer
    cents, exact in any merge order); the three coarser grouping sets are
    derived by re-aggregating the tiny (|flag| x |status|) base table — no
    second pass over the data, no extra shuffle.  Aggregated-away keys carry
    the literal ``'ALL'`` (mirrored by COALESCE in the oracle) instead of
    NULL so the gate's string normalization is unambiguous."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        p = np.round(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {"l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
             "q": pa.array(q, pa.int64()), "p": pa.array(p, pa.int64())}
        )

    base = lowcard_groupagg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("q", "sum"), ("p", "sum"), ([], "count_all")],
        {"q_sum": "q", "p_sum": "p", "count_all": "n"},
    )

    def finish(t: pa.Table) -> pa.Table:
        lvls = []
        for keep in ((True, True), (True, False), (False, True), (False, False)):
            g = [k for k, on in zip(("l_returnflag", "l_linestatus"), keep) if on]
            if g:
                a = t.group_by(g).aggregate([("q", "sum"), ("p", "sum"), ("n", "sum")])
                lvl = pa.table(
                    {**{k: a[k] for k in g},
                     "q": a["q_sum"], "p": a["p_sum"], "n": a["n_sum"]}
                )
            else:
                lvl = pa.table({"q": [int(pc.sum(t["q"]).as_py() or 0)],
                                "p": [int(pc.sum(t["p"]).as_py() or 0)],
                                "n": [int(pc.sum(t["n"]).as_py() or 0)]})
            n = lvl.num_rows
            for col, on in zip(("l_returnflag", "l_linestatus"), keep):
                if not on:
                    lvl = lvl.append_column(col, pa.array(["ALL"] * n, pa.string()))
            lvls.append(lvl.select(["l_returnflag", "l_linestatus", "q", "p", "n"]))
        allv = pa.concat_tables(lvls)
        return pa.table(
            {
                "l_returnflag": allv["l_returnflag"],
                "l_linestatus": allv["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(allv["q"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(pc.cast(allv["p"], pa.float64()), 100.0),
                "n_rows": pc.cast(allv["n"], pa.int64()),
            }
        )

    return base.map_batches(finish, batch_size=None, batch_format="pyarrow")


def window_rank_block(df):
    """Block-local vectorized window-rank math over (s_nationkey, s_acctbal,
    s_suppkey): returns the frame sorted by (nation, -cents, suppkey) with
    bal_c / bal_rank / bal_dense_rank / bal_pct_rank / bal_ntile4 columns —
    boundary masks + cumsum / maximum.accumulate, no per-group Python.
    Shared by the pipeline block and the property tests
    (tests/test_window_ranks.py) so refactors stay pinned."""
    bal = np.round(df["s_acctbal"].to_numpy() * 100).astype(np.int64)
    d = df.assign(bal_c=bal).sort_values(
        ["s_nationkey", "bal_c", "s_suppkey"],
        ascending=[True, False, True], kind="mergesort",
    )
    nat = d["s_nationkey"].to_numpy()
    balc = d["bal_c"].to_numpy()
    n = len(d)
    idx = np.arange(n)
    new_grp = np.concatenate(([True], nat[1:] != nat[:-1]))
    new_val = new_grp | np.concatenate(([True], balc[1:] != balc[:-1]))
    grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
    val_start = np.maximum.accumulate(np.where(new_val, idx, 0))
    rank = val_start - grp_start + 1
    dense = np.cumsum(new_val)
    dense_base = np.maximum.accumulate(np.where(new_grp, dense - 1, 0))
    pos = idx - grp_start  # 0-based position within the group
    starts_idx = idx[new_grp]
    sizes = np.diff(np.append(starts_idx, n))
    gsize = np.repeat(sizes, sizes)
    pct = np.where(gsize > 1, (rank - 1) / np.maximum(gsize - 1, 1), 0.0)
    k = 4  # SQL NTILE: first (n % k) buckets take ceil(n/k) rows
    big = gsize % k
    big_sz = gsize // k + 1
    small_sz = np.maximum(gsize // k, 1)
    in_big = pos < big * big_sz
    ntile = np.where(
        in_big,
        pos // big_sz + 1,
        big + (pos - big * big_sz) // small_sz + 1,
    )
    return d.assign(bal_rank=rank, bal_dense_rank=dense - dense_base,
                    bal_pct_rank=pct, bal_ntile4=ntile)


def supplier_balance_rank(sf_dir: str):
    """RANK() / DENSE_RANK() / PERCENT_RANK() / NTILE(4) windows per group
    (suppliers ranked by account balance within their nation) — the ntile
    ties are broken by the unique suppkey in the window order, so bucket
    edges are deterministic, and percent_rank's one division is the same
    IEEE expression on both engines.  One keyed hash-partition on s_nationkey,
    then a block-local vectorized rank: sort by (nation, -balance, suppkey),
    mark value-change boundaries, and derive both rank flavors with cumsum /
    maximum.accumulate — no per-group Python loop.  Balances compare as exact
    integer cents so tie groups are identical on both engines."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64()),
         ("bal_c", pa.int64()), ("bal_rank", pa.int64()),
         ("bal_dense_rank", pa.int64()), ("bal_pct_rank", pa.float64()),
         ("bal_ntile4", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        d = window_rank_block(df)
        return pa.table(
            {
                "s_suppkey": pa.array(d["s_suppkey"].to_numpy(), pa.int64()),
                "s_nationkey": pa.array(d["s_nationkey"].to_numpy(), pa.int64()),
                "bal_c": pa.array(d["bal_c"].to_numpy(), pa.int64()),
                "bal_rank": pa.array(d["bal_rank"].to_numpy(), pa.int64()),
                "bal_dense_rank": pa.array(d["bal_dense_rank"].to_numpy(), pa.int64()),
                "bal_pct_rank": pa.array(d["bal_pct_rank"].to_numpy(), pa.float64()),
                "bal_ntile4": pa.array(d["bal_ntile4"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    return key_partitioned(ds, ["s_nationkey"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def customer_first_order(sf_dir: str):
    """ARG-MIN / FIRST_VALUE per group: each customer's earliest order (date,
    then orderkey as the deterministic tiebreak) with its attributes — the
    row-returning argmin that plain min() aggregates cannot express.  One
    keyed hash-partition on o_custkey, block-local mergesort, and a
    group-boundary mask picks the first row per key; no per-group Python."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    out_schema = pa.schema(
        [("o_custkey", pa.int64()), ("first_orderkey", pa.int64()),
         ("first_orderdate", pa.timestamp("us")), ("first_price_c", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        cust = df["o_custkey"].to_numpy()
        first = np.concatenate(([True], cust[1:] != cust[:-1]))
        sel = df.iloc[first]
        price_c = np.round(sel["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(sel["o_custkey"].to_numpy(), pa.int64()),
                "first_orderkey": pa.array(sel["o_orderkey"].to_numpy(), pa.int64()),
                "first_orderdate": pa.array(
                    sel["o_orderdate"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "first_price_c": pa.array(price_c, pa.int64()),
            },
            schema=out_schema,
        )

    return key_partitioned(ds, ["o_custkey"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def nation_participation(sf_dir: str):
    """FULL OUTER JOIN shape: per-nation customer and supplier counts,
    including nations present on only one side (zero-filled).  Both inputs
    reduce to tiny per-nation counts via the combiner pattern BEFORE any
    join — the outer join itself runs over <=25-row partials on the driver
    side of the aggregation, never over the raw tables."""
    cust = lowcard_groupagg(
        _read(sf_dir, "customer", ["c_nationkey"]),
        ["c_nationkey"], [([], "count_all")], {"count_all": "n_customers"},
    )
    supp = lowcard_groupagg(
        _read(sf_dir, "supplier", ["s_nationkey"]),
        ["s_nationkey"], [([], "count_all")], {"count_all": "n_suppliers"},
    )
    def _collect(ds_small, key, cnt):
        t = pa.concat_tables(
            b for b in ds_small.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        )
        # select by NAME — pyarrow group_by output column order is
        # version-dependent, a positional rename could swap key and count
        return pa.table({"nationkey": t[key], cnt: t[cnt]})

    ct = _collect(cust, "c_nationkey", "n_customers")
    st = _collect(supp, "s_nationkey", "n_suppliers")
    j = ct.join(st, keys=["nationkey"], join_type="full outer")
    nk = j["nationkey"]
    ncust = pc.fill_null(j["n_customers"], 0)
    nsupp = pc.fill_null(j["n_suppliers"], 0)
    import ray.data as rd

    out = pa.table(
        {
            "nationkey": pc.cast(nk, pa.int64()),
            "n_customers": pc.cast(ncust, pa.int64()),
            "n_suppliers": pc.cast(nsupp, pa.int64()),
        }
    ).sort_by([("nationkey", "ascending")])
    return rd.from_arrow(out)


def user_retention(sf_dir: str):
    """COHORT RETENTION — the classic product-analytics matrix: users
    cohorted by their first-activity week, counted once per (cohort,
    week-offset) they were active in.  Weeks are absolute epoch-week indexes
    (floor(epoch_seconds / 604800)) so both engines bucket identically with
    no calendar/locale dependence.

    One keyed hash-partition on user_id makes each user's history
    block-local; the per-block distinct (cohort, offset, user) triples then
    sum across blocks (users never span blocks), finishing with a tiny
    combiner aggregate."""
    import pandas as pd

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    part_schema = pa.schema(
        [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
         ("n", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=part_schema)
        wk = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // (604800 * 10**6)
        )
        d = df.assign(wk=wk)
        cohort = d.groupby("user_id")["wk"].transform("min")
        d = d.assign(cohort=cohort, off=d["wk"] - cohort)
        pairs = d[["user_id", "cohort", "off"]].drop_duplicates()
        g = pairs.groupby(["cohort", "off"]).size().reset_index(name="n")
        return pa.table(
            {
                "cohort_week": pa.array(g["cohort"].to_numpy(), pa.int64()),
                "week_offset": pa.array(g["off"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            },
            schema=part_schema,
        )

    partials = key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )
    return lowcard_groupagg(
        partials, ["cohort_week", "week_offset"],
        [("n", "sum")], {"n_sum": "n_users"},
    )


_Q19_GROUPS = [  # (brand, size_hi, qty_lo, qty_hi) disjunctive predicate groups
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
]


def disjunctive_revenue(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q19 shape: revenue under OR'd multi-table predicate groups —
    the query exercising a REAL distributed hash join (lineitem x part on
    partkey; at scale both sides are large, so no broadcast) plus a
    disjunctive post-join predicate evaluated vectorized.

    The part side is pre-filtered to the three brands BEFORE the join
    (predicate pushdown shrinks the shuffle), and lineitem to the overall
    quantity envelope.  Revenue accumulates in exact integer 1e-4 units
    (price cents x (100 - discount cents)) so both engines sum identically
    in any order."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray.data as rd

    from ..state.partitioning import materialize_clean

    brands = [g[0] for g in _Q19_GROUPS]
    qty_lo = min(g[2] for g in _Q19_GROUPS)
    qty_hi = max(g[3] for g in _Q19_GROUPS)

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.filter(pc.is_in(t["p_brand"], value_set=pa.array(brands))),
        batch_format="pyarrow",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_quantity"], qty_lo),
                    pc.less_equal(t["l_quantity"], qty_hi))
        ),
        batch_format="pyarrow",
    )
    j = materialize_clean(li).join(
        materialize_clean(part),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"rev": pa.array([], pa.int64())})
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False)
        mask = np.zeros(t.num_rows, bool)
        for b, s_hi, lo, hi in _Q19_GROUPS:
            mask |= (
                pc.equal(t["p_brand"], b).to_numpy(zero_copy_only=False)
                & (size >= 1) & (size <= s_hi)
                & (q >= lo) & (q <= hi)
            )
        if not mask.any():
            return pa.table({"rev": pa.array([], pa.int64())})
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[mask] * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False)[mask] * 100
        ).astype(np.int64)
        return pa.table(
            {"rev": pa.array([int((price_c * (100 - disc_c)).sum())], pa.int64())}
        )

    partials = j.map_batches(partial, batch_format="pyarrow")
    total = sum(
        int(pc.sum(b["rev"]).as_py() or 0)
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    )
    return rd.from_arrow(
        pa.table({"revenue": pa.array([total / 10000.0], pa.float64())})
    )


def heavy_hitter_users(sf_dir: str, eps: float = 0.005):
    """EXACT heavy hitters without a full-cardinality shuffle: users with
    more than ``eps`` of all events.

    1. SCREEN: per-block Misra-Gries summaries with k = ceil(1/eps)
       counters (``state/sketch.mg_reduce``), merged off-driver through a
       remote tree — the merged summary's undercount is bounded by
       N/(k+1) <= eps*N, so every truly-frequent user is GUARANTEED in the
       <=k-entry candidate set (Agarwal et al., mergeable summaries).
    2. CONFIRM: candidates broadcast once; ONE streamed counting pass sums
       exact per-candidate counts (combiner partials), then the threshold
       filter.  The confirmed output is exact and deterministic — merge
       order only changes the candidate SUPERSET — so the plain SQL
       GROUP BY/HAVING oracles it.

    The full-groupby alternative shuffles every (user, count) pair;
    this shuffles nothing and broadcasts <=k candidates."""
    import ray

    from ..state.sketch import mg_merge, mg_reduce

    k = int(np.ceil(1.0 / eps))
    ds = _read(sf_dir, "events", ["user_id"])
    n_total = ds.count()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        vals, cnts = np.unique(
            t["user_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        v, c = mg_reduce(vals, cnts.astype(np.int64), k)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    refs = (
        ds.map_batches(block_summary, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def merge(*tables):
        parts = [
            (t["v"].to_numpy(zero_copy_only=False),
             t["c"].to_numpy(zero_copy_only=False))
            for t in tables if t.num_rows and t.num_columns
        ]
        v, c = mg_merge(parts, k) if parts else (np.empty(0, np.int64),
                                                 np.empty(0, np.int64))
        return pa.table({"v": pa.array(v, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    while len(refs) > 1:
        refs = [merge.remote(*refs[i: i + 64]) for i in range(0, len(refs), 64)]
    cand = ray.get(refs[0])["v"].combine_chunks() if refs else pa.array([], pa.int64())
    cand_ref = ray.put(cand)

    def count_cand(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        if t.num_rows == 0 or len(cs) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        sel = t.filter(pc.is_in(t["user_id"], value_set=cs))
        vals, cnts = np.unique(
            sel["user_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"user_id": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    agg = lowcard_groupagg(
        ds.map_batches(count_cand, batch_format="pyarrow"),
        ["user_id"], [("n", "sum")], {"n_sum": "n_events"},
    )

    def finish(t: pa.Table) -> pa.Table:
        # same float threshold expression as the SQL HAVING
        mask = pc.greater(
            pc.cast(t["n_events"], pa.float64()), float(n_total) * eps
        )
        return t.filter(mask)

    return agg.map_batches(finish, batch_format="pyarrow")


def value_histogram(sf_dir: str, n_bins: int = 20):
    """Equal-width HISTOGRAM of event values — binning as pure integer
    arithmetic so both engines land every row in the same bin: values as
    cents, width = ceil((max-min+1)/n_bins) via integer ceil, bin =
    (v-min)//width.  Two passes like SQL: a tiny global (min,max) reduce,
    then combiner bin counts."""
    import ray.data as rd

    ds = _read(sf_dir, "events", ["value"])

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"mn": pa.array([int(c.min())], pa.int64()),
                         "mx": pa.array([int(c.max())], pa.int64())})

    mm = pa.concat_tables(
        b for b in ds.map_batches(mm_partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    )
    if mm.num_rows == 0:
        return rd.from_arrow(pa.table(
            {"bin": pa.array([], pa.int64()), "lo_c": pa.array([], pa.int64()),
             "hi_c": pa.array([], pa.int64()), "n_events": pa.array([], pa.int64())}
        ))
    mn = int(pc.min(mm["mn"]).as_py())
    mx = int(pc.max(mm["mx"]).as_py())
    width = (mx - mn + n_bins) // n_bins  # integer ceil of (mx-mn+1)/n_bins

    def bins(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"bin": pa.array((c - mn) // max(width, 1), pa.int64())})

    agg = lowcard_groupagg(
        ds.map_batches(bins, batch_format="pyarrow"),
        ["bin"], [([], "count_all")], {"count_all": "n_events"},
    )

    def finish(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        w = max(width, 1)
        return pa.table(
            {
                "bin": t["bin"],
                "lo_c": pa.array(mn + b * w, pa.int64()),
                "hi_c": pa.array(np.minimum(mn + (b + 1) * w - 1, mx), pa.int64()),
                "n_events": t["n_events"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def event_value_mad(sf_dir: str):
    """Per-group MEDIAN + MAD (median absolute deviation) — the robust-stats
    companion to the mean/stddev family.  All order statistics are DISCRETE
    (element-picking, numpy inverted_cdf == DuckDB quantile_disc — the
    parity already proven for event_value_quantiles) over integer cents, so
    the output is exact integers.  One keyed partition; the two quantile
    passes are block-local per group."""
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("event_type", pa.string()), ("median_c", pa.int64()),
             ("mad_c", pa.int64()), ("n_events", pa.int64())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        enc = t["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rows = {"event_type": [], "median_c": [], "mad_c": [], "n_events": []}
        for code in np.unique(codes):
            seg = c[codes == code]
            med = int(np.quantile(seg, 0.5, method="inverted_cdf"))
            mad = int(np.quantile(np.abs(seg - med), 0.5, method="inverted_cdf"))
            rows["event_type"].append(enc.dictionary[code].as_py())
            rows["median_c"].append(med)
            rows["mad_c"].append(mad)
            rows["n_events"].append(int(len(seg)))
        return pa.Table.from_pydict(rows, schema=schema)

    return key_partitioned(ds, ["event_type"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def event_value_outliers(sf_dir: str, z_thresh: float = 3.0):
    """Per-group z-score OUTLIER detection: rows whose value deviates more
    than ``z_thresh`` population standard deviations from their event_type's
    mean.  Two passes, as in SQL: (1) the exact integer-cent sufficient sums
    per type (combiner pattern, same partials as :func:`event_value_stats`);
    (2) the tiny per-type (mean, sd) table broadcast once (``ray.put``) and
    applied per block via dictionary-encode + np.take — no per-row Python.
    Mean/sd/z are the IDENTICAL IEEE expressions on both engines, so the
    boundary comparison |z| > z_thresh selects the same rows bit-for-bit."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"],
             "c": pa.array(c, pa.int64()),
             "c2": pa.array(c * c, pa.int64())}
        )

    agg = lowcard_groupagg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["event_type"],
        [("c", "sum"), ("c2", "sum"), ([], "count_all")],
        {"c_sum": "s", "c2_sum": "s2", "count_all": "n"},
    ).to_pandas()
    n = agg["n"].to_numpy().astype(np.float64)
    s = agg["s"].to_numpy().astype(np.float64)
    s2 = agg["s2"].to_numpy().astype(np.float64)
    mean = s / n / 100.0
    sd = np.sqrt(np.maximum((s2 / n - (s / n) * (s / n)) / 10000.0, 0.0))
    stats_ref = ray.put({t: (m, d) for t, m, d in zip(agg["event_type"], mean, sd)})

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value_c", pa.int64()), ("zscore", pa.float64())]
    )

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        stats = ray.get(stats_ref)
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        dict_vals = enc.dictionary.to_pylist()
        m_by_code = np.array([stats.get(v, (0.0, 0.0))[0] for v in dict_vals])
        d_by_code = np.array([stats.get(v, (0.0, 0.0))[1] for v in dict_vals])
        codes = enc.indices.to_numpy(zero_copy_only=False)
        m = m_by_code[codes]
        d = d_by_code[codes]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (c / 100.0 - m) / d
        mask = (d > 0) & (np.abs(z) > z_thresh)
        return pa.table(
            {
                "event_id": pa.array(
                    t["event_id"].to_numpy(zero_copy_only=False)[mask], pa.int64()),
                "event_type": pc.array_filter(
                    t["event_type"].combine_chunks(), pa.array(mask)),
                "value_c": pa.array(c[mask], pa.int64()),
                "zscore": pa.array(z[mask], pa.float64()),
            },
            schema=out_schema,
        )

    return ds.map_batches(flag, batch_format="pyarrow")


_HLL_COLS = [  # (table, column) specs for the approx-distinct survey
    ("events", "user_id"),
    ("events", "event_type"),
    ("lineitem", "l_partkey"),
    ("documents", "text"),
]


def distinct_stats_hll(sf_dir: str):
    """Approximate COUNT(DISTINCT) per column via HyperLogLog
    (``state/sketch.hll_registers`` — the mergeable scale path for the exact
    off-driver distinct in ``state/partitioning.distinct_values_ref``, which
    must hold the whole value universe; HLL holds 4 KiB per column
    regardless of cardinality).

    Per block each column contributes ONE register-array row; rows merge by
    elementwise max — associative/commutative/idempotent, so any Ray merge
    tree yields bit-identical registers and a deterministic estimate
    (pinned by tests/test_hll.py along with error bounds: ~1.6% standard
    error at p=12, <= 5% asserted at 3 sigma).

    SQL-oracled exactly (round-3): the hash basis is ``md5_low64`` of the
    value's decimal/string form — DuckDB's ``md5_number_lower`` — and the
    register/rank math is pure integer bit manipulation, so the oracle
    replays registers with smear+bit_count and the exact dyadic harmonic
    sum (see ``hll_estimate``); the sketch ESTIMATE is approximate vs true
    COUNT(DISTINCT), but it is a deterministic function the oracle
    reproduces bit-for-bit, like the CMS/KMV replays."""
    import ray.data as rd

    from ..functions.hashing import md5_low64
    from ..state.sketch import HLL_P, hll_estimate, hll_merge, hll_registers

    def make_partial(colname: str):
        def partial(t: pa.Table) -> pa.Table:
            col = t[colname].combine_chunks()
            uniq = pc.unique(col)
            if pa.types.is_integer(col.type):
                vals = [str(v) for v in uniq.to_pylist()]
            else:
                vals = uniq.to_pylist()
            h = np.fromiter(
                (md5_low64(s) for s in vals), np.uint64, len(vals)
            )
            regs = hll_registers(h, HLL_P)
            return pa.table(
                {
                    "column": pa.array([colname], pa.string()),
                    "regs": pa.array([regs.tobytes()], pa.binary()),
                }
            )

        return partial

    rows = []
    for table, colname in _HLL_COLS:
        part_ds = _read(sf_dir, table, [colname]).map_batches(
            make_partial(colname), batch_format="pyarrow"
        )
        partials = [
            np.frombuffer(r, np.uint8)
            for b in part_ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
            for r in b["regs"].to_pylist()
        ]
        merged = hll_merge(partials)
        # floor(est + 0.5): identical half-rounding on both sides (Python
        # round() is banker's, DuckDB round() is half-away — use neither).
        rows.append(
            (f"{table}.{colname}", int(math.floor(hll_estimate(merged) + 0.5)))
        )

    return rd.from_arrow(
        pa.table(
            {
                "column": pa.array([r[0] for r in rows], pa.string()),
                "approx_distinct": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def small_order_revenue(sf_dir: str, brand: str = "Brand#23",
                        max_size: int = 15, num_partitions: int | None = None):
    """TPC-H Q17 shape — the correlated-subquery / aggregate-join-back
    pattern: revenue of lineitems whose quantity is below 20% of their
    part's average quantity, for one brand's small parts.

    Plan: (1) the brand's part keys are collected OFF-DRIVER
    (``distinct_values_ref``) and applied as a broadcast ``pc.is_in``
    semi-filter to the pruned lineitem read; (2) a per-part (sum_qty, count)
    aggregate over the filtered rows is broadcast back as a dense LUT
    (bounded by the brand's part count — at extreme scale this becomes a
    keyed join on l_partkey instead); (3) one more streamed pass filters
    with EXACT integer arithmetic (quantities are integral, so
    ``5*q*cnt < sum_qty`` is ``q < 0.2*avg`` with no float-boundary risk —
    the SQL oracle compares the identical integers) and combines per-block
    (count, revenue-cents) partials into one row."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    from ..state.partitioning import distinct_values_ref, materialize_clean, semi_filter

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    wanted = part.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_brand"], brand),
                    pc.less(t["p_size"], pa.scalar(max_size)))
        ),
        batch_format="pyarrow",
    )
    keys_ref, n_keys = distinct_values_ref(wanted, ["p_partkey"])

    items = materialize_clean(
        semi_filter(
            _read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice"]),
            "l_partkey",
            keys_ref,
        ).map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                    "price_c": pa.array(
                        np.round(
                            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    from ..functions.groupagg import highcard_groupagg

    stats = highcard_groupagg(
        items.select_columns(["l_partkey", "q"]),
        ["l_partkey"],
        [("q", "sum"), ([], "count_all")],
        {"q_sum": "sq", "count_all": "cnt"},
        num_partitions=num_partitions,
    )
    st = pa.concat_tables(
        b for b in stats.iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_columns
    )
    empty_out = pa.table(
        {"n_small": pa.array([0], pa.int64()),
         "revenue_c": pa.array([0], pa.int64())}
    )
    import ray.data as rd

    if st.num_rows == 0:
        return rd.from_arrow(empty_out)
    pk = st["l_partkey"].to_numpy(zero_copy_only=False)
    lut_sq = np.zeros(int(pk.max()) + 1, np.int64)
    lut_cnt = np.zeros(int(pk.max()) + 1, np.int64)
    lut_sq[pk] = st["sq"].to_numpy(zero_copy_only=False)
    lut_cnt[pk] = st["cnt"].to_numpy(zero_copy_only=False)
    luts_ref = ray.put((lut_sq, lut_cnt))

    def partial(t: pa.Table) -> pa.Table:
        sq, cnt = ray.get(luts_ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        q = t["q"].to_numpy(zero_copy_only=False)
        small = 5 * q * cnt[k] < sq[k]
        price = t["price_c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"n_small": pa.array([int(small.sum())], pa.int64()),
             "revenue_c": pa.array([int(price[small].sum())], pa.int64())}
        )

    parts = pa.concat_tables(
        b for b in items.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        if b.num_rows and b.num_columns
    )
    if parts.num_rows == 0:
        return rd.from_arrow(empty_out)
    return rd.from_arrow(
        pa.table(
            {"n_small": pa.array([int(pc.sum(parts["n_small"]).as_py())], pa.int64()),
             "revenue_c": pa.array([int(pc.sum(parts["revenue_c"]).as_py())], pa.int64())}
        )
    )


def event_value_quantiles_sketch(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99),
                                 m: int = 1024, chunk_rows: int = 8192):
    """Approximate per-group quantiles via a two-level compaction sketch —
    the scale path for groups too large to co-locate that
    ``event_value_quantiles`` (exact) documents.

    Round-3 verdict item #9 (graduated from rows-only): the previous
    version built level-1 sketches per RAY BLOCK, so the result depended on
    block boundaries (hence num_cpus) and could never hash-match a SQL
    oracle.  Level-1 partials are now keyed by a DETERMINISTIC chunk
    (``event_id // chunk_rows``): one (event_type, chunk)-keyed shuffle
    co-locates each chunk slice, which compacts to <= ``m`` (value, weight)
    entries (center-of-mass positions ``trunc((i+0.5)*n/m)``, uniform
    weight ``n/m``) when it exceeds ``m`` and passes through exact
    (weight 1) otherwise.  Level 2 merges a group's chunk entries in
    EXPLICIT (value, chunk, pos) order with sequential cumulative sums
    (``np.cumsum`` == SQL running ``SUM() OVER (ORDER BY ...)``, float ops
    in the identical order), re-compacts once when the merged entry count
    exceeds ``m``, and reads quantiles by weighted inverted CDF
    (``searchsorted(cum, q*total, 'left')``).  Every float operation has a
    fixed order, so the output is an exact deterministic function of the
    data — replayed op-for-op by the DuckDB oracle.  Error remains
    ~1/m per level (pytest-pinned).  At 100 TB ``chunk_rows`` scales up
    (e.g. 1M) so level 2 sees ~(n/chunk_rows)*m bounded entries."""
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def with_chunk(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"event_type": batch["event_type"],
             "chunk": pa.array(ids // chunk_rows, pa.int64()),
             "value": batch["value"]}
        )

    def chunk_sketch(t: pa.Table) -> pa.Table:
        """Per co-located (event_type, chunk): sorted values -> <= m
        entries (v, w) + the slice count n_c (carried on every entry)."""
        empty = pa.table(
            {"event_type": pa.array([], pa.string()),
             "chunk": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64()),
             "v": pa.array([], pa.float64()),
             "w": pa.array([], pa.float64()),
             "n_c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        df = t.to_pandas()
        out = {k: [] for k in
               ("event_type", "chunk", "pos", "v", "w", "n_c")}
        for (et, ch), g in df.groupby(["event_type", "chunk"], sort=True):
            v = np.sort(g["value"].to_numpy(dtype=np.float64))
            n = len(v)
            if n <= m:
                ent_v, ent_w = v, np.ones(n, np.float64)
            else:
                pos = (((np.arange(m, dtype=np.float64) + 0.5) * n) / m
                       ).astype(np.int64)
                ent_v = v[np.clip(pos, 0, n - 1)]
                ent_w = np.full(m, n / m, np.float64)
            k = len(ent_v)
            out["event_type"].append(np.full(k, et, object))
            out["chunk"].append(np.full(k, ch, np.int64))
            out["pos"].append(np.arange(k, dtype=np.int64))
            out["v"].append(ent_v)
            out["w"].append(ent_w)
            out["n_c"].append(np.full(k, n, np.int64))
        return pa.table(
            {"event_type": pa.array(np.concatenate(out["event_type"]),
                                    pa.string()),
             "chunk": pa.array(np.concatenate(out["chunk"]), pa.int64()),
             "pos": pa.array(np.concatenate(out["pos"]), pa.int64()),
             "v": pa.array(np.concatenate(out["v"]), pa.float64()),
             "w": pa.array(np.concatenate(out["w"]), pa.float64()),
             "n_c": pa.array(np.concatenate(out["n_c"]), pa.int64())}
        )

    def final(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_type": pa.array([], pa.string()),
             "n_events": pa.array([], pa.int64()),
             **{f"p{int(q*100):02d}": pa.array([], pa.float64()) for q in qs}}
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        df = t.to_pandas()
        cols = {"event_type": [], "n_events": [],
                **{f"p{int(q*100):02d}": [] for q in qs}}
        for et, g in df.groupby("event_type", sort=True):
            order = np.lexsort(
                (g["pos"].to_numpy(), g["chunk"].to_numpy(),
                 g["v"].to_numpy())
            )
            v = g["v"].to_numpy()[order]
            w = g["w"].to_numpy()[order]
            cum_w = np.cumsum(w)           # sequential == SQL running SUM
            total = cum_w[-1]
            if len(v) > m:
                cum = cum_w - 0.5 * w
                targets = ((np.arange(m, dtype=np.float64) + 0.5)
                           * total) / m
                idx = np.clip(np.searchsorted(cum, targets, side="left"),
                              0, len(v) - 1)
                v2 = v[idx]
                w2 = np.full(m, total / m, np.float64)
            else:
                v2, w2 = v, w
            cum2 = np.cumsum(w2)
            n_events = int(
                g.drop_duplicates(subset=["chunk"])["n_c"].sum()
            )
            cols["event_type"].append(et)
            cols["n_events"].append(n_events)
            for q in qs:
                tgt = q * cum2[-1]
                i = int(np.searchsorted(cum2, tgt, side="left"))
                cols[f"p{int(q*100):02d}"].append(
                    float(v2[min(i, len(v2) - 1)])
                )
        return pa.table(
            {"event_type": pa.array(cols["event_type"], pa.string()),
             "n_events": pa.array(cols["n_events"], pa.int64()),
             **{f"p{int(q*100):02d}": pa.array(cols[f"p{int(q*100):02d}"],
                                               pa.float64())
                for q in qs}}
        )

    lvl1 = key_partitioned(
        ds.map_batches(with_chunk, batch_format="pyarrow"),
        ["event_type", "chunk"],
    ).map_batches(chunk_sketch, batch_format="pyarrow", batch_size=None)
    return key_partitioned(lvl1, ["event_type"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def user_funnel(sf_dir: str):
    """Funnel / ordered-sequence-pattern analysis (the event-stream cousin of
    sessionization): how far each user progressed through
    view -> click -> purchase as an ordered subsequence of their event
    stream in the deterministic (ts, event_id) order.

    Composes over :func:`user_event_sequence` (one keyed shuffle) and matches
    the comma-joined sequence with vectorized RE2 kernels — no event type is
    a substring of another, so plain ``view.*click.*purchase`` subsequence
    regexes are exact.  ``funnel_stage`` = deepest prefix reached (0-3).
    The SQL oracle applies the IDENTICAL RE2 patterns to the identical
    ``string_agg`` sequence."""

    def fn(batch: pa.Table) -> pa.Table:
        seq = batch["event_seq"]
        stage = np.zeros(batch.num_rows, dtype=np.int64)
        for pat in ("view", "view.*click", "view.*click.*purchase"):
            stage += pc.match_substring_regex(seq, pat).to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "n_events": batch["n_events"],
                "funnel_stage": pa.array(stage, pa.int64()),
            }
        )

    return user_event_sequence(sf_dir).map_batches(fn, batch_format="pyarrow")


def idle_customer_balance(sf_dir: str, since: str = "2000-01-01"):
    """TPC-H Q22 shape — GLOBAL scalar subquery + anti-join: customers whose
    balance exceeds the corpus-wide average positive balance AND who have
    placed no order since ``since``, rolled up per nation.

    The global average is never compared in floats: each block emits exact
    integer partials (sum of positive cents, count), and the filter compares
    ``cents * n > sum_cents`` in int64 — the identical exact arithmetic the
    SQL oracle uses.  The order-customer key set is built off-driver
    (``distinct_values_ref``) and applied as one inverted ``pc.is_in``; the
    customer table is never shuffled."""
    import ray

    from ..state.partitioning import distinct_values_ref

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {"s": pa.array([int(cents[pos].sum())], pa.int64()),
             "n": pa.array([int(pos.sum())], pa.int64())}
        )

    # bounded driver materialization: ONE row per block
    stats = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    s_pos, n_pos = int(stats["s"].sum()), int(stats["n"].sum())

    lo = np.datetime64(since, "us")

    def recent(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(od >= lo))

    ids_ref, _n = distinct_values_ref(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            recent, batch_format="pyarrow"
        ),
        ["o_custkey"],
    )

    nmap_ref = _nation_lut_ref(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        mask = cents * n_pos > s_pos  # exact: c_acctbal > avg(positive)
        mask &= pc.invert(
            pc.is_in(batch["c_custkey"], value_set=ray.get(ids_ref))
        ).to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(mask))
        names = ray.get(nmap_ref)[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {"n_name": pa.array(names.tolist(), pa.string()),
             "c_acctbal": t["c_acctbal"]}
        )

    agg = lowcard_groupagg(
        cust.map_batches(keep, batch_format="pyarrow"),
        ["n_name"],
        [("c_acctbal", "sum"), ([], "count_all")],
        {"c_acctbal_sum": "total_bal", "count_all": "n_customers"},
    )
    return _round_floats(agg, ["total_bal"], 4)


def user_event_gaps(sf_dir: str):
    """LAG-family window aggregate: per-user inter-event gap statistics over
    the deterministic (ts, event_id) order.  Gaps are exact integer
    microseconds (count / max / sum — no float mean, so the hash is
    association-order-proof); users with fewer than two events drop out,
    matching the SQL ``WHERE gap IS NOT NULL``.

    One keyed hash-partition on user_id, then a fully vectorized block
    kernel: one mergesort, one ``np.diff`` masked at user boundaries, one
    pandas C-level groupby-agg."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_gaps", pa.int64()),
         ("max_gap_us", pa.int64()), ("sum_gap_us", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.diff(ts)
        same = uid[1:] == uid[:-1]
        g = pd.DataFrame({"user_id": uid[1:][same], "gap": gap[same]})
        if g.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        out = g.groupby("user_id", sort=True)["gap"].agg(
            n_gaps="size", max_gap_us="max", sum_gap_us="sum"
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "n_gaps": pa.array(out["n_gaps"].to_numpy(), pa.int64()),
                "max_gap_us": pa.array(out["max_gap_us"].to_numpy(), pa.int64()),
                "sum_gap_us": pa.array(out["sum_gap_us"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def lapsed_customers(sf_dir: str, y1: int = 1996, y2: int = 1997):
    """EXCEPT counterpart of :func:`repeat_customers` (set-op family):
    customers with at least one order in ``y1`` but NONE in ``y2``, per
    nation.  Shares the one-scan key builder and the nation rollup; the
    only variation is ``np.setdiff1d`` in place of ``intersect1d``."""
    import ray

    r1, r2 = _two_year_custkey_refs(sf_dir, y1, y2)

    @ray.remote
    def diff(a, b):
        return pa.array(
            np.setdiff1d(
                a.to_numpy(zero_copy_only=False), b.to_numpy(zero_copy_only=False)
            )
        )

    return _customers_per_nation(sf_dir, diff.remote(r1, r2))


def user_event_types(sf_dir: str):
    """Grouped COLLECT-SET (distinct-list aggregate): each user's sorted
    distinct event types as one comma-joined string plus the distinct count.
    Complements the ordered collect-list (:func:`user_event_sequence`) with
    the set-semantics variant.  One keyed shuffle; block kernel is a C-level
    pandas drop_duplicates + groupby string join."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("event_types", pa.string()),
         ("n_types", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        d = df.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"], kind="mergesort"
        )
        g = d.groupby("user_id", sort=True)["event_type"]
        out = g.agg([("event_types", ",".join), ("n_types", "size")]).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "event_types": pa.array(out["event_types"].tolist(), pa.string()),
                "n_types": pa.array(out["n_types"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def promo_revenue(sf_dir: str, year: int = 1997, num_partitions: int | None = None):
    """TPC-H Q14 shape — GLOBAL conditional-aggregate RATIO: the share of
    ``year``'s shipped revenue coming from PROMO-type parts.  Same medium-dim
    hash join as :func:`brand_revenue`; the two revenue sums are exact
    integer 1e-4 units folded by per-block partials, and only the FINAL
    ratio is floating point — one IEEE division, identical in SQL."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    items = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def in_year(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((sd >= lo) & (sd < hi)))

    parts = _read(sf_dir, "part", ["p_partkey", "p_type"])
    # scrub schema-less empty blocks the year filter can produce — they
    # crash the Acero hash join (the documented Ray 2.49 trap)
    from ..state.partitioning import materialize_clean

    in_window = materialize_clean(items.map_batches(in_year, batch_format="pyarrow"))
    import ray.data as rd

    if in_window.count() == 0:
        # an all-empty left side crashes the Acero join outright
        return rd.from_items(
            [{"promo_rev_c4": 0, "total_rev_c4": 0, "promo_ratio": 0.0}]
        )
    joined = in_window.join(
        parts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc_c)
        promo = pc.equal(t["p_type"], pa.scalar("PROMO")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_c4": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_c4": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    # bounded: ONE row per block
    import ray.data as rd

    sums = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if sums.empty or "promo_c4" not in sums.columns:
        # empty join output loses its schema at to_pandas(): zero revenue
        promo_c4 = total_c4 = 0
    else:
        promo_c4, total_c4 = int(sums["promo_c4"].sum()), int(sums["total_c4"].sum())
    ratio = float(promo_c4) / float(total_c4) if total_c4 else 0.0
    return rd.from_items(
        [{"promo_rev_c4": promo_c4, "total_rev_c4": total_c4,
          "promo_ratio": ratio}]
    )


def top_supplier(sf_dir: str, year: int = 1997, num_partitions: int | None = None):
    """TPC-H Q15 shape — global MAX + tie-returning equality filter (a
    different pattern from LIMIT-k: ALL suppliers achieving the maximum
    revenue are returned): per-supplier revenue for ``year`` via one keyed
    combiner agg, the global max via bounded per-block partials, winners via
    one vectorized equality filter, and the supplier names attached by a
    filter-pushdown read of the dimension (winner keys are the tie count —
    broadcast-trivial)."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    from ..functions.groupagg import highcard_groupagg

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def rev_rows(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"l_suppkey": t["l_suppkey"],
             "rev": pa.array(price_c * (100 - disc_c), pa.int64())}
        )

    per_supp = highcard_groupagg(
        _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(rev_rows, batch_format="pyarrow"),
        ["l_suppkey"],
        [("rev", "sum")],
        {"rev_sum": "total_rev_c4"},
        num_partitions,
    ).materialize()

    # global max from one bounded partial per block
    def max_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table(
            {"m": pa.array(
                [int(t["total_rev_c4"].to_numpy(zero_copy_only=False).max())],
                pa.int64(),
            )}
        )

    maxima = per_supp.map_batches(max_partial, batch_format="pyarrow").to_pandas()
    import ray.data as rd

    if maxima.empty or "m" not in maxima.columns or maxima["m"].isna().all():
        # no lineitem in the window: empty result with a stable schema,
        # matching the oracle's zero rows (from_arrow, not from_pandas —
        # Ray mangles 0-row pandas frames)
        return rd.from_arrow(
            pa.table(
                {"s_suppkey": pa.array([], pa.int64()),
                 "s_name": pa.array([], pa.string()),
                 "total_rev_c4": pa.array([], pa.int64())}
            )
        )
    best = int(maxima["m"].max())

    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev_c4"], pa.scalar(best, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()  # tie count: bounded

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    keys = pa.array(winners["l_suppkey"].to_numpy(), pa.int64())
    names = (
        supp.map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"], value_set=keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("s_suppkey")["s_name"]
    )
    import ray.data as rd

    out = winners.rename(columns={"l_suppkey": "s_suppkey"}).sort_values("s_suppkey")
    out["s_name"] = names.loc[out["s_suppkey"]].to_numpy()
    return rd.from_pandas(out[["s_suppkey", "s_name", "total_rev_c4"]].reset_index(drop=True))


def event_transitions(sf_dir: str):
    """Event-sequence TRANSITION counts (the stream analogue of corpus
    bigrams): how often each (prev_type -> next_type) pair occurs between
    CONSECUTIVE events of the same user in (ts, event_id) order.  One keyed
    shuffle, a vectorized shift masked at user boundaries, then a tiny
    combiner rollup onto the <= n_types^2 key space."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    def block(df: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"prev_type": pa.array([], pa.string()),
             "next_type": pa.array([], pa.string())}
        )
        if df.empty:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pa.table(
            {
                "prev_type": pa.array(et[:-1][same].tolist(), pa.string()),
                "next_type": pa.array(et[1:][same].tolist(), pa.string()),
            }
        )

    pairs = key_partitioned(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        ["user_id"],
    ).map_batches(block, batch_format="pandas", batch_size=None)
    return lowcard_groupagg(
        pairs,
        ["prev_type", "next_type"],
        [([], "count_all")],
        {"count_all": "n_transitions"},
    )


def session_conversion(sf_dir: str, gap_minutes: int = 30):
    """Session-level FUNNEL OUTCOME (sessionization x conversion composition):
    per user, how many sessions they had and how many contained at least one
    ``purchase``.  One keyed shuffle on user_id; the block kernel is the
    sessionization gap-cumsum plus a two-level C-level pandas rollup."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    gap = np.timedelta64(gap_minutes * 60, "s")
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_sessions", pa.int64()),
         ("n_converted", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        new = np.ones(len(df), dtype=np.int64)
        same = uid[1:] == uid[:-1]
        new[1:] = (~same) | ((ts[1:] - ts[:-1]) > gap)
        df["sid"] = np.cumsum(new)  # globally unique within block
        df["conv"] = (df["event_type"].to_numpy() == "purchase").astype(np.int64)
        per_sess = df.groupby(["user_id", "sid"], sort=False)["conv"].max()
        out = per_sess.groupby(level=0).agg(
            n_sessions="size", n_converted="sum"
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "n_sessions": pa.array(out["n_sessions"].to_numpy(), pa.int64()),
                "n_converted": pa.array(out["n_converted"].to_numpy(), pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def global_value_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99)):
    """EXACT corpus-wide order statistics WITHOUT sorting the data — the
    count-then-select scale path the per-group quantile docstring promises:
    one streaming pass builds per-block (cent-value, count) partials, one
    keyed combine collapses them to the DOMAIN-bounded histogram (at most
    one row per distinct cent value, independent of corpus size), and the
    quantiles are selected from the cumulative counts on the driver.

    Works whenever the value domain is bounded/discretizable (here:
    2-decimal monetary values, so cents round-trip exactly to the original
    doubles); unbounded domains route to the mergeable sketch
    (``event_value_quantiles_sketch``).  Element selection matches DuckDB
    ``quantile_disc`` (lower element at position ceil(q*n))."""
    import math

    import ray.data as rd

    from ..functions.groupagg import highcard_groupagg

    def hist_block(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {"c": pa.array(u, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    hist = highcard_groupagg(
        _read(sf_dir, "events", ["value"]).map_batches(
            hist_block, batch_format="pyarrow"
        ),
        ["c"],
        [("n", "sum")],
        {"n_sum": "n"},
    )
    df = hist.to_pandas().sort_values("c").reset_index(drop=True)  # domain-bounded
    cum = df["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cents = df["c"].to_numpy()
    out = {"n_events": total}
    for q in qs:
        pos = max(1, math.ceil(q * total))
        out[f"p{int(q * 100)}"] = float(cents[np.searchsorted(cum, pos)] / 100.0)
    return rd.from_items([out])


def returned_customer_revenue(sf_dir: str, k: int = 20, num_partitions: int | None = None):
    """TPC-H Q10 shape: top customers by revenue LOST to returned items in a
    quarter.  The classic fact-fact-dim chain: lineitem (filtered to
    returnflag='R', reduced to (orderkey, cents) BEFORE the shuffle) hash-
    joins the date-windowed orders, per-customer revenue accumulates through
    a customer-keyed partition (high-cardinality key — no combine waste),
    the small per-customer result joins the customer dim, nation names ride
    a broadcast lookup, and the top-k is bounded per-block partials — no
    full sort, no driver loop.  Revenue in exact integer 1e-4 units."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    from ..functions.groupagg import global_topk, highcard_groupagg
    from ..state.partitioning import materialize_clean

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def window(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return t.select(["o_orderkey", "o_custkey"]).filter(
            pa.array((od >= lo) & (od < hi))
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(window, batch_format="pyarrow")

    def returned_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents4": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(returned_cents, batch_format="pyarrow")

    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("n_name", pa.string()), ("c_acctbal", pa.float64()),
         ("revenue_c4", pa.int64())]
    )
    li_m, orders_m = materialize_clean(li), materialize_clean(orders)
    if li_m.count() == 0 or orders_m.count() == 0:
        import ray.data as rd

        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    joined = li_m.join(
        orders_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = highcard_groupagg(
        joined.select_columns(["o_custkey", "cents4"]),
        ["o_custkey"],
        [("cents4", "sum")],
        {"cents4_sum": "revenue_c4"},
    )

    customer = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    per_cust_m = materialize_clean(per_cust)
    if per_cust_m.count() == 0:
        import ray.data as rd

        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    with_dim = per_cust_m.join(
        materialize_clean(customer),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    lut_ref = _nation_lut_ref(sf_dir)

    def label(t: pa.Table) -> pa.Table:
        names = ray.get(lut_ref)[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "n_name": pa.array(names.tolist(), pa.string()),
                "c_acctbal": t["c_acctbal"],
                "revenue_c4": t["revenue_c4"],
            }
        )

    labeled = with_dim.map_batches(label, batch_format="pyarrow")
    return global_topk(labeled, ["revenue_c4", "c_custkey"], [True, False], k)


def nation_pair_trade(sf_dir: str, n1: str = "NATION_1", n2: str = "NATION_2",
                      num_partitions: int | None = None):
    """TPC-H Q7 shape: shipped trade volume between two nations by year and
    direction.  Both fact sides shrink BEFORE the orderkey shuffle: lineitem
    is date-filtered and reduced to (orderkey, supp_nation, year, cents)
    with the supplier dim applied as a broadcast nationkey lookup; orders
    carries cust_nation from a customer hash join pre-filtered to the two
    nations.  The final (supp, cust, year) aggregate is low-cardinality —
    Arrow combine partials, one tiny merge."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import materialize_clean

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")
    pair = pa.array([n1, n2])

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = np.empty(int(nation["n_nationkey"].max()) + 1, dtype=object)
    nname[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    slut = np.empty(int(supplier["s_suppkey"].max()) + 1, dtype=object)
    slut[supplier["s_suppkey"].to_numpy()] = nname[
        supplier["s_nationkey"].to_numpy()
    ]
    slut_ref = ray.put(slut)
    nname_ref = ray.put(nname)

    def li_side(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        supp = ray.get(slut_ref)[t["l_suppkey"].to_numpy(zero_copy_only=False)]
        supp_arr = pa.array(supp.tolist(), pa.string())
        keep = pc.is_in(supp_arr, value_set=pair)
        t = t.filter(keep)
        supp_arr = supp_arr.filter(keep)
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "supp_nation": supp_arr,
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "cents4": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_side, batch_format="pyarrow")

    def cust_side(t: pa.Table) -> pa.Table:
        names = ray.get(nname_ref)[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        arr = pa.array(names.tolist(), pa.string())
        keep = pc.is_in(arr, value_set=pair)
        return pa.table(
            {"c_custkey": t["c_custkey"], "cust_nation": arr}
        ).filter(keep)

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    out_schema = pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("l_year", pa.int64()), ("revenue_c4", pa.int64()),
         ("n_items", pa.int64())]
    )
    import ray.data as rd

    # tiny scale factors can leave either fact side empty (no suppliers /
    # customers in the chosen nations, or no shipments in the window) — an
    # all-empty Acero join side crashes outright, so guard each join input
    li_m = materialize_clean(li)
    cust_m = materialize_clean(customer)
    if li_m.count() == 0 or cust_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    ord_cust = materialize_clean(orders).join(
        cust_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    oc_m = materialize_clean(ord_cust.select_columns(["o_orderkey", "cust_nation"]))
    if oc_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    joined = li_m.join(
        oc_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cross_only(t: pa.Table) -> pa.Table:
        return t.select(
            ["supp_nation", "cust_nation", "l_year", "cents4"]
        ).filter(pc.not_equal(t["supp_nation"], t["cust_nation"]))

    res = materialize_clean(
        lowcard_groupagg(
            joined.map_batches(cross_only, batch_format="pyarrow"),
            ["supp_nation", "cust_nation", "l_year"],
            [("cents4", "sum"), ([], "count_all")],
            {"cents4_sum": "revenue_c4", "count_all": "n_items"},
        )
    )
    # an all-filtered result loses its schema; re-assert the columns so the
    # empty-at-tiny-sf output still carries names
    if res.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    return res


def events_rolling_stats(sf_dir: str, win: int = 4):
    """ROWS-frame rolling window: per user, the trailing-``win``-row sum and
    mean of ``value`` over the deterministic (ts, event_id) order — the
    moving-average smoothing primitive (SQL ``ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW``), complementing the RANGE-frame ``events_trailing_1h``.

    ONE user-keyed hash partition, then a fully vectorized block kernel:
    rows lexsorted by (user, ts, event_id), integer-cent global cumsum, and
    each row's window sum is ``csum[i] - csum[win_lo - 1]`` where ``win_lo``
    clamps to the user's first row — no per-user loop.  Sums are exact
    int64 cents; the mean is the identical IEEE division chain
    ``(sum/100.0)/n`` on both sides, so the whole output hash-matches SQL.
    """
    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("n_win", pa.int64()), ("sum_c", pa.int64()),
         ("avg_value", pa.float64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts.astype(np.int64), uid))
        uid, eid = uid[order], eid[order]
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False)[order] * 100
        ).astype(np.int64)
        n = len(uid)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gstart = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        pos = np.arange(n) - gstart
        lo = np.arange(n) - np.minimum(pos, win - 1)
        csum = np.cumsum(cents)
        roll = csum - np.where(lo > 0, csum[np.maximum(lo - 1, 0)], 0)
        n_win = np.arange(n) - lo + 1
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "n_win": pa.array(n_win, pa.int64()),
                "sum_c": pa.array(roll, pa.int64()),
                "avg_value": pa.array(
                    roll.astype(np.float64) / 100.0 / n_win.astype(np.float64)
                ),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def late_event_stats(sf_dir: str):
    """Out-of-order arrival census — the WATERMARK diagnostic of streaming
    pipelines (SURVEY §2.9): treating ``event_id`` as arrival order, an
    event is LATE if its timestamp precedes the running max timestamp of the
    user's earlier arrivals; report per-user late counts and the worst
    lateness.  One user-keyed partition + a vectorized running-max kernel
    (global ``np.maximum.accumulate`` with per-user restarts), exact int64
    microsecond lateness."""
    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import key_partitioned

    mid_schema = pa.schema(
        [("user_id", pa.int64()), ("is_late", pa.int64()),
         ("late_us", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return mid_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((eid, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        # per-user running max over arrival order (C-level cummax)
        import pandas as pd

        run = (
            pd.Series(ts).groupby(pd.Series(uid), sort=False).cummax().to_numpy()
        )
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[1:] = run[:-1]
        prev_max[new_user] = np.iinfo(np.int64).min
        late = (~new_user) & (ts < prev_max)
        late_us = np.where(late, prev_max - ts, 0)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "is_late": pa.array(late.astype(np.int64), pa.int64()),
                "late_us": pa.array(late_us, pa.int64()),
            },
            schema=mid_schema,
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    per_event = key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )
    return highcard_groupagg(
        per_event,
        ["user_id"],
        [([], "count_all"), ("is_late", "sum"), ("late_us", "max")],
        {"count_all": "n_events", "is_late_sum": "n_late",
         "late_us_max": "max_late_us"},
    )


def event_type_counts_cms(sf_dir: str):
    """Approximate per-key counts via a COUNT-MIN sketch (mergeable,
    overestimate-only) — the fixed-memory alternative to an exact groupby
    when the key domain is unbounded: every block folds its events into one
    (4 x 2048) int64 table (64 KiB regardless of rows), tables merge by
    addition in any tree shape, and only the tiny table + the probe keys
    reach the driver.

    Here the probe keys are the (low-cardinality) distinct event types so
    the estimates can be pinned against exact counts in pytest
    (est >= exact, est <= exact + eps*N at eps = e/width).  Although the
    ESTIMATE is approximate, the sketch itself is a pure deterministic
    function of the exact per-type counts (md5-low64 key, splitmix-style
    double hashing) — so the DuckDB oracle replays it EXACTLY, emulating
    the 64-bit wraparound multiplies in HUGEINT.
    Output: ``event_type, est_n``."""
    import ray.data as rd

    from ..functions.hashing import md5_low64
    from ..state.sketch import CMS_D, CMS_W, cms_merge, cms_query, cms_table

    ds = _read(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"kind": pa.array([], pa.string()),
                 "payload": pa.array([], pa.binary()),
                 "key": pa.array([], pa.string())}
            )
        vc = pc.value_counts(t["event_type"].combine_chunks())
        names = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        keys = np.array([md5_low64(s) for s in names], dtype=np.uint64)
        table = cms_table(keys, counts)
        return pa.table(
            {
                "kind": pa.array(["table"] + ["type"] * len(names), pa.string()),
                "payload": pa.array(
                    [table.tobytes()] + [b""] * len(names), pa.binary()
                ),
                "key": pa.array([""] + names, pa.string()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tables = [
        np.frombuffer(p, dtype=np.int64).reshape(CMS_D, CMS_W)
        for p in rows.loc[rows["kind"] == "table", "payload"]
    ]
    if not tables:
        return rd.from_items([])
    merged = cms_merge(tables)
    types = sorted(set(rows.loc[rows["kind"] == "type", "key"]))
    keys = np.array([md5_low64(s) for s in types], dtype=np.uint64)
    ests = cms_query(merged, keys)
    return rd.from_items(
        [
            {"event_type": t, "est_n": int(e)}
            for t, e in zip(types, ests)
        ]
    )


def hourly_active_users(sf_dir: str):
    """Distinct-count-per-window (the DAU/MAU-style metric): unique users
    per hour bucket.  Exact, with the pre-distinct combiner: every block
    first collapses to its own distinct (hour, user) pairs (bounded by
    actives, not events), ONE keyed shuffle on the pair collapses
    cross-block repeats, and the per-hour count is a block-local group
    size — no count-distinct shuffle of raw events."""
    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"hour": pa.array([], pa.timestamp("us")),
                 "user_id": pa.array([], pa.int64())}
            )
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({"hour": hours, "user_id": batch["user_id"]})
        return t.group_by(["hour", "user_id"]).aggregate([])

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow")

    def per_hour(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"hour": pa.array([], pa.timestamp("us")),
                 "n_users": pa.array([], pa.int64())}
            )
        # one keyed partition on (hour, user): distinct pairs collapse here,
        # then the per-hour distinct count is a local group size
        d = batch.group_by(["hour", "user_id"]).aggregate([])
        return d.group_by(["hour"]).aggregate([([], "count_all")]).rename_columns(
            ["hour", "n_users"]
        )

    grouped = key_partitioned(pairs, ["hour", "user_id"]).map_batches(
        per_hour, batch_format="pyarrow", batch_size=None
    )
    # (hour, user) partitions split one hour across blocks — re-sum per hour
    return highcard_groupagg(
        grouped, ["hour"], [("n_users", "sum")], {"n_users_sum": "n_users"}
    )


def late_shipment_priority(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q4 shape: order-priority census of one quarter's orders that
    have AT LEAST ONE late line item (shipped > 90 days after the order
    date) — the fact-scale EXISTS semi-join.  The windowed orders carry
    (orderkey, date, priority) through a hash join with the pruned
    lineitem side; the exists-filtered matches collapse to one row per
    order via an orderkey-keyed partial (min priority — unique per order),
    and the priority census is a low-cardinality combine."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    from ..functions.groupagg import highcard_groupagg, lowcard_groupagg
    from ..state.partitioning import materialize_clean

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def window(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((od >= lo) & (od < hi)))

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(window, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    out_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("n_orders", pa.int64())]
    )
    orders_m, li_m = materialize_clean(orders), materialize_clean(li)
    if orders_m.count() == 0 or li_m.count() == 0:
        import ray.data as rd

        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    joined = li_m.join(
        orders_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def late_only(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        late = sd > od + np.timedelta64(90, "D")
        return t.select(["l_orderkey", "o_orderpriority"]).filter(pa.array(late))

    late = joined.map_batches(late_only, batch_format="pyarrow")
    per_order = highcard_groupagg(
        late, ["l_orderkey"], [("o_orderpriority", "min")],
        {"o_orderpriority_min": "o_orderpriority"},
    )
    return lowcard_groupagg(
        per_order.select_columns(["o_orderpriority"]),
        ["o_orderpriority"],
        [([], "count_all")],
        {"count_all": "n_orders"},
    )


def user_event_runs(sf_dir: str):
    """GAPS-AND-ISLANDS: collapse each user's consecutive identical event
    types (on the deterministic (ts, event_id) order) into runs — the
    run-length compression / "islands" pattern (SQL: the classic
    row_number-difference grouping).  One user-keyed partition + a
    vectorized boundary mask; run indices and lengths are exact integers.
    Output: ``user_id, run_idx (1-based), event_type, run_len``."""
    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("run_idx", pa.int64()),
         ("event_type", pa.string()), ("run_len", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        et = t["event_type"].combine_chunks()
        order = np.lexsort((eid, ts.astype(np.int64), uid))
        uid = uid[order]
        codes = (
            et.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
        )
        n = len(uid)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_run = new_user.copy()
        new_run[1:] |= codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(starts, n))
        # 1-based run index within user: cumulative runs minus runs before
        # the user's first run
        run_seq = np.cumsum(new_run)            # global run number (1-based)
        # map each run to its user's first global run number
        first_of_user = np.maximum.accumulate(
            np.where(new_user[starts], run_seq[starts], 0)
        )
        run_idx = run_seq[starts] - first_of_user + 1
        et_sorted = et.take(pa.array(order.astype(np.int64)))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "run_idx": pa.array(run_idx, pa.int64()),
                "event_type": et_sorted.take(pa.array(starts.astype(np.int64))),
                "run_len": pa.array(run_lens, pa.int64()),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def key_skew_report(sf_dir: str, table: str = "events", key: str = "user_id"):
    """Shuffle-SKEW diagnostic — the pre-flight check a 100-TB pipeline runs
    before keying a shuffle on a column: per-key count distribution (max /
    p50 / p99 of counts), total keys, and the heaviest key.  Heavy-key
    output is what drives salting decisions (SURVEY §4 skew row; the LSH
    bucket cap is the in-pipeline version of this check).

    Shape: one key-keyed combine (bounded by distinct keys) -> a tiny
    count-of-counts histogram (domain = distinct count VALUES) walked on the
    driver with the pinned ``quantile_disc`` rule; the heaviest key rides
    bounded per-block top-1 partials.  Output single row: ``n_rows, n_keys,
    max_count, top_key, p50_count, p99_count``."""
    import math

    import ray.data as rd

    from ..functions.groupagg import global_topk, highcard_groupagg

    from ..state.partitioning import materialize_clean

    # materialize once: both the histogram branch and the top-1 branch
    # consume this (review fix: a lazy dataset re-executes the events scan
    # and keyed shuffle per consumer)
    counts = materialize_clean(
        highcard_groupagg(
            _read(sf_dir, table, [key]),
            [key],
            [([], "count_all")],
            {"count_all": "n"},
        )
    )
    if counts.count() == 0:
        return rd.from_items([])

    def cc_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "m": pa.array([], pa.int64())}
            )
        u, m = np.unique(t["n"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"c": pa.array(u, pa.int64()), "m": pa.array(m, pa.int64())}
        )

    hist = (
        highcard_groupagg(
            counts.map_batches(cc_partial, batch_format="pyarrow"),
            ["c"], [("m", "sum")], {"m_sum": "m"},
        )
        .to_pandas()
        .sort_values("c")
    )
    top = global_topk(counts, ["n", key], [True, False], 1).to_pandas()

    c = hist["c"].to_numpy()
    m = hist["m"].to_numpy()
    cum = np.cumsum(m)
    n_keys = int(cum[-1])
    n_rows = int((c * m).sum())
    out = {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "max_count": int(c[-1]),
        "top_key": int(top[key].iloc[0]),
        # the pinned quantile_disc rule: element at rank max(1, ceil(q*N))
        "p50_count": int(c[np.searchsorted(cum, max(1, math.ceil(0.5 * n_keys)))]),
        "p99_count": int(c[np.searchsorted(cum, max(1, math.ceil(0.99 * n_keys)))]),
    }
    return rd.from_items([out])


def nation_market_share(sf_dir: str, region: str = "ASIA", nation: str = "NATION_7",
                        lo_year: int = 1995, hi_year: int = 2001,
                        num_partitions: int | None = None):
    """TPC-H Q8 shape — MARKET SHARE: for each order year, the fraction of a
    region's customer-order revenue supplied by one target nation.

    Both fact sides shrink before the single orderkey shuffle (the Q7
    discipline, cf. :func:`nation_pair_trade`): orders is year-windowed and
    reduced to (orderkey, year) through a customer hash join pre-filtered to
    the region's nations; lineitem reduces to (orderkey, cents4, target
    cents4) with the supplier->nation dim applied as a broadcast lookup.
    Revenue folds as exact integer 1e-4 units via per-block partials; the
    only floating-point step is the final share division, the identical
    IEEE expression in SQL (``CAST(num AS DOUBLE) / CAST(den AS DOUBLE)``),
    so the whole output hash-matches DuckDB.

    Reference parity: the reference's only "share" computation is the
    ranked-distance normalization at the query edge; this operator carries
    the grouped-conditional-ratio semantics (A1/A2 family, SURVEY §2.5).
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray
    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import materialize_clean

    lo = np.datetime64(f"{lo_year}-01-01", "us")
    hi = np.datetime64(f"{hi_year}-01-01", "us")

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy().tolist()
    )
    region_nations = pa.array(
        nat.loc[nat["n_regionkey"].isin(region_keys), "n_nationkey"]
        .to_numpy()
        .astype(np.int64)
    )
    target_nk = set(
        nat.loc[nat["n_name"] == nation, "n_nationkey"].to_numpy().tolist()
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    s_is_target = np.zeros(int(supplier["s_suppkey"].max()) + 1, dtype=bool)
    s_is_target[
        supplier.loc[supplier["s_nationkey"].isin(target_nk), "s_suppkey"].to_numpy()
    ] = True
    target_ref = ray.put(s_is_target)

    def cust_side(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                        value_set=region_nations)
        return t.select(["c_custkey"]).filter(keep)

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow"
    )

    def ord_side(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((od >= lo) & (od < hi)))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ord_side, batch_format="pyarrow")

    def li_side(t: pa.Table) -> pa.Table:
        mask = ray.get(target_ref)
        is_t = mask[t["l_suppkey"].to_numpy(zero_copy_only=False)]
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cents4 = price_c * (100 - disc_c)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents4": pa.array(cents4, pa.int64()),
                "target_c4": pa.array(np.where(is_t, cents4, 0), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_side, batch_format="pyarrow")

    out_schema = pa.schema(
        [("o_year", pa.int64()), ("nation_rev_c4", pa.int64()),
         ("total_rev_c4", pa.int64()), ("mkt_share", pa.float64())]
    )
    cust_m = materialize_clean(customer)
    ord_m = materialize_clean(orders)
    if cust_m.count() == 0 or ord_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    ord_reg = ord_m.join(
        cust_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    ord_reg_m = materialize_clean(ord_reg.select_columns(["o_orderkey", "o_year"]))
    li_m = materialize_clean(li)
    if ord_reg_m.count() == 0 or li_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    joined = li_m.join(
        ord_reg_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    sums = lowcard_groupagg(
        joined.select_columns(["o_year", "cents4", "target_c4"]),
        ["o_year"],
        [("target_c4", "sum"), ("cents4", "sum")],
        {"target_c4_sum": "nation_rev_c4", "cents4_sum": "total_rev_c4"},
    )

    def finish(t: pa.Table) -> pa.Table:
        num = t["nation_rev_c4"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = t["total_rev_c4"].to_numpy(zero_copy_only=False).astype(np.int64)
        share = num.astype(np.float64) / den.astype(np.float64)
        return pa.table(
            {
                "o_year": pc.cast(t["o_year"], pa.int64()),
                "nation_rev_c4": pa.array(num, pa.int64()),
                "total_rev_c4": pa.array(den, pa.int64()),
                "mkt_share": pa.array(share, pa.float64()),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def blame_suppliers(sf_dir: str, late_days: int = 90, k: int = 20,
                    num_partitions: int | None = None):
    """TPC-H Q21 shape — SOLE-BLAME census: suppliers who were the ONLY late
    supplier on a multi-supplier order (late = shipped > ``late_days`` after
    the order date), ranked by how many orders they alone delayed.

    The composed EXISTS + NOT-EXISTS correlated subqueries become ONE
    orderkey-keyed aggregation: lineitem joins the (orderkey, orderdate)
    side, collapses to per-(order, supplier) ``any_late`` partials, then a
    per-order combine counts suppliers and late suppliers — the blame filter
    ``n_supp > 1 AND n_late_supp == 1 AND late(s)`` is a vectorized mask, and
    the final per-supplier census is a low-cardinality combine + bounded
    top-k.  No correlated per-row probing anywhere.

    Reference parity: the "exactly one offender per group" selection mirrors
    the reference's first-hit-per-(shot, video) dedup walk
    (``server_ndd.py:127-142``) inverted to a group-quantified predicate.
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray.data as rd

    from ..functions.groupagg import global_topk, lowcard_groupagg
    from ..state.partitioning import key_partitioned, materialize_clean

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("numwait", pa.int64())]
    )
    ord_m, li_m = materialize_clean(orders), materialize_clean(li)
    if ord_m.count() == 0 or li_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    joined = li_m.join(
        ord_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]")

    # map-side combine: per-(order, supplier) any_late partial per block —
    # shuffle volume shrinks from one row per line item to one per pair
    def per_pair_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        rows = pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "late": pa.array((sd > od + late_us).astype(np.int64), pa.int64()),
            }
        )
        part = rows.group_by(["l_orderkey", "l_suppkey"]).aggregate([("late", "max")])
        return part.rename_columns(["l_orderkey", "l_suppkey", "late"])

    pair_late = joined.map_batches(per_pair_partial, batch_format="pyarrow")

    # ONE orderkey shuffle; combine pair partials and apply the blame mask
    # inside the same block (every row of an order is co-located)
    def blame_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        t = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("late", "max")])
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        late = t["late_max"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok, sk, late = ok[order], sk[order], late[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        counts = np.diff(np.r_[starts, ok.size])
        n_late = np.add.reduceat(late, starts)
        grp = np.repeat(np.arange(starts.size), counts)
        keep = (counts[grp] > 1) & (n_late[grp] == 1) & (late == 1)
        return pa.table({"s_suppkey": pa.array(sk[keep], pa.int64())})

    blamed = key_partitioned(
        pair_late, ["l_orderkey"], num_partitions=num_partitions
    ).map_batches(blame_block, batch_format="pyarrow", batch_size=None)

    census = lowcard_groupagg(
        blamed, ["s_suppkey"], [([], "count_all")], {"count_all": "numwait"}
    )
    cm = materialize_clean(census)
    if cm.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    top = global_topk(cm, ["numwait", "s_suppkey"], [True, False], k)

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sname = dict(zip(supplier["s_suppkey"].tolist(), supplier["s_name"].tolist()))

    def attach_name(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
        names = pa.array([sname.get(int(s)) for s in sk], pa.string())
        return pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": names,
                "numwait": pc.cast(t["numwait"], pa.int64()),
            }
        )

    return top.map_batches(attach_name, batch_format="pyarrow")


def events_hopping_counts(sf_dir: str, win_min: int = 60, hop_min: int = 15):
    """HOPPING (sliding) window aggregate, SURVEY §2.9: event counts and value
    sums per 60-minute window hopping every 15 minutes — each event fans out
    to ``win/hop`` overlapping windows.

    The fan-out is one vectorized ``np.repeat``/tile per batch (no per-row
    Python), after which window starts are a LOW-cardinality key (bounded by
    the covered time range / hop), so the combiner pattern collapses each
    block map-side and one tiny merge finishes — per-event shuffle volume is
    zero.  Value sums fold as exact integer cents; the mean is the identical
    IEEE division chain ``(sum/100.0)/n`` in SQL, so the output hash-matches.

    Windows are epoch-aligned: ``window_start = floor(epoch_us / hop) * hop -
    k * hop`` for ``k in [0, win/hop)``, matching the SQL derivation
    ``ts - (epoch_us(ts) % hop_us) * INTERVAL 1 MICROSECOND - k * hop``.
    """
    from ..functions.groupagg import lowcard_groupagg

    assert win_min % hop_min == 0
    n_hops = win_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    ds = _read(sf_dir, "events", ["ts", "value"])

    def fan_out(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        us = ts.astype(np.int64)
        base = (us // hop_us) * hop_us
        cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        starts = np.repeat(base, n_hops) - np.tile(
            np.arange(n_hops, dtype=np.int64) * hop_us, us.size
        )
        return pa.table(
            {
                "window_start": pa.array(
                    starts.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "value_c": pa.array(np.repeat(cents, n_hops), pa.int64()),
            }
        )

    agg = lowcard_groupagg(
        ds.map_batches(fan_out, batch_format="pyarrow"),
        ["window_start"],
        [([], "count_all"), ("value_c", "sum")],
        {"count_all": "n_events", "value_c_sum": "value_c"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        vc = t["value_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = (vc / 100.0) / n
        return pa.table(
            {
                "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
                "n_events": pa.array(n, pa.int64()),
                "value_c": pa.array(vc, pa.int64()),
                "avg_value": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def qty_discount_spearman(sf_dir: str):
    """SPEARMAN rank correlation between ``l_quantity`` and ``l_discount`` —
    the rank-based (outlier-robust) counterpart of :func:`qty_discount_corr`.

    Global average ranks normally need a full sort; both columns here have
    TINY bounded domains (50 quantities x 11 discount cents), so the exact
    joint histogram is sufficient: per-block vectorized bincount partials
    over packed (q, d) cells, one combiner merge (<= 550 rows), and every
    sufficient sum derives from the tiny histogram with ARBITRARY-PRECISION
    Python ints on the driver (tie-averaged rank x2 stays integral:
    ``rank2(v) = 2*cum_below(v) + cnt(v) + 1``).  No shuffle, no sort, no
    overflow at any scale.  The only floating-point steps are the final
    casts + one division/sqrt chain — the identical IEEE expression the SQL
    oracle computes from window-function ranks, so the output hash-matches.
    """
    import math

    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def cells(t: pa.Table) -> pa.Table:
        q = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        d = np.round(t["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        packed = q * 1000 + d
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    hist = (
        lowcard_groupagg(
            ds.map_batches(cells, batch_format="pyarrow"),
            ["cell"], [("cnt", "sum")], {"cnt_sum": "cnt"},
        )
        .to_pandas()
    )
    if hist.empty:
        return rd.from_items([])
    cell = hist["cell"].to_numpy()
    cnt = hist["cnt"].to_numpy()
    q, d = cell // 1000, cell % 1000

    def rank2_map(vals, counts):
        """value -> 2x tie-averaged global rank, exact ints."""
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], counts[order]
        # collapse duplicate values (cells share q across d)
        uv, start = np.unique(v, return_index=True)
        uc = np.add.reduceat(c, start)
        cum_below = np.concatenate(([0], np.cumsum(uc)[:-1]))
        r2 = 2 * cum_below + uc + 1
        return dict(zip(uv.tolist(), r2.tolist()))

    qmap = rank2_map(q, cnt)
    dmap = rank2_map(d, cnt)
    n = int(cnt.sum())
    sx = sy = sxx = syy = sxy = 0
    for qi, di, ci in zip(q.tolist(), d.tolist(), cnt.tolist()):
        rx, ry, c = qmap[qi], dmap[di], int(ci)
        sx += rx * c
        sy += ry * c
        sxx += rx * rx * c
        syy += ry * ry * c
        sxy += rx * ry * c
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    spearman = num / den
    return rd.from_items([{"n_rows": n, "spearman": spearman}])


def click_attribution(sf_dir: str, window_minutes: int = 30):
    """STREAM-STREAM WINDOWED JOIN (§2.9): for every ``purchase`` event, the
    number of the same user's ``click`` events in the trailing
    ``window_minutes`` window ``(p.ts - w, p.ts]`` — the attribution join of
    event analytics, and the interval-join family member (J1) where BOTH
    sides are fact streams.

    No self-join shuffle: the pruned two-type stream takes ONE user-keyed
    hash partition, then the banded-key kernel of :func:`events_trailing_1h`
    (user-rank band wider than the window, two global ``np.searchsorted``
    calls, one click-indicator prefix sum) counts window clicks for all
    purchases at once — per-row work is O(log n) with zero Python loops.
    """
    import pandas as pd

    from ..state.partitioning import key_partitioned

    window_us = np.int64(window_minutes) * 60 * 1_000_000
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("n_clicks_30m", pa.int64())]
    )

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rank = pd.factorize(df["user_id"], sort=False)[0].astype(np.int64)
        tmin = ts.min()
        span = (ts.max() - tmin) + window_us + 1
        key = rank * span + (ts - tmin)
        left = np.searchsorted(key, key - window_us, side="right")
        right = np.searchsorted(key, key, side="right")
        is_click = (df["event_type"].to_numpy() == "click").astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(is_click)))
        n_clicks = csum[right] - csum[left]
        is_purchase = df["event_type"].to_numpy() == "purchase"
        return pa.table(
            {
                "event_id": pa.array(
                    df["event_id"].to_numpy()[is_purchase], pa.int64()
                ),
                "user_id": pa.array(
                    df["user_id"].to_numpy()[is_purchase], pa.int64()
                ),
                "n_clicks_30m": pa.array(n_clicks[is_purchase], pa.int64()),
            },
            schema=out_schema,
        )

    parts = key_partitioned(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(prune, batch_format="pyarrow"),
        ["user_id"],
    )
    return parts.map_batches(block, batch_format="pandas", batch_size=None)


def event_type_cooccurrence(sf_dir: str):
    """CO-OCCURRENCE MINING: for every unordered pair of event types, how
    many users performed BOTH — the frequent-itemset (market-basket) kernel
    at itemset size 2.

    The naive plan is a distinct + self-join + pair shuffle; with a tiny
    type vocabulary the whole computation collapses into a BITMASK
    HISTOGRAM: one user-keyed partition dedups (user, type) pairs and folds
    each user into a <=32-bit presence mask, blocks emit bounded mask
    histograms (<= 2^|types| cells), and every pair count is a driver-side
    sum over the tiny histogram — per-user data never leaves its partition
    and the pair fan-out never materializes.  Types are bit-ordered
    lexicographically so pair emission matches SQL's ``a.event_type <
    b.event_type`` join order.
    """
    import ray.data as rd

    from ..state.partitioning import key_partitioned

    # tiny global vocabulary, lexicographic bit order
    types = sorted(
        _read(sf_dir, "events", ["event_type"])
        .unique("event_type")
    )
    bit = {t: i for i, t in enumerate(types)}
    n_types = len(types)
    if n_types == 0:
        return rd.from_items([])

    type_arr = pa.array(types, pa.string())

    def mask_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"mask": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        code = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(uid, kind="stable")
        uid, code = uid[order], code[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        grp = np.repeat(np.arange(starts.size), np.diff(np.r_[starts, uid.size]))
        masks = np.zeros(starts.size, dtype=np.int64)
        np.bitwise_or.at(masks, grp, np.int64(1) << code.astype(np.int64))
        u, cnt = np.unique(masks, return_counts=True)
        return pa.table(
            {"mask": pa.array(u, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    hist = (
        key_partitioned(_read(sf_dir, "events", ["user_id", "event_type"]),
                        ["user_id"])
        .map_batches(mask_hist, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    agg = hist.groupby("mask")["n"].sum()
    rows = []
    for i in range(n_types):
        for j in range(i + 1, n_types):
            need = (1 << i) | (1 << j)
            n = int(agg[(agg.index.to_numpy() & need) == need].sum())
            if n:
                rows.append(
                    {"type_a": types[i], "type_b": types[j], "n_users": n}
                )
    return rd.from_items(rows)


def profile_tables(sf_dir: str, tables: tuple = ("documents", "events")):
    """DATA-QUALITY PROFILING census (input-validation family M2/M14): one
    row per (table, column) with exact row/null counts and, for numeric
    columns, the global min/max — the pre-flight schema probe a pipeline
    runs before committing 100 TB of compute to malformed input.

    Per-block Arrow partials (null_count off the validity bitmap, one
    ``pc.min_max`` per numeric column — no Python per row), combined by the
    low-cardinality pattern keyed on (table, column).  min/max are exact
    PICKS of existing values (no arithmetic), so the doubles hash-match SQL
    bit-for-bit; non-numeric columns carry NULL bounds on both sides.
    """
    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg

    partial_schema = pa.schema(
        [("table_name", pa.string()), ("col_name", pa.string()),
         ("n_rows", pa.int64()), ("n_null", pa.int64()),
         ("min_num", pa.float64()), ("max_num", pa.float64())]
    )

    def make_profiler(tname: str):
        def profile_block(batch: pa.Table) -> pa.Table:
            rows = {k: [] for k in
                    ("table_name", "col_name", "n_rows", "n_null",
                     "min_num", "max_num")}
            for name in batch.column_names:
                col = batch[name]
                rows["table_name"].append(tname)
                rows["col_name"].append(name)
                rows["n_rows"].append(batch.num_rows)
                rows["n_null"].append(col.null_count)
                if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                    mm = pc.min_max(col)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    rows["min_num"].append(
                        float(mn) if mn is not None else None
                    )
                    rows["max_num"].append(
                        float(mx) if mx is not None else None
                    )
                else:
                    rows["min_num"].append(None)
                    rows["max_num"].append(None)
            return pa.table(rows, schema=partial_schema)

        return profile_block

    parts = None
    for tname in tables:
        p = _read(sf_dir, tname).map_batches(
            make_profiler(tname), batch_format="pyarrow"
        )
        parts = p if parts is None else parts.union(p)

    return lowcard_groupagg(
        parts,
        ["table_name", "col_name"],
        [("n_rows", "sum"), ("n_null", "sum"),
         ("min_num", "min"), ("max_num", "max")],
        {"n_rows_sum": "n_rows", "n_null_sum": "n_null",
         "min_num_min": "min_num", "max_num_max": "max_num"},
    )


def part_best_supplier(sf_dir: str, size_min: int = 40, num_partitions: int | None = None,
                       k: int = 25):
    """TPC-H Q2 shape — BEST SUPPLIER PER PART: for every large part
    (``p_size >= size_min``), the shipping supplier with the highest account
    balance (ties to the smaller suppkey).  The reference dataset has no
    partsupp table, so the part-supplier BRIDGE is derived from lineitem as
    the distinct (partkey, suppkey) pairs — the fact-derived-dimension
    pattern.

    Plan: lineitem reduces map-side to per-block distinct pairs with the
    part-size filter applied as a broadcast bitmask BEFORE the shuffle, the
    supplier dim attaches (s_acctbal, s_name) via a second broadcast lookup,
    and the per-part argmax folds in one partkey-keyed partition (no join
    of fact-scale rows against either dim).  Bounded top-k output ordered by
    (s_acctbal DESC, p_partkey ASC).
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray
    import ray.data as rd

    from ..functions.groupagg import global_topk
    from ..state.partitioning import key_partitioned

    part = _read(sf_dir, "part", ["p_partkey", "p_size"]).to_pandas()
    big = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    big[part.loc[part["p_size"] >= size_min, "p_partkey"].to_numpy()] = True
    big_ref = ray.put(big)

    supplier = _read(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"]
    ).to_pandas()
    n_supp = int(supplier["s_suppkey"].max()) + 1
    bal = np.full(n_supp, np.nan)
    bal[supplier["s_suppkey"].to_numpy()] = supplier["s_acctbal"].to_numpy()
    names = np.empty(n_supp, dtype=object)
    names[supplier["s_suppkey"].to_numpy()] = supplier["s_name"].to_numpy()
    supp_ref = ray.put((bal, names))

    def bridge(t: pa.Table) -> pa.Table:
        mask = ray.get(big_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = mask[pk]
        pk, sk = pk[keep], sk[keep]
        if pk.size == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "s_suppkey": pa.array([], pa.int64()),
                }
            )
        # map-side distinct: shuffle volume = unique pairs per block; the
        # pack multiplier is block-local so no global suppkey bound is assumed
        mult = np.int64(sk.max()) + 1
        u = np.unique(pk.astype(np.int64) * mult + sk)
        return pa.table(
            {
                "p_partkey": pa.array(u // mult, pa.int64()),
                "s_suppkey": pa.array(u % mult, pa.int64()),
            }
        )

    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        bridge, batch_format="pyarrow"
    )

    def best_block(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("p_partkey", pa.int64()), ("s_suppkey", pa.int64()),
             ("s_name", pa.string()), ("s_acctbal", pa.float64())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        bal_arr, name_arr = ray.get(supp_ref)
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
        b = bal_arr[sk]
        # argmax per part: sort by (part, -bal, suppkey), keep first per part
        order = np.lexsort((sk, -b, pk))
        pk, sk, b = pk[order], sk[order], b[order]
        first = np.r_[True, pk[1:] != pk[:-1]]
        pk, sk, b = pk[first], sk[first], b[first]
        return pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pa.array(name_arr[sk].tolist(), pa.string()),
                "s_acctbal": pa.array(b, pa.float64()),
            },
            schema=out_schema,
        )

    best = key_partitioned(
        pairs, ["p_partkey"], num_partitions=num_partitions
    ).map_batches(best_block, batch_format="pyarrow", batch_size=None)
    return global_topk(best, ["s_acctbal", "p_partkey"], [True, False], k)


def monthly_revenue_growth(sf_dir: str):
    """MONTH-OVER-MONTH GROWTH: shipped revenue per calendar month plus the
    relative change vs the previous month — the lag-over-aggregate time
    series every dashboard layer asks of an engine.

    Revenue folds as exact integer 1e-4 units via the combiner pattern
    (months are low-cardinality); the growth ratio is computed on the TINY
    aggregated series driver-side with the identical IEEE expression the SQL
    window ``lag`` produces (``CAST(cur - prev AS DOUBLE) / CAST(prev AS
    DOUBLE)``; first month NULL on both sides).
    """
    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["l_shipdate"], unit="month")
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"month": month, "c4": pa.array(price_c * (100 - disc_c), pa.int64())}
        )

    series = (
        lowcard_groupagg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["month"], [("c4", "sum")], {"c4_sum": "rev_c4"},
        )
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    cur = series["rev_c4"].to_numpy().astype(np.int64)
    prev = np.roll(cur, 1).astype(np.float64)
    growth = (cur - np.roll(cur, 1)).astype(np.float64) / prev
    if len(growth):
        growth[0] = np.nan
    series["mom_growth"] = growth
    series["month"] = series["month"].astype("datetime64[us]")
    return rd.from_pandas(series[["month", "rev_c4", "mom_growth"]])


def weekday_hour_heatmap(sf_dir: str):
    """TEMPORAL SEASONALITY heat map: event counts and exact-cent value sums
    per (ISO weekday, hour-of-day) cell — the 7x24 activity profile used to
    spot load seasonality.  Cell domain is fixed (168), so the combiner
    pattern collapses everything map-side; ``pc.day_of_week`` (Monday=0) is
    shifted +1 to match SQL ``isodow``.
    """
    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "events", ["ts", "value"])

    def cells(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["ts"]), 1)  # ISO: Monday=1
        hour = pc.hour(t["ts"])
        cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "isodow": pc.cast(dow, pa.int64()),
                "hour": pc.cast(hour, pa.int64()),
                "value_c": pa.array(cents, pa.int64()),
            }
        )

    return lowcard_groupagg(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["isodow", "hour"],
        [([], "count_all"), ("value_c", "sum")],
        {"count_all": "n_events", "value_c_sum": "value_c"},
    )


def user_features(sf_dir: str):
    """ML FEATURE ASSEMBLY: one row per user with the standard behavioral
    features a churn/LTV model trains on — event count, distinct active
    days, exact-cent value sum, mean value (single IEEE division), first/
    last activity, and tenure in days (exact int64 date arithmetic).

    ONE user-keyed hash partition; every feature folds inside the block
    with Arrow/NumPy kernels (count, min/max, bincount-free day distinct
    via per-user sorted runs).  The feature-table pattern is the engine's
    answer to "prepare the training matrix" — downstream samplers/joins
    consume it columnar.
    """
    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("n_active_days", pa.int64()), ("value_c", pa.int64()),
         ("avg_value", pa.float64()), ("first_ts", pa.timestamp("us")),
         ("last_ts", pa.timestamp("us")), ("tenure_days", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        us = ts.astype(np.int64)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        day = us // np.int64(86_400_000_000)
        order = np.lexsort((day, uid))
        uid_s, us_s, day_s, cents_s = uid[order], us[order], day[order], cents[order]
        starts = np.flatnonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])
        ends = np.r_[starts[1:], uid_s.size]
        n = ends - starts
        vsum = np.add.reduceat(cents_s, starts)
        # distinct days: day changes within each user's sorted run
        day_change = np.r_[True, day_s[1:] != day_s[:-1]]
        day_change[starts] = True
        cum = np.concatenate(([0], np.cumsum(day_change)))
        n_days = cum[ends] - cum[starts]
        first_us = np.minimum.reduceat(us_s, starts)
        last_us = np.maximum.reduceat(us_s, starts)
        tenure = last_us // np.int64(86_400_000_000) - first_us // np.int64(
            86_400_000_000
        )
        avg = (vsum / 100.0) / n
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "n_active_days": pa.array(n_days, pa.int64()),
                "value_c": pa.array(vsum, pa.int64()),
                "avg_value": pa.array(avg, pa.float64()),
                "first_ts": pa.array(first_us.astype("datetime64[us]"),
                                     pa.timestamp("us")),
                "last_ts": pa.array(last_us.astype("datetime64[us]"),
                                    pa.timestamp("us")),
                "tenure_days": pa.array(tenure, pa.int64()),
            },
            schema=out_schema,
        )

    return key_partitioned(
        _read(sf_dir, "events", ["user_id", "ts", "value"]), ["user_id"]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def order_line_share(sf_dir: str, num_partitions: int | None = None):
    """WINDOWED PERCENT-OF-TOTAL: every line item's share of its order's
    revenue — the ``sum() OVER (PARTITION BY ...)`` denominator window,
    the one window shape (aggregate-as-denominator) the rank/lag/rolling
    family here didn't yet cover.

    ONE orderkey-keyed partition; the block kernel sorts by (order, line),
    folds exact 1e-4-unit line revenues, broadcasts each order's total back
    with ``np.repeat`` — no join, no second pass.  The share is the
    identical IEEE division ``CAST(line_c4 AS DOUBLE) / CAST(order_c4 AS
    DOUBLE)`` in SQL, so the full fact-scale output hash-matches.
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_linenumber", pa.int64()),
         ("line_c4", pa.int64()), ("order_c4", pa.int64()),
         ("line_share", pa.float64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        c4 = price_c * (100 - disc_c)
        order = np.lexsort((ln, ok))
        ok, ln, c4 = ok[order], ln[order], c4[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        totals = np.add.reduceat(c4, starts)
        counts = np.diff(np.r_[starts, ok.size])
        tot_row = np.repeat(totals, counts)
        share = c4.astype(np.float64) / tot_row.astype(np.float64)
        return pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_linenumber": pa.array(ln.astype(np.int64), pa.int64()),
                "line_c4": pa.array(c4, pa.int64()),
                "order_c4": pa.array(tot_row, pa.int64()),
                "line_share": pa.array(share, pa.float64()),
            },
            schema=out_schema,
        )

    return key_partitioned(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"]),
        ["l_orderkey"], num_partitions,
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def shipping_delay_histogram(sf_dir: str, num_partitions: int | None = None):
    """FULFILLMENT-LATENCY distribution: exact day-difference between each
    line item's ship date and its order's date, as an integer histogram —
    the operational-latency census (how long orders wait) over a fact-fact
    join.  One orderkey hash join (order side pruned to two columns), then
    the bounded-domain day diff folds via the combiner pattern; day
    arithmetic is exact int64 on both sides (``date_diff('day', ...)``).
    """
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import materialize_clean

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    out_schema = pa.schema([("delay_days", pa.int64()), ("n_items", pa.int64())])
    ord_m, li_m = materialize_clean(orders), materialize_clean(li)
    if ord_m.count() == 0 or li_m.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()

    joined = li_m.join(
        ord_m,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    DAY = np.int64(86_400_000_000)

    def diff(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {"delay_days": pa.array(sd // DAY - od // DAY, pa.int64())}
        )

    return lowcard_groupagg(
        joined.map_batches(diff, batch_format="pyarrow"),
        ["delay_days"], [([], "count_all")], {"count_all": "n_items"},
    )


def revenue_concentration(sf_dir: str, k: int = 10):
    """REVENUE CONCENTRATION: the share of total revenue held by the top-``k``
    customers — the Pareto/concentration census (how dependent is the
    business on its biggest accounts).  Per-customer exact 1e-4-unit revenue
    folds through one custkey-keyed combine; the top-k rides bounded
    per-block partials; total revenue is a one-row combiner sum.  Output is
    a single row (top-k cents, total cents, one IEEE division) — identical
    expression in SQL.
    """
    import ray.data as rd

    from ..functions.groupagg import global_topk, highcard_groupagg, lowcard_groupagg
    from ..state.partitioning import materialize_clean

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
             "c": pa.array(c, pa.int64())}
        )

    per_cust = materialize_clean(
        highcard_groupagg(
            orders.map_batches(cents, batch_format="pyarrow"),
            ["o_custkey"], [("c", "sum")], {"c_sum": "rev_c"},
        )
    )
    if per_cust.count() == 0:
        return rd.from_items([])
    top = global_topk(per_cust, ["rev_c", "o_custkey"], [True, False], k).to_pandas()
    total = int(
        lowcard_groupagg(
            per_cust.map_batches(
                lambda t: pa.table(
                    {"g": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                     "rev_c": t["rev_c"]}
                ),
                batch_format="pyarrow",
            ),
            ["g"], [("rev_c", "sum")], {"rev_c_sum": "s"},
        )
        .to_pandas()["s"]
        .iloc[0]
    )
    topk_c = int(top["rev_c"].sum())
    return rd.from_items(
        [{
            "topk_rev_c": topk_c,
            "total_rev_c": total,
            "topk_share": float(topk_c) / float(total),
        }]
    )


def order_status_census(sf_dir: str):
    """Status x priority census of the orders fact with exact-cent value
    totals — the low-cardinality two-key combine over columns
    (``o_orderstatus``) no other query exercises."""
    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "c": pa.array(c, pa.int64()),
            }
        )

    return lowcard_groupagg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        [([], "count_all"), ("c", "sum")],
        {"count_all": "n_orders", "c_sum": "total_c"},
    )


def hourly_error_rate(sf_dir: str):
    """Per-hour ERROR-RATE series: error events over total events per hour
    bucket — the conditional-ratio-per-group shape (a per-row IEEE division
    over two exact integer combiner sums), the SLO dashboard primitive."""
    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def cells(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        err = pc.cast(
            pc.equal(t["event_type"], pa.scalar("error")), pa.int64()
        )
        return pa.table({"hour": hour, "err": err})

    agg = lowcard_groupagg(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["hour"], [([], "count_all"), ("err", "sum")],
        {"count_all": "n_events", "err_sum": "n_errors"},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["n_errors"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "hour": pc.cast(t["hour"], pa.timestamp("us")),
                "n_events": pa.array(n, pa.int64()),
                "n_errors": pa.array(e, pa.int64()),
                "error_rate": pa.array(
                    e.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def winsorize_events(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """WINSORIZATION (robust preprocessing transform): clip every event's
    value to the corpus-wide [p01, p99] order statistics — outliers saturate
    instead of distorting downstream models.

    Two streaming passes: (1) the domain-bounded cent histogram of
    :func:`global_value_quantiles` yields the exact quantile_disc bounds
    (lower element at ceil(q*n) — identical to DuckDB), broadcast as two
    ints; (2) the clip is one vectorized ``np.clip`` on exact cents.
    Output: ``event_id, value_c, clipped_c, was_clipped``.
    """
    import math

    from ..functions.groupagg import highcard_groupagg

    def hist_block(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {"c": pa.array(u, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    hist = highcard_groupagg(
        _read(sf_dir, "events", ["value"]).map_batches(
            hist_block, batch_format="pyarrow"
        ),
        ["c"], [("n", "sum")], {"n_sum": "n"},
    )
    df = hist.to_pandas().sort_values("c").reset_index(drop=True)
    cum = df["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cents = df["c"].to_numpy()
    lo_c = int(cents[np.searchsorted(cum, max(1, math.ceil(lo_q * total)))])
    hi_c = int(cents[np.searchsorted(cum, max(1, math.ceil(hi_q * total)))])

    def clip(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        clipped = np.clip(c, lo_c, hi_c)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "value_c": pa.array(c, pa.int64()),
                "clipped_c": pa.array(clipped, pa.int64()),
                "was_clipped": pa.array(
                    (clipped != c).astype(np.int64), pa.int64()
                ),
            }
        )

    return _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        clip, batch_format="pyarrow"
    )


def brand_weighted_price(sf_dir: str):
    """WEIGHTED AVERAGE per group: the quantity-weighted mean unit price per
    part brand — the ``sum(w*x)/sum(w)`` aggregate family (plain means
    ignore lot sizes).  Broadcast brand dim, exact integer products
    (qty x cents) folded by the combiner pattern, one IEEE division chain
    per group — identical in SQL.
    """
    import ray

    from ..functions.groupagg import lowcard_groupagg

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brands = np.empty(int(part["p_partkey"].max()) + 1, dtype=object)
    brands[part["p_partkey"].to_numpy()] = part["p_brand"].to_numpy()
    bref = ray.put(brands)

    def cells(t: pa.Table) -> pa.Table:
        b = ray.get(bref)[t["l_partkey"].to_numpy(zero_copy_only=False)]
        qty = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "p_brand": pa.array(b.tolist(), pa.string()),
                "w": pa.array(qty, pa.int64()),
                "wx": pa.array(qty * price_c, pa.int64()),
            }
        )

    agg = lowcard_groupagg(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
            cells, batch_format="pyarrow"
        ),
        ["p_brand"], [("w", "sum"), ("wx", "sum")],
        {"w_sum": "total_qty", "wx_sum": "wx_c"},
    )

    def finish(t: pa.Table) -> pa.Table:
        w = t["total_qty"].to_numpy(zero_copy_only=False).astype(np.int64)
        wx = t["wx_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = (wx / 100.0) / w
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "total_qty": pa.array(w, pa.int64()),
                "wavg_price": pa.array(avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def forecast_revenue_q6(sf_dir: str, year: int = 1997, disc_c2: int = 6,
                        qty_lt: int = 24):
    """TPC-H Q6 shape — the pure SCAN + FILTER + GLOBAL AGG probe: revenue
    delta from discounts in ``year`` for small orders (discount within
    ±1 cent of ``disc_c2``, quantity < ``qty_lt``).  No join, no shuffle:
    per-block exact-integer partials (price and discount in cents, revenue
    in 1e-4 units) folded on the driver — the cheapest possible operator
    shape, and the storage-pruning showcase (4 of 11 lineitem columns
    leave the scan)."""
    import ray.data as rd

    items = _read(
        sf_dir, "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        price = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (
            (sd >= lo) & (sd < hi)
            & (disc >= disc_c2 - 1) & (disc <= disc_c2 + 1)
            & (qty < qty_lt)
        )
        rev = price[keep] * disc[keep]
        return pa.table(
            {
                "rev_c4": pa.array([int(rev.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    sums = items.map_batches(partial, batch_format="pyarrow").to_pandas()
    return rd.from_items(
        [
            {
                "revenue_c4": int(sums["rev_c4"].sum()),
                "n_items": int(sums["n"].sum()),
            }
        ]
    )


def user_event_entropy(sf_dir: str, num_partitions: int | None = None):
    """Per-user SHANNON ENTROPY of the event-type distribution — the
    behavioral-diversity score a bot/spam filter thresholds on (uniform
    users score ln(n_types); single-action bots score 0).

    Map-side combine first: per-block (user, event_type) counts collapse
    the fact table to bounded partials BEFORE the one user-keyed shuffle;
    the final block computes H = ln(n) - sum(c*ln c)/n from exact integer
    counts per user (same algebraic form as the SQL oracle so the float
    matches at the 9-significant-digit gate)."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    events = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = key_partitioned(
        events.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], num_partitions,
    )

    def block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()),
             ("n_types", pa.int64()), ("entropy", pa.float64())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "c": t["c"].to_numpy(zero_copy_only=False),
            }
        )
        # blocks may still hold partials of the same (user, type) from
        # different map blocks: combine exactly before the entropy
        cc = df.groupby(["user_id", "event_type"], sort=False)["c"].sum()
        per = cc.groupby(level=0, sort=False)
        n = per.sum()
        clnc = (cc * np.log(cc)).groupby(level=0, sort=False).sum()
        # rounded to 8 decimals on BOTH sides: last-ulp summation noise
        # must not flip the order-insensitive hash's row sort on ties
        ent = np.round(np.log(n) - clnc / n, 8)
        return pa.table(
            {
                "user_id": pa.array(n.index.to_numpy(), pa.int64()),
                "n_events": pa.array(n.to_numpy(), pa.int64()),
                "n_types": pa.array(per.size().to_numpy(), pa.int64()),
                "entropy": pa.array(ent.to_numpy(), pa.float64()),
            },
            schema=schema,
        )

    return parts.map_batches(block, batch_format="pyarrow", batch_size=None)


def orders_cohort_retention(sf_dir: str, num_partitions: int | None = None):
    """CUSTOMER COHORT-RETENTION matrix over orders — the classic
    month-cohort census: customers grouped by FIRST-order month, counted as
    retained in every later month they order again.  Output: ``cohort_month,
    month_offset, n_customers`` (offset 0 row = cohort size).

    Shape: one customer-keyed partition; the per-block kernel derives each
    customer's first month and distinct (customer, offset) pairs with
    C-level pandas ops; the bounded (cohort, offset) partials fold through
    the small combiner.  The fact table is pruned to two columns at the
    read and never shuffled twice."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        month = d.astype("datetime64[M]").astype(np.int64)  # months since epoch
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "month": pa.array(month, pa.int64()),
            }
        )

    parts = key_partitioned(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"], num_partitions,
    )

    schema = pa.schema(
        [("cohort", pa.int64()), ("offset", pa.int64()), ("n", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        df = pd.DataFrame(
            {
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False),
                "month": t["month"].to_numpy(zero_copy_only=False),
            }
        )
        first = df.groupby("cust", sort=False)["month"].transform("min")
        df["cohort"] = first
        df["offset"] = df["month"] - first
        pairs = df[["cust", "cohort", "offset"]].drop_duplicates()
        g = pairs.groupby(["cohort", "offset"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {
                "cohort": pa.array(idx["cohort"].to_numpy(), pa.int64()),
                "offset": pa.array(idx["offset"].to_numpy(), pa.int64()),
                "n": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            },
            schema=schema,
        )

    agg = lowcard_groupagg(
        parts.map_batches(block, batch_format="pyarrow", batch_size=None),
        ["cohort", "offset"], [("n", "sum")], {"n_sum": "n_customers"},
    )

    def finish(t: pa.Table) -> pa.Table:
        # months-since-epoch back to a first-of-month date for readability
        m = t["cohort"].to_numpy(zero_copy_only=False)
        dates = m.astype("datetime64[M]").astype("datetime64[us]")
        return pa.table(
            {
                "cohort_month": pa.array(dates),
                "month_offset": pc.cast(t["offset"], pa.int64()),
                "n_customers": pc.cast(t["n_customers"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def supplier_distinct_parts(sf_dir: str, num_partitions: int | None = None):
    """FACT-SCALE grouped COUNT(DISTINCT): distinct parts ever shipped per
    supplier — the Q16-family primitive at lineitem scale rather than over a
    dimension.  Per-block (suppkey, partkey) dedup FIRST (bounded partials:
    repeat purchases collapse map-side), ONE supplier-keyed partition, then
    an in-block pandas nunique.  Output: ``s_suppkey, n_parts, n_lines``."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    items = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_suppkey", "l_partkey"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "l_suppkey": pc.cast(g["l_suppkey"], pa.int64()),
                "l_partkey": pc.cast(g["l_partkey"], pa.int64()),
                "n_lines": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = key_partitioned(
        items.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"], num_partitions,
    )

    schema = pa.schema(
        [("s_suppkey", pa.int64()), ("n_parts", pa.int64()),
         ("n_lines", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        df = pd.DataFrame(
            {
                "s": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "p": t["l_partkey"].to_numpy(zero_copy_only=False),
                "n": t["n_lines"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("s", sort=False).agg(
            n_parts=("p", "nunique"), n_lines=("n", "sum")
        )
        return pa.table(
            {
                "s_suppkey": pa.array(g.index.to_numpy(), pa.int64()),
                "n_parts": pa.array(g["n_parts"].to_numpy(), pa.int64()),
                "n_lines": pa.array(g["n_lines"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    return parts.map_batches(block, batch_format="pyarrow", batch_size=None)


def customer_spend_deciles(sf_dir: str, num_partitions: int | None = None):
    """Deciles OF AGGREGATES: exact global order statistics over PER-CUSTOMER
    lifetime spend — the two-level shape (aggregate, then rank the
    aggregates) behind every "top-decile customers" cut.  Spend folds to
    exact cents via the keyed-shuffle group sum; the decile bounds come from
    the domain-bounded cent histogram (the :func:`winsorize_events`
    discipline — a merge of per-block value histograms, never a global
    sort), picked at DuckDB ``quantile_disc`` rank ceil(q*n).  Output:
    ``decile (1..9), spend_c`` in cents."""
    import math

    from ..functions.groupagg import highcard_groupagg

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
             "spend_c": pa.array(cents, pa.int64())}
        )

    per_cust = highcard_groupagg(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"], [("spend_c", "sum")], {"spend_c_sum": "spend_c"},
        num_partitions=num_partitions,
    )

    def hist_block(t: pa.Table) -> pa.Table:
        u, n = np.unique(
            t["spend_c"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"c": pa.array(u, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    hist = highcard_groupagg(
        per_cust.map_batches(hist_block, batch_format="pyarrow"),
        ["c"], [("n", "sum")], {"n_sum": "n"},
    ).to_pandas().sort_values("c").reset_index(drop=True)
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cents = hist["c"].to_numpy()
    rows = []
    for d in range(1, 10):
        rank = max(1, math.ceil(d / 10 * total))
        rows.append((d, int(cents[np.searchsorted(cum, rank)])))
    return pa.table(
        {
            "decile": pa.array([r[0] for r in rows], pa.int64()),
            "spend_c": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def debounce_events(sf_dir: str, window_s: int = 60):
    """Streaming DEBOUNCE dedup: an event is KEPT unless the previous event
    with the same ``(user_id, event_type)`` key is within ``window_s``
    seconds — the telemetry retry/double-fire suppressor every event
    pipeline runs before sessionization.  Same lag-window discipline as
    :func:`user_event_gaps`: one keyed hash-partition on user_id (the
    coarser key keeps all of a user's types co-located for free), then a
    fully vectorized block kernel — one mergesort over (user, type, ts,
    event_id), one ``np.diff`` masked at key boundaries.  Output per
    event_type: ``event_type, n_total, n_kept``."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_total", pa.int64()),
         ("n_kept", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        df = df.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.diff(ts)
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        drop = np.zeros(len(df), dtype=bool)
        drop[1:] = same & (gap <= window_s * 1_000_000)
        out = (
            pd.DataFrame({"event_type": et, "kept": ~drop})
            .groupby("event_type", sort=True)["kept"]
            .agg(n_total="size", n_kept="sum")
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "n_total": pa.array(out["n_total"].to_numpy(), pa.int64()),
                "n_kept": pa.array(
                    out["n_kept"].to_numpy().astype(np.int64), pa.int64()
                ),
            },
            schema=out_schema,
        )

    from ..functions.groupagg import lowcard_groupagg

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    parts = key_partitioned(ds, ["user_id"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )
    return lowcard_groupagg(
        parts, ["event_type"],
        [("n_total", "sum"), ("n_kept", "sum")],
        {"n_total_sum": "n_total", "n_kept_sum": "n_kept"},
    )


def fk_violations(sf_dir: str):
    """Referential-integrity AUDIT over the star schema in one pass per fact
    table: counts of fact rows whose foreign key has no parent row — the
    pre-flight data-quality gate every warehouse load runs.  Each parent key
    set is built OFF-DRIVER (``distinct_values_ref`` tree merge, dimension-
    sized) and applied as one inverted ``pc.is_in`` per fact block with
    per-block partial counts; the fact tables stream, nothing shuffles.
    Output: ``fact, fk, n_rows, n_orphans``."""
    import ray

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import distinct_values_ref

    checks = [
        # (fact table, fk column, parent table, parent key)
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]

    partials = []
    for fact, fk, parent, pk in checks:
        ids_ref, _n = distinct_values_ref(_read(sf_dir, parent, [pk]), [pk])

        def count_block(t: pa.Table, _fact=fact, _fk=fk, _ids=ids_ref) -> pa.Table:
            ids = ray.get(_ids) if isinstance(_ids, ray.ObjectRef) else _ids
            ok = pc.is_in(t[_fk], value_set=ids)
            n_orph = int(t.num_rows - pc.sum(pc.cast(ok, pa.int64())).as_py())
            return pa.table(
                {
                    "fact": pa.array([_fact], pa.string()),
                    "fk": pa.array([_fk], pa.string()),
                    "n_rows": pa.array([t.num_rows], pa.int64()),
                    "n_orphans": pa.array([n_orph], pa.int64()),
                }
            )

        partials.append(
            _read(sf_dir, fact, [fk]).map_batches(
                count_block, batch_format="pyarrow"
            )
        )

    uni = partials[0]
    for p in partials[1:]:
        uni = uni.union(p)
    return lowcard_groupagg(
        uni, ["fact", "fk"],
        [("n_rows", "sum"), ("n_orphans", "sum")],
        {"n_rows_sum": "n_rows", "n_orphans_sum": "n_orphans"},
    )


def _skyline_block(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Indices of the 2-D Pareto front (maximize both) of one block.

    Row r is dominated iff some row s has s >= r on both axes and s > r on at
    least one.  Kernel: sort by (price desc, date desc); within an equal-price
    group only max-date rows survive (dominated by a same-price strictly-later
    row otherwise); across groups a row survives iff its date strictly exceeds
    the running date max of all STRICTLY higher-price groups (>= there means a
    higher-price row covers it).  O(n log n), no Python loop over rows.
    """
    if len(price) == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((-date, -price))
    p_s, d_s = price[order], date[order]
    # group boundaries over equal price (sorted desc)
    new_grp = np.empty(len(p_s), bool)
    new_grp[0] = True
    new_grp[1:] = p_s[1:] != p_s[:-1]
    grp = np.cumsum(new_grp) - 1
    # max date within each group = first element of the group (date desc)
    grp_max = d_s[new_grp]
    # running max of group-max dates over strictly-higher-price groups
    prev_max = np.empty(len(grp_max), d_s.dtype)
    prev_max[0] = np.iinfo(np.int64).min if d_s.dtype.kind in "iu" else -np.inf
    if len(grp_max) > 1:
        np.maximum.accumulate(grp_max[:-1], out=prev_max[1:])
    keep_sorted = (d_s == grp_max[grp]) & (d_s > prev_max[grp])
    return order[keep_sorted]


def skyline_orders(sf_dir: str):
    """Pareto-front (skyline) query over orders: rows not dominated on
    (o_totalprice, o_orderdate) — "largest and most recent" orders no other
    order beats on both axes.  The distributed shape scales because the
    skyline operator is IDEMPOTENT and CLOSED under union: per-block local
    skylines (each a tiny fraction of the block) stream as partials, and one
    final pass over their union — bounded by sum of local skyline sizes, not
    the table — applies the identical kernel.  Any globally-dominated row is
    dominated by some global-skyline row, which by transitivity survives its
    own local pass, so the merge loses nothing."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        date = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        return t.take(pa.array(_skyline_block(price, date)))

    partials = ds.map_batches(local, batch_format="pyarrow")
    # union of local skylines is small — one block, same kernel, exact result
    return partials.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )


def top_event_days(sf_dir: str, k: int = 3):
    """Grouped top-k WITH TIES (rank() <= k semantics) — the operator-family
    gap next to ``grouped_topk_events``'s row_number semantics: all rows
    tying the k-th value survive, so the output is deterministic without a
    tie-break column.  Here: for each event_type, the k busiest calendar
    days by event count.

    Plan: one map-side-combined (event_type, day) count — the exchange is
    bounded by |types| x |days|, not the event stream — then a vectorized
    block-local ties filter per type (keep rows whose count >= the k-th
    largest count, which is exactly rank() <= k since rank = 1 + #strictly
    greater)."""
    from ..state.partitioning import key_partitioned

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
        return pa.table({"event_type": t["event_type"], "day": day})

    counts = lowcard_groupagg(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["event_type", "day"], [([], "count_all")], {"count_all": "n"},
    )

    def ties_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                }
            )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        # sort by (type, count desc); per-segment k-th value is the threshold
        order = np.lexsort((-n, et))
        et_s, n_s = et[order], n[order]
        starts = np.flatnonzero(
            np.concatenate([[True], et_s[1:] != et_s[:-1]])
        )
        seg_len = np.diff(np.concatenate([starts, [len(et_s)]]))
        kth_idx = np.minimum(starts + k - 1, starts + seg_len - 1)
        thresh = np.repeat(n_s[kth_idx], seg_len)
        keep = order[n_s >= thresh]
        return t.take(pa.array(keep))

    return key_partitioned(counts, ["event_type"]).map_batches(
        ties_topk, batch_format="pyarrow", batch_size=None
    )


def order_fulfillment_recon(sf_dir: str, num_partitions: int | None = None):
    """Fact-to-fact RECONCILIATION AUDIT — the anti-entropy check between two
    independently-produced tables (billing vs fulfillment): for each order
    status, how many orders have any lineitems at all, how many bill-match
    exactly, and the total absolute value drift.  All arithmetic is in
    integer 1e-4 currency units (price-cents x (100 - discount-cents)), so
    both sides compare identical integers — no float-boundary risk.

    Plan: the lineitem side collapses FIRST to one row per order (map-side
    keyed combine; the join input is |orders|-bounded, not |lineitem|), then
    the generic skew-salted hash join (``stages/skewjoin.salted_join``)
    attaches order headers, and a low-cardinality combine rolls up per
    status.  LEFT-side semantics (orders with zero lineitems) ride a
    zero-fill union keyed off the join's orderkey set."""
    import ray

    from ..functions.groupagg import highcard_groupagg
    from ..stages.skewjoin import salted_join
    from ..state.partitioning import distinct_values_ref, materialize_clean

    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_e4": pa.array(
                    np.round(
                        t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64)
                    * (100 - np.round(
                        t["l_discount"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64)),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    per_order = materialize_clean(
        highcard_groupagg(
            items, ["l_orderkey"], [("rev_e4", "sum")],
            {"rev_e4_sum": "line_rev_e4"}, num_partitions=num_partitions,
        )
    )

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderstatus": t["o_orderstatus"],
                "total_e4": pa.array(
                    np.round(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 10000
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    orders = materialize_clean(orders)

    joined = salted_join(
        orders, per_order, "o_orderkey", right_key="l_orderkey",
        num_partitions=num_partitions,
    )

    def rollup(t: pa.Table) -> pa.Table:
        delta = np.abs(
            t["total_e4"].to_numpy(zero_copy_only=False)
            - t["line_rev_e4"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "matched": pa.array((delta == 0).astype(np.int64), pa.int64()),
                "abs_delta_e4": pa.array(delta, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    with_lines = lowcard_groupagg(
        joined.map_batches(rollup, batch_format="pyarrow"),
        ["o_orderstatus"],
        [("one", "sum"), ("matched", "sum"), ("abs_delta_e4", "sum")],
        {"one_sum": "n_with_lines", "matched_sum": "n_value_match",
         "abs_delta_e4_sum": "sum_abs_delta_e4"},
    )

    # orders with NO lineitems: anti-filter by the joined orderkey set
    keys_ref, _n = distinct_values_ref(per_order, ["l_orderkey"])

    def orphan_rows(t: pa.Table) -> pa.Table:
        ids = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        has = pc.is_in(t["o_orderkey"], value_set=ids)
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "miss": pa.array(
                    (~has.to_numpy(zero_copy_only=False)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    totals = lowcard_groupagg(
        orders.map_batches(orphan_rows, batch_format="pyarrow"),
        ["o_orderstatus"],
        [([], "count_all"), ("miss", "sum")],
        {"count_all": "n_orders", "miss_sum": "n_no_lines"},
    ).to_pandas().set_index("o_orderstatus")

    def attach_totals(t: pa.Table) -> pa.Table:
        st = t["o_orderstatus"].to_pylist()
        return t.append_column(
            "n_orders",
            pa.array([int(totals.loc[s, "n_orders"]) for s in st], pa.int64()),
        ).append_column(
            "n_no_lines",
            pa.array([int(totals.loc[s, "n_no_lines"]) for s in st], pa.int64()),
        )

    return with_lines.map_batches(attach_totals, batch_format="pyarrow")


def nation_profit(sf_dir: str, name_token: str = "widget",
                  num_partitions: int | None = None):
    """TPC-H Q9 shape — PRODUCT-LINE PROFIT by (supplier nation, order
    year) for parts whose name contains a token: the widest join pipeline in
    the relational family (lineitem x part x supplier x nation x orders).

    Scale plan: the three dimension sides (part filter + retail price,
    supplier -> nation name) broadcast as dense LUTs applied inside ONE
    lineitem pass — no dimension shuffle; the only exchange is the
    fact-fact orderkey join against an orders side already reduced to
    (orderkey, year).  Profit folds as exact integer 1e-4 units
    (price-cents x (100-disc) - retail-cents x 100 x qty), so the rollup
    hash-matches SQL."""
    from ..state.partitioning import resolve_partitions
    num_partitions = resolve_partitions(num_partitions)
    import ray
    import ray.data as rd

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import materialize_clean

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    sel = part["p_name"].str.contains(name_token, regex=False)
    max_pk = int(part["p_partkey"].max())
    retail_c = np.full(max_pk + 1, -1, np.int64)  # -1 = not selected
    pk = part.loc[sel, "p_partkey"].to_numpy()
    retail_c[pk] = np.round(part.loc[sel, "p_retailprice"].to_numpy() * 100).astype(np.int64)

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    s_nation = np.empty(int(supplier["s_suppkey"].max()) + 1, dtype=object)
    s_nation[supplier["s_suppkey"].to_numpy()] = [
        nk_name[k] for k in supplier["s_nationkey"]
    ]
    luts_ref = ray.put((retail_c, s_nation))

    def li_side(t: pa.Table) -> pa.Table:
        retail, snat = ray.get(luts_ref)
        pkv = t["l_partkey"].to_numpy(zero_copy_only=False)
        rc = retail[pkv]
        keep = rc >= 0
        t = t.filter(pa.array(keep))
        rc = rc[keep]
        price_c = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        profit = price_c * (100 - disc_c) - rc * 100 * qty
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "n_name": pa.array(
                    snat[t["l_suppkey"].to_numpy(zero_copy_only=False)].tolist(),
                    pa.string(),
                ),
                "profit_c4": pa.array(profit, pa.int64()),
            }
        )

    li = materialize_clean(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        ).map_batches(li_side, batch_format="pyarrow")
    )

    orders = materialize_clean(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    out_schema = pa.schema(
        [("n_name", pa.string()), ("o_year", pa.int64()),
         ("profit_c4", pa.int64())]
    )
    if li.count() == 0:
        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return lowcard_groupagg(
        joined.select_columns(["n_name", "o_year", "profit_c4"]),
        ["n_name", "o_year"],
        [("profit_c4", "sum")],
        {"profit_c4_sum": "profit_c4"},
    )


def customer_rfm_scores(sf_dir: str, num_partitions: int | None = None):
    """RFM SEGMENTATION — the classic customer-analytics cut: per customer,
    quartile scores of Recency (last order date), Frequency (order count)
    and Monetary (lifetime spend), plus the composed ``rfm`` code
    (``100*r + 10*f + m``).  Score rule is boundary-based and total-order
    deterministic (``1 + #quartile-boundaries strictly below the value``
    with DuckDB ``quantile_disc`` boundaries at rank ceil(q*n)) — no
    ntile() positional tie ambiguity, so the output hash-matches SQL.

    Distributed shape: ONE keyed combine produces the per-customer triple
    (the only corpus-sized exchange); each metric's quartile boundaries
    come from a domain-bounded value histogram (the
    :func:`customer_spend_deciles` discipline — merged per-block
    histograms, never a global sort); the 9 boundary scalars broadcast
    into a final streamed scoring pass."""
    import math

    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import materialize_clean

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ts = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "spend_c": pa.array(cents, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    per_cust = materialize_clean(
        highcard_groupagg(
            orders.map_batches(prep, batch_format="pyarrow"),
            ["o_custkey"],
            [("spend_c", "sum"), ("ts", "max"), ("one", "sum")],
            {"spend_c_sum": "m", "ts_max": "r", "one_sum": "f"},
            num_partitions=num_partitions,
        )
    )

    # ONE histogram pass for all three metrics: per block, melt to
    # (metric, v, n) partials; one keyed combine; driver splits — 1 shuffle
    # instead of 3
    def hist_block(t: pa.Table) -> pa.Table:
        ms, vs, ns = [], [], []
        for col in ("r", "f", "m"):
            u, n = np.unique(
                t[col].to_numpy(zero_copy_only=False), return_counts=True
            )
            ms.append(np.repeat(np.array([col], object), len(u)))
            vs.append(u)
            ns.append(n)
        return pa.table(
            {
                "metric": pa.array(np.concatenate(ms), pa.string()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    hists = highcard_groupagg(
        per_cust.map_batches(hist_block, batch_format="pyarrow"),
        ["metric", "v"], [("n", "sum")], {"n_sum": "n"},
    ).to_pandas()

    def quartiles(col: str) -> list[int]:
        hist = (
            hists[hists["metric"] == col]
            .sort_values("v").reset_index(drop=True)
        )
        cum = hist["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = hist["v"].to_numpy()
        return [
            int(vals[np.searchsorted(cum, max(1, math.ceil(q * total)))])
            for q in (0.25, 0.5, 0.75)
        ]

    import ray

    bounds_ref = ray.put({c: quartiles(c) for c in ("r", "f", "m")})

    def score(t: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        out = {"o_custkey": t["o_custkey"]}
        scores = {}
        for c in ("r", "f", "m"):
            v = t[c].to_numpy(zero_copy_only=False)
            s = np.ones(len(v), np.int64)
            for b in bounds[c]:
                s += (v > b).astype(np.int64)
            scores[c] = s
            out[f"{c}_score"] = pa.array(s, pa.int64())
        out["rfm"] = pa.array(
            100 * scores["r"] + 10 * scores["f"] + scores["m"], pa.int64()
        )
        return pa.table(out)

    return per_cust.map_batches(score, batch_format="pyarrow")


def _daily_revenue_cents(sf_dir: str):
    """Per-day order revenue in exact cents via map-side combine, collected
    as a pandas frame (bounded by |days|) — shared by the anomaly and EWMA
    series so the cents/day derivation exists exactly once."""
    from ..functions.groupagg import lowcard_groupagg

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"),
                      pa.timestamp("us"))
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"day": day, "rev_c": pa.array(cents, pa.int64())})

    return lowcard_groupagg(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["day"], [("rev_c", "sum")], {"rev_c_sum": "rev_c"},
    ).to_pandas()


def daily_revenue_anomaly(sf_dir: str):
    """ANOMALY SCREEN over an aggregate series: z-score of each day's order
    revenue against the corpus-wide mean/std of daily revenues, flagging
    |z| >= 2 days — the ops-dashboard "did something spike" question.

    Two bounded passes: daily revenue folds via map-side combine (exchange
    bounded by |days|); mean/std come from exact integer sums and
    sum-of-squares over that small table, so the only floats are the final
    mu/sigma/z divisions — the IDENTICAL IEEE expressions the SQL oracle
    evaluates (population std; both sides round z to 8)."""
    daily = _daily_revenue_cents(sf_dir)

    rev = daily["rev_c"].to_numpy().astype(np.int64)
    n = len(rev)
    s1 = int(rev.sum())
    s2 = int((rev.astype(object) ** 2).sum())  # exact big-int sum of squares
    mu = s1 / n
    var = s2 / n - mu * mu
    sd = float(np.sqrt(var))
    z = np.round((rev - mu) / sd, 8)
    out = pa.table(
        {
            "day": pa.array(
                daily["day"].to_numpy().astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "rev_c": pa.array(rev, pa.int64()),
            "z": pa.array(z, pa.float64()),
            "is_anomaly": pa.array(np.abs(z) >= 2.0),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)


def price_band_stats(sf_dir: str):
    """Non-equi BAND JOIN: every lineitem lands in a static price band
    (``lo <= price_c < hi``) via one vectorized ``searchsorted`` against the
    broadcast band table — the theta-join shape (range-table lookup) that
    equi-join machinery cannot express.  Output per band: row count and
    exact revenue cents."""
    from ..functions.groupagg import lowcard_groupagg

    # band boundaries in cents: [0, 1k), [1k, 2k), [2k, 5k), [5k, 10k), [10k, inf)
    LO = np.array([0, 100_000, 200_000, 500_000, 1_000_000], np.int64)
    NAMES = ["lt_1k", "1k_2k", "2k_5k", "5k_10k", "ge_10k"]

    items = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def to_band(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        idx = np.searchsorted(LO, cents, side="right") - 1
        names = np.array(NAMES, dtype=object)[idx]
        return pa.table(
            {
                "band": pa.array(names, pa.string()),
                "rev_c": pa.array(cents, pa.int64()),
            }
        )

    return lowcard_groupagg(
        items.map_batches(to_band, batch_format="pyarrow"),
        ["band"], [([], "count_all"), ("rev_c", "sum")],
        {"count_all": "n_items", "rev_c_sum": "revenue_c"},
    )


def daily_revenue_ewma(sf_dir: str, alpha: float = 0.2):
    """EWMA SMOOTHING over an aggregate series — the recursive-window shape
    (each value depends on the previous OUTPUT, not a fixed frame) that
    frame-based window functions cannot express: ``e_1 = x_1; e_t =
    alpha*x_t + (1-alpha)*e_{t-1}`` over daily order revenue.

    Distributed part: the daily series folds via map-side combine (exchange
    bounded by |days|); the recurrence itself is inherently sequential and
    runs over the collected day series (thousands of rows for years of
    data — the documented driver-side term).  The SQL oracle replays the
    IDENTICAL recurrence through a recursive CTE, one join step per day,
    same float64 expression ``alpha*x + (1-alpha)*e`` per step (the CAST to
    DOUBLE in the oracle matters: bare ``0.2 * BIGINT`` is exact DECIMAL
    arithmetic in DuckDB and diverges at the 8th decimal).  The smoothed
    value is emitted as INTEGER CENTS via the identical ``floor(e*100 +
    0.5)`` expression on both sides — engine/DuckDB ``round()`` internals
    differ in the last ulp at 1e15 scale, a floor of the same double does
    not."""
    daily = _daily_revenue_cents(sf_dir).sort_values("day").reset_index(drop=True)
    x = daily["rev_c"].to_numpy().astype(np.float64)
    e = np.empty(len(x), np.float64)
    if len(x):
        e[0] = x[0]
        for t_ in range(1, len(x)):  # bounded by |days|, not the fact table
            e[t_] = alpha * x[t_] + (1.0 - alpha) * e[t_ - 1]
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(
                    daily["day"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "rev_c": pa.array(daily["rev_c"].to_numpy(), pa.int64()),
                "ewma_c": pa.array(
                    np.floor(e * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )
    )


def distinct_kmv_events(sf_dir: str, k: int = 64):
    """KMV (k-minimum-values) DISTINCT-COUNT sketch per event type — the
    SQL-CHECKABLE member of the sketch family (next to the rows-only
    HyperLogLog in :func:`distinct_stats_hll`): hash every user_id with the
    md5-low64 basis (bit-identical to DuckDB ``md5_number_lower``), keep
    the ``k`` smallest distinct hash values per group, and estimate
    ``n_distinct ~= (k-1) / h_(k)`` with hashes normalized to [0,1); groups
    holding fewer than ``k`` distinct hashes report their exact count.

    Mergeability IS the distributed story: each block emits its local
    k-minima (bounded k rows per group per block), and the k-minima of the
    per-group union are the global k-minima — one low-cardinality combine,
    no full distinct set ever materializes (contrast
    ``state/partitioning.distinct_values_ref``, which must hold the value
    universe).  Output: ``event_type, est_distinct`` (round 4 — a single
    IEEE division of a normalized uint64, identical in SQL)."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..sources.io import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    part_schema = pa.schema([("event_type", pa.string()), ("h", pa.uint64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        rows_t: list[str] = []
        rows_h: list[int] = []
        for et, g in df.groupby("event_type", sort=False):
            hs = np.unique(
                np.array(
                    [md5_low64(str(u)) for u in pd.unique(g["user_id"])],
                    dtype=np.uint64,
                )
            )[:k]
            rows_t.extend([et] * len(hs))
            rows_h.extend(hs.tolist())
        return pa.table(
            {
                "event_type": pa.array(rows_t, pa.string()),
                "h": pa.array(np.array(rows_h, dtype=np.uint64), pa.uint64()),
            },
            schema=part_schema,
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()

    out_t, out_est = [], []
    for et, g in parts.groupby("event_type", sort=True):
        hs = np.unique(g["h"].to_numpy(dtype=np.uint64))[:k]
        if len(hs) < k:
            est = float(len(hs))
        else:
            est = (k - 1) / (float(hs[-1]) / 18446744073709551616.0)
        out_t.append(et)
        out_est.append(round(est, 4))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "est_distinct": pa.array(out_est, pa.float64()),
        }
    )


def event_gap_ks(sf_dir: str):
    """DISTRIBUTION-FIT DIAGNOSTIC per event type: the exponential MLE rate
    of the inter-arrival gaps plus the Kolmogorov-Smirnov distance between
    the empirical gap CDF and ``1 - exp(-rate * gap)`` — the
    arrival-process health check ("is this stream still Poisson, or did a
    bot change its clock?").

    KS with ties is computed the standard order-stat way, ``D = max_i
    max(i/n - F_i, F_i - (i-1)/n)`` — provably independent of how ties are
    ranked, so the engine's lexsorted positions and the oracle's arbitrary
    ``row_number`` tie order agree exactly.  One type-keyed partition;
    gaps, rate and D are all vectorized in-block (grouped order-stat
    pattern, cf. ``source_length_deciles``).  Output: ``event_type,
    n_gaps, rate_per_s, ks_d`` (round 8)."""
    from ..sources.io import read_parquet_clean
    from ..state.partitioning import key_partitioned

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id"])

    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_gaps", pa.int64()),
         ("rate_per_s", pa.float64()), ("ks_d", pa.float64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        types = t["event_type"].to_pandas().to_numpy()
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        out_t, out_n, out_r, out_d = [], [], [], []
        for et in np.unique(types):
            sel = types == et
            order = np.lexsort((eid[sel], us[sel]))
            ts_sorted = us[sel][order]
            gaps = np.diff(ts_sorted).astype(np.float64)
            n = len(gaps)
            if n == 0 or gaps.sum() == 0:
                continue
            rate = float(n) / (gaps.sum() / 1000000.0)
            g = np.sort(gaps)
            f = 1.0 - np.exp(-rate * (g / 1000000.0))
            i = np.arange(1, n + 1, dtype=np.float64)
            d = max((i / n - f).max(), (f - (i - 1.0) / n).max())
            out_t.append(str(et))
            out_n.append(n)
            out_r.append(round(rate, 8))
            out_d.append(round(float(d), 8))
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "n_gaps": pa.array(out_n, pa.int64()),
                "rate_per_s": pa.array(out_r, pa.float64()),
                "ks_d": pa.array(out_d, pa.float64()),
            },
            schema=out_schema,
        )

    return key_partitioned(ev, ["event_type"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def brand_basket_lift(sf_dir: str, min_pair_orders: int = 5):
    """MARKET-BASKET ASSOCIATION between part brands — which brand pairs
    co-occur in the same order more than independence predicts:
    ``lift(a,b) = (n_ab * N) / (n_a * n_b)`` over DISTINCT per-order brand
    sets, with ``support = n_ab / N`` — the association-rule primitive
    (brands are the bounded dimension, so every count table is tiny).

    Distributed shape: the part->brand dimension broadcasts once as a
    dense LUT (the ``nation_profit`` pattern); lineitem reduces in ONE
    streamed pass to per-block (order, brand) partial sets, one order-keyed
    partition dedups sets exactly, and pair/single counts come back as
    bounded low-cardinality partials (<= 25 brands -> <= 300 pair rows per
    block).  All counts integer-exact; lift/support are two IEEE ops
    written identically in the SQL oracle.  Output: ``brand_a, brand_b,
    n_ab, support, lift`` for pairs in >= ``min_pair_orders`` orders
    (round 8)."""
    import itertools

    import pandas as pd
    import ray

    from ..state.partitioning import key_partitioned

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_lut_ref = ray.put(
        dict(zip(part["p_partkey"].to_numpy(), part["p_brand"].to_numpy()))
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def to_brand(batch: pa.Table) -> pa.Table:
        lut = ray.get(brand_lut_ref)
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "brand": pd.Series(
                    batch["l_partkey"].to_numpy(zero_copy_only=False)
                ).map(lut),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "l_orderkey": pa.array(df["l_orderkey"].to_numpy(), pa.int64()),
                "brand": pa.array(df["brand"].tolist(), pa.string()),
            }
        )

    ob = key_partitioned(
        li.map_batches(to_brand, batch_format="pyarrow"), ["l_orderkey"]
    )

    part_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("c", pa.int64())]
    )

    def pair_partial(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates()  # exact per-order brand sets (co-located)
        singles: dict[str, int] = {}
        pairs: dict[tuple, int] = {}
        n_orders = 0
        for _, g in df.groupby("l_orderkey", sort=False):
            bs = sorted(g["brand"].tolist())
            n_orders += 1
            for x in bs:
                singles[x] = singles.get(x, 0) + 1
            for x, y in itertools.combinations(bs, 2):
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
        rows_a = ["__N__"] + list(singles) + [p[0] for p in pairs]
        rows_b = [""] + [""] * len(singles) + [p[1] for p in pairs]
        rows_c = [n_orders] + list(singles.values()) + list(pairs.values())
        return pa.table(
            {
                "a": pa.array(rows_a, pa.string()),
                "b": pa.array(rows_b, pa.string()),
                "c": pa.array(np.array(rows_c, np.int64), pa.int64()),
            },
            schema=part_schema,
        )

    parts = (
        ob.map_batches(pair_partial, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    agg = parts.groupby(["a", "b"], sort=True)["c"].sum()
    n_total = float(agg.get(("__N__", ""), 0))
    singles = {k[0]: float(v) for k, v in agg.items() if k[1] == "" and k[0] != "__N__"}
    out_a, out_b, out_n, out_s, out_l = [], [], [], [], []
    for (a, b), c in agg.items():
        if b == "" or c < min_pair_orders:
            continue
        support = float(c) / n_total
        lift = (float(c) * n_total) / (singles[a] * singles[b])
        out_a.append(a)
        out_b.append(b)
        out_n.append(int(c))
        out_s.append(round(support, 8))
        out_l.append(round(lift, 8))
    return pa.table(
        {
            "brand_a": pa.array(out_a, pa.string()),
            "brand_b": pa.array(out_b, pa.string()),
            "n_ab": pa.array(out_n, pa.int64()),
            "support": pa.array(out_s, pa.float64()),
            "lift": pa.array(out_l, pa.float64()),
        }
    )


def customer_survival_km(sf_dir: str, churn_days: int = 90):
    """KAPLAN-MEIER SURVIVAL CURVE of customer lifetime — the retention
    curve with proper right-censoring: a customer's lifetime is the span
    between first and last order; customers whose last order is within
    ``churn_days`` of the dataset's end are CENSORED (still alive), the
    rest are churn events.  ``S(t) = prod_{t_i <= t} (1 - d_i / n_i)``
    over distinct event times, with the at-risk set counting censored
    customers — the estimator a growth team reads retention from.

    Parity: both sides evaluate the product as ``exp(cumsum(ln(1 - d/n)))``
    in ascending-time order (identical op sequence; ln/exp last-ulp covered
    by round-8); ``d/n`` are exact integer divisions.  The terminal
    full-die-out row (d = n, S = 0, nothing after it) is omitted on both
    sides — DuckDB's ``ln(0)`` errors and the row carries no information.

    Distributed shape: per-customer (first, last) via one customer-keyed
    count fold; the event series is a bounded (t, n_t, d_t) count table
    (distinct lifetimes, not customers) folded from per-block partials.
    Output: ``t_days, n_risk, d, s_km`` (round 8) for death times."""
    import pandas as pd

    from ..functions.groupagg import highcard_groupagg

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    span = highcard_groupagg(
        orders, ["o_custkey"],
        [("o_orderdate", "min"), ("o_orderdate", "max")],
        {"o_orderdate_min": "first_d", "o_orderdate_max": "last_d"},
    ).materialize()
    max_date = span.max("last_d")

    part_schema = pa.schema(
        [("t", pa.int64()), ("n_t", pa.int64()), ("d_t", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        first = batch["first_d"].combine_chunks().cast(pa.date32()).cast(
            pa.int32()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        last = batch["last_d"].combine_chunks().cast(pa.date32()).cast(
            pa.int32()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        t = last - first
        cutoff = (
            pa.scalar(max_date).cast(pa.timestamp("us")).cast(pa.date32())
            .cast(pa.int32()).as_py() - churn_days
        )
        dead = (last <= cutoff).astype(np.int64)
        df = pd.DataFrame({"t": t, "n": 1, "d": dead})
        g = df.groupby("t", sort=False).sum().reset_index()
        return pa.table(
            {
                "t": pa.array(g["t"].to_numpy(), pa.int64()),
                "n_t": pa.array(g["n"].to_numpy(), pa.int64()),
                "d_t": pa.array(g["d"].to_numpy(), pa.int64()),
            },
            schema=part_schema,
        )

    ev = (
        span.map_batches(partial, batch_format="pyarrow")
        .to_pandas().groupby("t", sort=True).sum().reset_index()
    )
    t = ev["t"].to_numpy(dtype=np.int64)
    n_t = ev["n_t"].to_numpy(dtype=np.int64)
    d_t = ev["d_t"].to_numpy(dtype=np.int64)
    n_risk = n_t[::-1].cumsum()[::-1]
    deaths = d_t > 0
    term = 1.0 - d_t[deaths].astype(np.float64) / n_risk[deaths].astype(np.float64)
    keep = term > 0.0  # drop the terminal full-die-out row (see docstring)
    s_km = np.exp(np.cumsum(np.log(term[keep])))
    return pa.table(
        {
            "t_days": pa.array(t[deaths][keep], pa.int64()),
            "n_risk": pa.array(n_risk[deaths][keep], pa.int64()),
            "d": pa.array(d_t[deaths][keep], pa.int64()),
            "s_km": pa.array(np.round(s_km, 8), pa.float64()),
        }
    )


def kmv_user_overlap(sf_dir: str, k: int = 64):
    """KMV SKETCH ALGEBRA between event types: for every unordered pair of
    event types, estimate the union size, intersection size and Jaccard of
    their distinct-user sets from the per-type k-minimum-values sketches
    alone (Beyer et al. 2007's multi-set KMV) — the sketch-family member
    that answers "how much do these audiences overlap" without ever joining
    the full user sets.

    Estimator, applied IDENTICALLY in SQL: ``K(A u B)`` = first
    ``kk = min(k, |K(A) u K(B)|)`` of the merged sketch; union est is exact
    ``|U|`` below ``k`` else ``(k-1)/h_(k)`` normalized; ``rho`` = fraction
    of the kk-prefix present in BOTH sketches; intersection est =
    ``rho * union_est``.  Everything is a pure deterministic function of the
    md5-low64 hashes, so the DuckDB oracle replays it exactly.

    Distributed shape: same bounded per-block k-minima partials as
    :func:`distinct_kmv_events` (k rows per type per block); only sketches
    reach the driver, pair algebra is O(#types^2 * k).
    Output: ``type_a, type_b, est_union, est_inter, jaccard_est``."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..sources.io import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    part_schema = pa.schema([("event_type", pa.string()), ("h", pa.uint64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        rows_t: list[str] = []
        rows_h: list[int] = []
        for et, g in df.groupby("event_type", sort=False):
            hs = np.unique(
                np.array(
                    [md5_low64(str(u)) for u in pd.unique(g["user_id"])],
                    dtype=np.uint64,
                )
            )[:k]
            rows_t.extend([et] * len(hs))
            rows_h.extend(hs.tolist())
        return pa.table(
            {
                "event_type": pa.array(rows_t, pa.string()),
                "h": pa.array(np.array(rows_h, dtype=np.uint64), pa.uint64()),
            },
            schema=part_schema,
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketches: dict[str, np.ndarray] = {}
    for et, g in parts.groupby("event_type", sort=True):
        sketches[et] = np.unique(g["h"].to_numpy(dtype=np.uint64))[:k]

    types = sorted(sketches)
    out = {"type_a": [], "type_b": [], "est_union": [], "est_inter": [],
           "jaccard_est": []}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ka, kb = sketches[ta], sketches[tb]
            u = np.unique(np.concatenate([ka, kb]))
            kk = min(k, len(u))
            pref = u[:kk]
            if len(u) < k:
                u_est = float(len(u))
            else:
                u_est = (k - 1) / (float(u[k - 1]) / 18446744073709551616.0)
            both = np.isin(pref, ka) & np.isin(pref, kb)
            rho = float(both.sum()) / kk
            out["type_a"].append(ta)
            out["type_b"].append(tb)
            out["est_union"].append(round(u_est, 4))
            out["est_inter"].append(round(rho * u_est, 4))
            out["jaccard_est"].append(round(rho, 8))
    return pa.table(
        {
            "type_a": pa.array(out["type_a"], pa.string()),
            "type_b": pa.array(out["type_b"], pa.string()),
            "est_union": pa.array(out["est_union"], pa.float64()),
            "est_inter": pa.array(out["est_inter"], pa.float64()),
            "jaccard_est": pa.array(out["jaccard_est"], pa.float64()),
        }
    )


def k_anonymity_events(sf_dir: str, k: int = 5):
    """K-ANONYMITY AUDIT over event quasi-identifiers — the privacy gate a
    data-release pipeline runs before exporting an analytics extract: bucket
    every event by the quasi-identifier triple ``(event_type, hour-of-day,
    value band = floor(value / 10))`` and report every bucket with fewer than
    ``k`` events (re-identification risk: a joinable side channel narrows
    those rows to tiny candidate sets).  ``n_users`` (distinct users in the
    bucket) quantifies how many people the risk touches.

    Exactly-integer end to end: hour extraction, the band floor and both
    counts are integers, so parity with SQL is trivial.  Distributed shape:
    one (QI, user)-level Arrow group_by partial per block, one small combine
    (QI-bucket cardinality is bounded by types x 24 x bands, not rows).
    Output: ``event_type, hour, value_band, n, n_users`` for n < k."""
    import pandas as pd

    from ..sources.io import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id", "value"]
    )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("value_band", pa.int64()), ("user_id", pa.int64()),
         ("cnt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        hour = pc.hour(t["ts"])
        band = pc.floor(pc.divide(t["value"], pa.scalar(10.0)))
        qi = pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.cast(hour, pa.int64()),
                "value_band": pc.cast(band, pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
            }
        )
        out = qi.group_by(
            ["event_type", "hour", "value_band", "user_id"]
        ).aggregate([([], "count_all")])
        return out.rename_columns(
            ["event_type", "hour", "value_band", "user_id", "cnt"]
        ).cast(part_schema)

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.schema(
            [("event_type", pa.string()), ("hour", pa.int64()),
             ("value_band", pa.int64()), ("n", pa.int64()),
             ("n_users", pa.int64())]
        ).empty_table()
    per_user = (
        parts.groupby(
            ["event_type", "hour", "value_band", "user_id"], sort=False
        )["cnt"].sum().reset_index()
    )
    g = per_user.groupby(["event_type", "hour", "value_band"], sort=True).agg(
        n=("cnt", "sum"), n_users=("user_id", "size")
    ).reset_index()
    bad = g[g["n"] < k]
    return pa.table(
        {
            "event_type": pa.array(bad["event_type"].astype(str), pa.string()),
            "hour": pa.array(bad["hour"].to_numpy(np.int64), pa.int64()),
            "value_band": pa.array(
                bad["value_band"].to_numpy(np.int64), pa.int64()
            ),
            "n": pa.array(bad["n"].to_numpy(np.int64), pa.int64()),
            "n_users": pa.array(bad["n_users"].to_numpy(np.int64), pa.int64()),
        }
    )


def daily_revenue_holt(sf_dir: str, alpha: float = 0.3, beta: float = 0.1):
    """HOLT DOUBLE-EXPONENTIAL SMOOTHING over daily revenue — the
    level+trend recursive pair next to :func:`daily_revenue_ewma`'s single
    recurrence: ``l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})``,
    ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}`` with ``l_1 = x_1,
    b_1 = 0``; the one-step forecast is ``l_t + b_t``.  The recurrence is
    coupled (each value needs BOTH previous outputs) — inexpressible by
    frame-based windows, replayed in SQL by a recursive CTE carrying both
    columns (the new level expression inlined into the trend step, same
    float64 tree).

    Distributed part: the daily series folds via map-side combine (exchange
    bounded by |days|); the recursion runs over the collected series.  All
    smoothed outputs are emitted as integer cents via the shared
    ``floor(v*100 + 0.5)`` expression (see the EWMA docstring for why not
    ``round``).  Output: ``day, rev_c, level_c, trend_c, forecast_c``."""
    import ray.data as rd

    daily = _daily_revenue_cents(sf_dir).sort_values("day").reset_index(drop=True)
    x = daily["rev_c"].to_numpy().astype(np.float64)
    n = len(x)
    level = np.empty(n, np.float64)
    trend = np.empty(n, np.float64)
    if n:
        level[0], trend[0] = x[0], 0.0
        for t_ in range(1, n):  # bounded by |days|, not the fact table
            lt = alpha * x[t_] + (1.0 - alpha) * (level[t_ - 1] + trend[t_ - 1])
            trend[t_] = beta * (lt - level[t_ - 1]) + (1.0 - beta) * trend[t_ - 1]
            level[t_] = lt
    cents = lambda v: np.floor(v * 100.0 + 0.5).astype(np.int64)  # noqa: E731
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(
                    daily["day"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "rev_c": pa.array(daily["rev_c"].to_numpy(), pa.int64()),
                "level_c": pa.array(cents(level), pa.int64()),
                "trend_c": pa.array(cents(trend), pa.int64()),
                "forecast_c": pa.array(cents(level + trend), pa.int64()),
            }
        )
    )


def benford_audit_orders(sf_dir: str):
    """BENFORD'S-LAW FIRST-DIGIT AUDIT of order totals — the forensic
    data-quality screen for fabricated or truncated monetary data: compare
    the observed first-significant-digit distribution of ``o_totalprice``
    against Benford's ``log10(1 + 1/d)`` and report the per-digit chi-square
    contribution.  Digit extraction is EXACT: integer cents via the shared
    ``round(price*100)`` idiom, first digit = leading character of the
    integer's decimal string (shifting the decimal point never changes the
    leading significant digit) — no float formatting anywhere.

    One low-cardinality combine (9 digit groups); the expected counts and
    chi-square terms are single IEEE expressions replayed identically in
    SQL.  Output: ``digit, n_obs, exp_n, chi2_term`` (round 8)."""
    from ..sources.io import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    part_schema = pa.schema([("digit", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                             pa.scalar(100.0))), pa.int64())
        first = pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1)
        vc = pc.value_counts(pc.cast(first, pa.int64()).combine_chunks())
        return pa.table(
            {
                "digit": pc.cast(vc.field("values"), pa.int64()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            },
            schema=part_schema,
        )

    parts = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("digit", sort=True)["n"].sum()
    n_total = int(g.sum())
    digits = np.arange(1, 10, dtype=np.int64)
    obs = np.array([int(g.get(d, 0)) for d in digits], dtype=np.int64)
    exp = n_total * np.log10(1.0 + 1.0 / digits.astype(np.float64))
    chi = (obs.astype(np.float64) - exp) ** 2 / exp
    return pa.table(
        {
            "digit": pa.array(digits, pa.int64()),
            "n_obs": pa.array(obs, pa.int64()),
            "exp_n": pa.array(np.round(exp, 8), pa.float64()),
            "chi2_term": pa.array(np.round(chi, 8), pa.float64()),
        }
    )


def daily_revenue_cusum(sf_dir: str):
    """CUSUM CHANGEPOINT DETECTION over daily revenue — the control-chart
    companion to the pointwise z-screen (:func:`daily_revenue_anomaly`) and
    the smoothers (EWMA/Holt): two one-sided cumulative sums
    ``sp_t = max(0, sp_{t-1} + (x_t - mu - k))`` and
    ``sn_t = max(0, sn_{t-1} + (mu - x_t - k))`` with allowance
    ``k = 0.5*sigma`` and alarm threshold ``h = 4*sigma`` — CUSUM
    accumulates small persistent shifts a z-screen never flags.

    Moments are EXACT Python-int sums (daily cents squared overflow int64 at
    sf >= 0.1; the oracle's HUGEINT matches), mu/sigma/k/h are single IEEE
    expressions, and the coupled max-recursion is replayed by a recursive
    CTE carrying both sums.  Distributed part: the daily series folds via
    map-side combine; the recursion is bounded by |days|.  The sums are
    emitted as INTEGER CENTS via the shared ``floor(v*100 + 0.5)`` idiom —
    ``round(v, 8)`` at the ~1e15 internal scale differs between numpy and
    DuckDB in the last ulp (the EWMA docstring's footgun, reproduced here).
    Output: ``day, rev_c, cusum_pos_c, cusum_neg_c, alarm``."""
    import math

    import ray.data as rd

    daily = _daily_revenue_cents(sf_dir).sort_values("day").reset_index(drop=True)
    xs = [int(v) for v in daily["rev_c"]]
    n = len(xs)
    if n == 0:
        return pa.schema(
            [("day", pa.timestamp("us")), ("rev_c", pa.int64()),
             ("cusum_pos_c", pa.int64()), ("cusum_neg_c", pa.int64()),
             ("alarm", pa.int64())]
        ).empty_table()
    s1 = sum(xs)
    s2 = sum(v * v for v in xs)  # exact big-int, mirrors HUGEINT
    mu = float(s1) / n
    sigma = math.sqrt(float(s2) / n - mu * mu)
    kk = 0.5 * sigma
    h = 4.0 * sigma
    sp = np.empty(n, np.float64)
    sn = np.empty(n, np.float64)
    prev_p = prev_n = 0.0
    for t_ in range(n):  # bounded by |days|, not the fact table
        prev_p = max(0.0, prev_p + (float(xs[t_]) - mu - kk))
        prev_n = max(0.0, prev_n + (mu - float(xs[t_]) - kk))
        sp[t_], sn[t_] = prev_p, prev_n
    alarm = ((sp > h) | (sn > h)).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(
                    daily["day"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "rev_c": pa.array(daily["rev_c"].to_numpy(), pa.int64()),
                "cusum_pos_c": pa.array(
                    np.floor(sp * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
                "cusum_neg_c": pa.array(
                    np.floor(sn * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
                "alarm": pa.array(alarm, pa.int64()),
            }
        )
    )


def orders_keyset_page(sf_dir: str, page: int = 100):
    """KEYSET (cursor) PAGINATION — the serving-tier primitive that replaces
    OFFSET scans: page 2 of the orders feed ordered by ``(o_orderdate,
    o_orderkey)``, fetched as "the first ``page`` rows strictly AFTER the
    last key of page 1" — O(page) work regardless of how deep the cursor
    sits, where OFFSET re-reads everything before it.

    Distributed shape: the cursor (page 1's last key) comes from one
    bounded ``global_topk`` pass (per-block k-best partials, no global
    sort); page 2 is one vectorized keyset filter
    ``(date, key) > cursor`` pushed into the stream plus a second bounded
    top-k.  Output: ``o_orderkey, o_orderdate, o_totalprice`` of page 2,
    globally sorted."""
    from ..functions.groupagg import global_topk

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_totalprice"])
    p1 = global_topk(
        orders, ["o_orderdate", "o_orderkey"], [False, False], page
    ).to_pandas()
    if len(p1) < page:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_totalprice": pa.array([], pa.float64())}
        )
    cur_d = p1["o_orderdate"].iloc[-1]
    cur_k = int(p1["o_orderkey"].iloc[-1])
    cd = pa.scalar(cur_d.to_datetime64(), pa.timestamp("us"))

    def after(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        keep = pc.or_(
            pc.greater(d, cd),
            pc.and_(pc.equal(d, cd),
                    pc.greater(pc.cast(t["o_orderkey"], pa.int64()),
                               pa.scalar(cur_k, pa.int64()))),
        )
        return t.filter(keep)

    p2 = global_topk(
        orders.map_batches(after, batch_format="pyarrow"),
        ["o_orderdate", "o_orderkey"], [False, False], page,
    ).to_pandas()
    return pa.table(
        {
            "o_orderkey": pa.array(p2["o_orderkey"].to_numpy(np.int64), pa.int64()),
            "o_orderdate": pa.array(
                p2["o_orderdate"].to_numpy().astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array(p2["o_totalprice"].to_numpy(), pa.float64()),
        }
    )


def event_value_ecdf(sf_dir: str):
    """EMPIRICAL-CDF (average-rank) NORMALIZATION of event values per type —
    the rank-based feature transform (quantile normalization) a
    training-feature pipeline applies when raw magnitudes are incomparable
    across types: each distinct value maps to
    ``(c_lt + (cnt + 1)/2) / n`` (ties share their average rank), exact
    integers until one IEEE expression.

    One type-keyed partition; per block a vectorized sort + run-length
    cumsum over the co-located group (distinct values per type, never raw
    rows, leave the block).  Output: ``event_type, value, cnt, ecdf``
    (round 8)."""
    import pandas as pd

    from ..state.partitioning import key_partitioned

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=str),
                 "value": pd.Series([], dtype=np.float64),
                 "cnt": pd.Series([], dtype=np.int64),
                 "ecdf": pd.Series([], dtype=np.float64)}
            )
        out = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64))
            uniq, cnt = np.unique(v, return_counts=True)
            c_lt = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
            n = float(len(v))
            ecdf = (c_lt + (cnt + 1) / 2.0) / n
            out.append(pd.DataFrame(
                {"event_type": et, "value": uniq,
                 "cnt": cnt.astype(np.int64), "ecdf": np.round(ecdf, 8)}
            ))
        return pd.concat(out, ignore_index=True)

    return key_partitioned(ev, ["event_type"]).map_batches(
        block, batch_format="pandas", batch_size=None
    )


def daily_revenue_features(sf_dir: str):
    """LAG-FEATURE TABLE for forecasting — the supervised-learning prep that
    turns the revenue series into (target, lag-1, lag-7, trailing-7-sum)
    rows a regression trainer consumes directly.  ALL columns are exact
    integer cents: lags are shifts, the trailing sum is a 7-day rolling
    integer sum (NULL until 7 days exist, matching the SQL frame+CASE) —
    zero float anywhere.

    Distributed part: the daily series folds via map-side combine (bounded
    by |days|); shifts/rolling are one vectorized pass over the collected
    series.  Output: ``day, rev_c, lag1_c, lag7_c, sum7_c``."""
    import ray.data as rd

    daily = _daily_revenue_cents(sf_dir).sort_values("day").reset_index(drop=True)
    x = daily["rev_c"].to_numpy(np.int64)
    n = len(x)

    def lag(d: int) -> np.ndarray:
        out = np.full(n, -1, np.int64)
        if n > d:
            out[d:] = x[:-d]
        return out

    lag1, lag7 = lag(1), lag(7)
    csum = np.concatenate([[0], np.cumsum(x)]).astype(np.int64)
    sum7 = np.full(n, -1, np.int64)
    if n >= 7:
        sum7[6:] = csum[7:] - csum[:-7]
    mask1, mask7, masks = lag1 >= 0, lag7 >= 0, sum7 >= 0
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(
                    daily["day"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "rev_c": pa.array(x, pa.int64()),
                "lag1_c": pa.array(
                    [int(v) if m else None for v, m in zip(lag1, mask1)],
                    pa.int64(),
                ),
                "lag7_c": pa.array(
                    [int(v) if m else None for v, m in zip(lag7, mask7)],
                    pa.int64(),
                ),
                "sum7_c": pa.array(
                    [int(v) if m else None for v, m in zip(sum7, masks)],
                    pa.int64(),
                ),
            }
        )
    )


def type_hour_independence(sf_dir: str):
    """CHI-SQUARE INDEPENDENCE TEST between event type and hour-of-day —
    the contingency-table screen ("is traffic shape type-dependent?") next
    to the engine's two-sample tests (Welch t, KS, PSI): per cell of the
    FULL observed-types x observed-hours cross product, the observed count,
    the independence expectation ``row_total * col_total / n`` and its
    chi-square contribution ``(obs - exp)^2 / exp`` — exact integer
    marginals, two IEEE expressions, round 8.

    One low-cardinality combine (|types| x 24 cells); the cross product and
    the algebra run over the tiny marginal tables.  Output: ``event_type,
    hour, n_obs, exp_n, chi2_term``."""
    import pandas as pd

    from ..functions.groupagg import lowcard_groupagg
    from ..sources.io import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
            }
        )

    cells = lowcard_groupagg(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "hour"], [([], "count_all")], {"count_all": "n_obs"},
    ).to_pandas()
    piv = cells.pivot_table(index="event_type", columns="hour",
                            values="n_obs", fill_value=0, aggfunc="sum")
    piv = piv.sort_index()
    piv = piv[sorted(piv.columns)]
    obs = piv.to_numpy(np.int64)
    rows = obs.sum(axis=1)
    cols = obs.sum(axis=0)
    n = float(obs.sum())
    exp = rows[:, None].astype(np.float64) * cols[None, :].astype(np.float64) / n
    chi = (obs.astype(np.float64) - exp) ** 2 / exp
    types = list(piv.index)
    hours = list(piv.columns)
    et = np.repeat(np.array(types, dtype=object), len(hours))
    hr = np.tile(np.array(hours, dtype=np.int64), len(types))
    return pa.table(
        {
            "event_type": pa.array(list(et), pa.string()),
            "hour": pa.array(hr, pa.int64()),
            "n_obs": pa.array(obs.ravel(), pa.int64()),
            "exp_n": pa.array(np.round(exp.ravel(), 8), pa.float64()),
            "chi2_term": pa.array(np.round(chi.ravel(), 8), pa.float64()),
        }
    )


def brand_triple_support(sf_dir: str, min_orders: int = 3):
    """FREQUENT 3-ITEMSETS over order baskets — the Apriori step above
    :func:`brand_basket_lift`'s pair support: brand triples co-purchased in
    at least ``min_orders`` distinct orders, with their support against the
    distinct-order universe.  Exact integer counts, one IEEE division.

    Distributed shape: ONE orderkey-keyed shuffle of the distinct
    (order, brand) rows co-locates each basket; per block, per-basket
    sorted-combination generation (baskets hold a handful of brands —
    C(k,3) stays tiny) feeds a triple-keyed combine bounded by the triple
    vocabulary, not row count.  Output: ``b1, b2, b3, n_abc, support``."""
    import itertools

    import pandas as pd

    from ..functions.groupagg import highcard_groupagg
    from ..state.partitioning import key_partitioned

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # ONE to_pandas: zipping two separate executions of the lazy Dataset
    # pairs keys and values from potentially different block orders
    pdf = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_by_part = dict(
        zip(pdf["p_partkey"].to_numpy(np.int64), pdf["p_brand"].astype(str))
    )
    import ray

    brand_ref = ray.put(brand_by_part)

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(brand_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "brand": pa.array([m[int(p)] for p in pk], pa.string()),
            }
        )

    ob = highcard_groupagg(
        li.map_batches(tag, batch_format="pyarrow"),
        ["l_orderkey", "brand"], [([], "count_all")], {"count_all": "c"},
    )

    # distinct-order count: per-block distinct partials over the keyed rows
    keyed = key_partitioned(ob, ["l_orderkey"])

    part_schema = pa.schema(
        [("b1", pa.string()), ("b2", pa.string()), ("b3", pa.string()),
         ("c", pa.int64()), ("n_ord", pa.int64())]
    )

    def triples(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "b": t["brand"].to_pandas().astype(str),
            }
        )
        from collections import Counter

        cnt: Counter = Counter()
        n_ord = 0
        for _, g in df.groupby("o", sort=False):
            n_ord += 1
            bs = sorted(set(g["b"]))
            if len(bs) >= 3:
                cnt.update(itertools.combinations(bs, 3))
        rows = list(cnt.items())
        # one dedicated carrier row holds this block's basket count — a
        # block full of small baskets must still contribute to the support
        # denominator even when it emits zero triples
        return pa.table(
            {
                "b1": pa.array([r[0][0] for r in rows] + [""], pa.string()),
                "b2": pa.array([r[0][1] for r in rows] + [""], pa.string()),
                "b3": pa.array([r[0][2] for r in rows] + [""], pa.string()),
                "c": pa.array([r[1] for r in rows] + [0], pa.int64()),
                "n_ord": pa.array([0] * len(rows) + [n_ord], pa.int64()),
            },
            schema=part_schema,
        )

    parts = keyed.map_batches(
        triples, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if parts.empty:
        return pa.schema(
            [("b1", pa.string()), ("b2", pa.string()), ("b3", pa.string()),
             ("n_abc", pa.int64()), ("support", pa.float64())]
        ).empty_table()
    n_total = float(parts["n_ord"].sum())
    trip = parts[parts["b1"] != ""]
    g = (
        trip.groupby(["b1", "b2", "b3"], sort=True)["c"].sum().reset_index()
    )
    g = g[g["c"] >= min_orders]
    sup = np.round(g["c"].to_numpy(np.float64) / n_total, 8)
    return pa.table(
        {
            "b1": pa.array(g["b1"].astype(str), pa.string()),
            "b2": pa.array(g["b2"].astype(str), pa.string()),
            "b3": pa.array(g["b3"].astype(str), pa.string()),
            "n_abc": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            "support": pa.array(sup, pa.float64()),
        }
    )


def join_size_cms(sf_dir: str):
    """JOIN-SIZE ESTIMATION via Count-Min INNER PRODUCTS (the AMS/CMS
    classic): for every event-type pair, estimate the equi-join cardinality
    on ``user_id`` — ``|A join B| = sum_u c_A(u) * c_B(u)`` — from the two
    types' fixed-memory CMS tables alone: ``est = min_r sum_j
    CMS_A[r][j] * CMS_B[r][j]`` (never an underestimate).  The
    query-planner primitive for sizing a shuffle join without touching the
    key sets; the third member of the sketch-algebra family
    (:func:`distinct_kmv_events`, :func:`kmv_user_overlap`).

    Deterministic end to end (same md5-low64 + splitmix double hashing as
    ``event_type_counts_cms``), so the DuckDB oracle replays the sketches
    exactly in HUGEINT and takes the identical min-of-inner-products.
    Distributed shape: one (4 x 2048) int64 table per type per block,
    merged by addition; pair algebra is O(#types^2 * d * w) on the tiny
    merged tables.  Output: ``type_a, type_b, est_join_size`` (exact
    integers)."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..sources.io import read_parquet_clean
    from ..state.sketch import CMS_D, CMS_W, cms_merge, cms_table

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("payload", pa.binary())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        types, blobs = [], []
        for et, g in df.groupby("event_type", sort=False):
            vc = g["user_id"].value_counts()
            keys = np.array(
                [md5_low64(str(u)) for u in vc.index], dtype=np.uint64
            )
            blobs.append(cms_table(keys, vc.to_numpy(np.int64)).tobytes())
            types.append(et)
        return pa.table(
            {"event_type": pa.array(types, pa.string()),
             "payload": pa.array(blobs, pa.binary())},
            schema=part_schema,
        )

    rows = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketches: dict[str, np.ndarray] = {}
    for et, g in rows.groupby("event_type", sort=True):
        sketches[et] = cms_merge(
            [np.frombuffer(p, dtype=np.int64).reshape(CMS_D, CMS_W)
             for p in g["payload"]]
        )
    types = sorted(sketches)
    out_a, out_b, out_e = [], [], []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            prods = (sketches[ta] * sketches[tb]).sum(axis=1)
            out_a.append(ta)
            out_b.append(tb)
            out_e.append(int(prods.min()))
    return pa.table(
        {
            "type_a": pa.array(out_a, pa.string()),
            "type_b": pa.array(out_b, pa.string()),
            "est_join_size": pa.array(out_e, pa.int64()),
        }
    )
