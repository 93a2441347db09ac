"""Driver-contract inventory guards: every queries() entry is callable, every
oracle_sql() key has a matching query, and the documented rows-only set is
exactly the honestly-approximate ANN/sketch queries."""

import sys

sys.path.insert(0, "/root/repo")


def test_inventory_consistency():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), f"oracles without queries: {sorted(set(o) - set(q))}"
    rows_only = sorted(set(q) - set(o))
    assert rows_only == [
        "ann_ivf_topk",            # approximate ANN (recall pytest-pinned)
        "ann_lsh_topk",            # approximate ANN (recall pytest-pinned)
        "ann_pq_topk",             # PQ/ADC ANN (full-refine equality + recall pinned)
        "distinct_stats_hll",      # HLL sketch (blake2b basis + 4096-float
                                   # harmonic sum are not SQL-replayable)
        "event_value_quantiles_sketch",  # mergeable sketch (error pytest-pinned)
        "media_cdc_dedup",         # rolling-hash CDC boundaries (NumPy-oracle pytest)
        "semdedup_docs",           # k-means-bounded semantic dedup (NumPy-oracle pytest)
    ], rows_only  # event_type_counts_cms and dup_kcore graduated to exact SQL
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least BIND against empty tables of the real
    schemas (catches typos/renames without running the engine)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        empty = schema.empty_table()
        con.register(f"__{t}", empty)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM __{t}")
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql).df()
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed to bind/run: {ex}") from ex
