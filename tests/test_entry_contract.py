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
    assert rows_only == [], rows_only
    # 252/252 exact SQL oracles: event_type_counts_cms, dup_kcore,
    # media_cdc_dedup, distinct_stats_hll, semdedup_docs,
    # event_value_quantiles_sketch graduated in rounds 2-3; round 4 added
    # ann_ivf_topk (init='first' Lloyd replay), ann_lsh_topk (splitmix
    # hyperplanes in HUGEINT + Hamming<=2 probe) and ann_pq_topk
    # (init='first' subspace Lloyd + ADC + deterministic global two-pass
    # refine); round 5 graduated the last one, ann_nsw_topk, via
    # refine="global" — the NSW beam prunes, a guaranteed-superset
    # threshold pass refines, and the output is the exact cosine top-k
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


def test_documented_counts_match_live():
    """README's inventory line must match the live queries()/oracle_sql()
    counts (round-2 verdict #10: docs drifted by hand five times)."""
    import re

    import __ray_entry__ as e

    text = open("/root/repo/README.md").read()
    m = re.search(r"(\d+) `queries\(\)` \((\d+) with", text)
    assert m, "README inventory line missing"
    assert int(m.group(1)) == len(e.queries()), "README query count stale"
    assert int(m.group(2)) == len(e.oracle_sql()), "README oracle count stale"


def test_flagship_family_inside_gate_window():
    """The driver's hard gate reads only the first 50 queries() entries; the
    flagship near-dup family must live there (round-2 verdict #2), and the
    curated window list must be EXACTLY 50 — entries past 50 silently fall
    outside the gate (round-3 review finding: the list had grown to 52)."""
    import __ray_entry__ as e

    assert len(e._GATE_WINDOW_FIRST) == 50, (
        f"gate window list has {len(e._GATE_WINDOW_FIRST)} entries; "
        "entries past 50 are invisible to the driver's hard gate"
    )
    first50 = list(e.queries())[:50]
    assert first50 == e._GATE_WINDOW_FIRST
    # round-5 rotation: the pair-similarity / graph-analytics / semdedup
    # entries rotated out with green r0{1..4} rows; the pinned core is the
    # flagship near-dup family plus every query whose code path changed in
    # round 5 (assemble vectorization, shared md5 kernels, Arrow star/rep,
    # frontier k-core, checkpointed incremental base, NSW graduation)
    for name in (
        "ndd_dup_pairs", "ndd_clusters", "ndd_conversations",
        "near_dup_pairs_docs", "dup_pair_recall", "exact_dedup_docs",
        "dup_components_docs", "dup_kcore", "dup_pair_turn_overlap",
        "incremental_clusters", "ann_nsw_topk", "winnow_overlap_pairs",
        "source_report",
    ):
        assert name in first50, f"{name} fell outside the 50-query gate window"


def test_no_hugeint_oracle_output():
    """DuckDB sum(BIGINT) returns HUGEINT -> pandas float64, which fails the
    driver's dtype-sensitive value hash against an int64 engine column
    (events_trailing_1h r02 regression). Bind every oracle against the real
    schemas and assert no HUGEINT output column anywhere."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        con.register(f"__{t}", schema.empty_table())
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM __{t}")
    offenders = {}
    for name, sql in e.oracle_sql().items():
        rel = con.sql(sql)
        hug = [c for c, ty in zip(rel.columns, rel.types)
               if "HUGEINT" in str(ty).upper()]
        if hug:
            offenders[name] = hug
    assert not offenders, f"HUGEINT oracle outputs: {offenders}"
