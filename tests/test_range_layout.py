"""Zone-map range layout pins: manifest integrity, storage-level pruning
(fewer files opened), and result equality with a full-scan filter."""

import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def _build(tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        read_parquet_clean,
        write_range_partitions,
    )

    out = str(tmp_path / "by_value")
    ds = read_parquet_clean(f"{SF}/events.parquet", columns=["event_id", "value"])
    # several files so pruning is observable
    manifest = write_range_partitions(ds.repartition(8), "value", out)
    return out, manifest


def test_manifest_covers_all_rows_and_is_sorted(ray_session, tmp_path):
    out, manifest = _build(tmp_path)
    total = sum(e["rows"] for e in manifest)
    assert total == pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert len(manifest) > 1
    # sorted layout: file ranges are non-overlapping up to boundary ties
    spans = sorted((float(e["min"]), float(e["max"])) for e in manifest)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2 or abs(hi1 - lo2) < 1e-9


def test_pruned_read_equals_full_filter(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        read_parquet_clean,
        read_range_pruned,
    )

    out, manifest = _build(tmp_path)
    lo, hi = 100.0, 150.0
    ds, n_read, n_total = read_range_pruned(out, lo, hi)
    got = sorted(ds.to_pandas()["event_id"].tolist())
    full = read_parquet_clean(f"{SF}/events.parquet", columns=["event_id", "value"])
    want = sorted(
        full.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t["value"], lo), pc.less_equal(t["value"], hi))
            ),
            batch_format="pyarrow",
        ).to_pandas()["event_id"].tolist()
    )
    assert got == want and len(got) > 0
    assert n_read < n_total, f"no pruning: {n_read}/{n_total}"


def test_pruned_read_empty_range(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_range_pruned

    out, _ = _build(tmp_path)
    ds, n_read, n_total = read_range_pruned(out, -1e12, -1e11)
    assert n_read == 0 and ds.count() == 0


def test_pruned_read_column_projection(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_range_pruned

    out, _ = _build(tmp_path)
    ds, n_read, _ = read_range_pruned(out, 100.0, 120.0, columns=["event_id"])
    df = ds.to_pandas()
    assert list(df.columns) == ["event_id"] and len(df) > 0


def test_pruned_read_timestamp_column(ray_session, tmp_path):
    """min/max round-trip through JSON as strings for temporal columns; the
    reader must coerce them back before comparing (review finding)."""
    import datetime

    from near_duplicate_detection_ray.sources.io import (
        read_parquet_clean,
        read_range_pruned,
        write_range_partitions,
    )

    out = str(tmp_path / "by_date")
    ds = read_parquet_clean(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    write_range_partitions(ds.repartition(6), "o_orderdate", out)
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1995, 12, 31)
    pruned, n_read, n_total = read_range_pruned(out, lo, hi)
    got = sorted(pruned.to_pandas()["o_orderkey"].tolist())
    full = read_parquet_clean(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    want = sorted(
        full[(full["o_orderdate"] >= lo) & (full["o_orderdate"] <= hi)]
        ["o_orderkey"].tolist()
    )
    assert got == want and len(got) > 0
    assert n_read < n_total


def test_hive_layout_roundtrip_and_pruning(ray_session, tmp_path):
    """write_hive_partitions + read_hive_pruned: selected languages come back
    exactly, only matching directories are opened, and a rebuild does not
    absorb stale partitions."""
    import os

    import duckdb
    import pandas as pd

    from near_duplicate_detection_ray.sources.io import (
        read_hive_pruned,
        read_parquet_clean,
        write_hive_partitions,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "by_lang")
    docs = read_parquet_clean(f"{sf}/documents.parquet",
                              columns=["doc_id", "lang", "n_chars"])
    values = write_hive_partitions(docs, "lang", out)
    assert sorted(os.listdir(out)) == sorted(
        [f"lang={v}" for v in values] + ["manifest.json"]
    )

    want = (
        duckdb.sql(
            f"SELECT doc_id, lang, n_chars FROM read_parquet('{sf}/documents.parquet') "
            "WHERE lang IN ('en', 'de') ORDER BY doc_id"
        ).df().reset_index(drop=True)
    )
    ds, n_read, n_total = read_hive_pruned(out, ["en", "de"])
    assert n_read == 2 and n_total == len(values) and n_total > 2
    got = (
        ds.to_pandas()[["doc_id", "lang", "n_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # miss: unknown value reads nothing
    empty, n_read, _ = read_hive_pruned(out, ["zz"])
    assert n_read == 0 and empty.count() == 0

    # rebuild with a filtered dataset must drop stale partitions
    en_only = docs.filter(lambda r: r["lang"] == "en")
    values2 = write_hive_partitions(en_only, "lang", out)
    assert values2 == ["en"]
    assert sorted(os.listdir(out)) == ["lang=en", "manifest.json"]
