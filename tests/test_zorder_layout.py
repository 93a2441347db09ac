"""Z-order (Morton) layout pins: manifest integrity, 2-D storage pruning,
and result equality with a full-scan conjunctive filter."""

import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def _build(tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        read_parquet_clean,
        write_zorder,
    )

    out = str(tmp_path / "zorder")
    ds = read_parquet_clean(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    manifest = write_zorder(ds.repartition(16), ["user_id", "value"], out)
    return out, manifest


def test_manifest_covers_all_rows(ray_session, tmp_path):
    out, manifest = _build(tmp_path)
    total = sum(e["rows"] for e in manifest["files"])
    assert total == pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert len(manifest["files"]) > 1
    for e in manifest["files"]:
        assert set(e["mins"]) == {"user_id", "value"}


def test_pruned_read_equals_full_filter_and_prunes(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import (
        read_parquet_clean,
        read_zorder_pruned,
    )

    out, _ = _build(tmp_path)
    ranges = {"user_id": (10, 30), "value": (50.0, 120.0)}
    ds, n_read, n_total = read_zorder_pruned(out, ranges)
    got = sorted(ds.to_pandas()["event_id"].tolist())

    full = read_parquet_clean(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def filt(t):
        m = pc.and_(
            pc.and_(pc.greater_equal(t["user_id"], 10),
                    pc.less_equal(t["user_id"], 30)),
            pc.and_(pc.greater_equal(t["value"], 50.0),
                    pc.less_equal(t["value"], 120.0)),
        )
        return t.filter(m)

    want = sorted(
        full.map_batches(filt, batch_format="pyarrow").to_pandas()[
            "event_id"
        ].tolist()
    )
    assert got == want and len(got) > 0
    assert n_read < n_total, f"no pruning: {n_read}/{n_total}"


def test_empty_predicate_window_reads_nothing(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_zorder_pruned

    out, _ = _build(tmp_path)
    ds, n_read, n_total = read_zorder_pruned(
        out, {"user_id": (10**9, 2 * 10**9), "value": (0.0, 1.0)}
    )
    assert n_read == 0 and ds.count() == 0
