"""CSV / NDJSON source parity: the same documents round-trip through every
ingestion format and feed the same pipelines."""

import sys

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _docs_table():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])


def test_csv_source_round_trip(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_csv_clean

    t = _docs_table()
    path = str(tmp_path / "docs.csv")
    pacsv.write_csv(t, path)
    ds = read_csv_clean(path)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    assert ds.schema().base_schema.metadata is None


def test_json_source_round_trip(ray_session, tmp_path):
    import json

    from near_duplicate_detection_ray.sources.io import read_json_clean

    t = _docs_table()
    path = str(tmp_path / "docs.jsonl")
    with open(path, "w") as fh:
        for row in t.to_pylist():
            fh.write(json.dumps(row) + "\n")
    got = read_json_clean(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()


def test_csv_feeds_same_pipeline(ray_session, tmp_path):
    """A pipeline aggregation consumes the CSV-sourced dataset identically
    to the parquet-sourced one (including a clean shuffle — the metadata
    strip is what read_csv_clean adds)."""
    from near_duplicate_detection_ray.functions.groupagg import highcard_groupagg
    from near_duplicate_detection_ray.sources.io import (
        read_csv_clean,
        read_parquet_clean,
    )

    t = _docs_table()
    path = str(tmp_path / "docs.csv")
    pacsv.write_csv(t, path)

    def agg(ds):
        out = highcard_groupagg(
            ds, ["doc_id"], [("n_chars", "sum")], {"n_chars_sum": "total"}
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        return out

    a = agg(read_csv_clean(path))
    b = agg(read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]))
    assert a.equals(b)
