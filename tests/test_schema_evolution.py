"""Schema-evolution reader: added columns unify, missing fields become typed
nulls, and type conflicts raise."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")


def test_added_column_unifies(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_parquet_evolved

    d = str(tmp_path / "evo")
    os.makedirs(d)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a", "b"], pa.string())}),
        f"{d}/old.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()),
                  "text": pa.array(["c"], pa.string()),
                  "lang": pa.array(["en"], pa.string())}),
        f"{d}/new.parquet",
    )
    df = (
        read_parquet_evolved(d)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["id", "text", "lang"]
    assert df["lang"].tolist()[:2] == [None, None]
    assert df["lang"].tolist()[2] == "en"


def test_column_projection(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_parquet_evolved

    d = str(tmp_path / "evo2")
    os.makedirs(d)
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), f"{d}/a.parquet")
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()),
                  "v": pa.array([1.5], pa.float64())}),
        f"{d}/b.parquet",
    )
    df = read_parquet_evolved(d, columns=["id"]).to_pandas()
    assert list(df.columns) == ["id"]
    assert sorted(df["id"]) == [1, 2]


def test_type_conflict_raises(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import read_parquet_evolved

    d = str(tmp_path / "evo3")
    os.makedirs(d)
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), f"{d}/a.parquet")
    pq.write_table(pa.table({"id": pa.array(["x"], pa.string())}), f"{d}/b.parquet")
    with pytest.raises(TypeError, match="schema conflict"):
        read_parquet_evolved(d)
