"""Small-file compaction: fewer files, identical multiset of rows."""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")


def _write_small_files(d, n_files=20, rows_per=50):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        t = pa.table(
            {
                "k": pa.array(range(i * rows_per, (i + 1) * rows_per), pa.int64()),
                "v": pa.array([f"row{j}" for j in range(rows_per)], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(d, f"part_{i:04d}.parquet"))


def _sorted_df(path):
    import glob

    dfs = [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{path}/*.parquet"))]
    return (
        pd.concat(dfs, ignore_index=True)
        .sort_values(["k", "v"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_compaction_roundtrip(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import compact_parquet_dir

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    _write_small_files(src)
    before = _sorted_df(src)

    stats = compact_parquet_dir(src, dst, target_rows_per_file=400)
    assert stats["files_before"] == 20
    assert stats["rows"] == 1000
    assert stats["files_after"] <= 3  # ceil(1000/400) blocks
    assert stats["files_after"] < stats["files_before"]
    pd.testing.assert_frame_equal(_sorted_df(dst), before)


def test_compaction_overwrites_stale_target(ray_session, tmp_path):
    from near_duplicate_detection_ray.sources.io import compact_parquet_dir

    src = str(tmp_path / "small2")
    dst = str(tmp_path / "compact2")
    _write_small_files(src, n_files=4, rows_per=10)
    # stale garbage in the destination must not survive the rewrite
    os.makedirs(dst, exist_ok=True)
    pq.write_table(pa.table({"zzz": pa.array([1])}),
                   os.path.join(dst, "stale.parquet"))

    compact_parquet_dir(src, dst, target_rows_per_file=1000)
    names = os.listdir(dst)
    assert "stale.parquet" not in names
    assert _sorted_df(dst).shape == (40, 2)


def test_pipeline_report(ray_session, tmp_path):
    """run the checkpointed flagship at tiny scale, then read the report."""
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.stages.checkpoint import (
        checkpointed_near_dup_pipeline,
    )
    from near_duplicate_detection_ray.sources.transcripts import (
        transcripts_from_documents,
    )
    from near_duplicate_detection_ray.stages.checkpoint import pipeline_report

    root = str(tmp_path / "ckpt")
    transcripts = transcripts_from_documents("/root/testdata/sf0.001")
    checkpointed_near_dup_pipeline(
        transcripts, root, NDDConfig(), input_token="sf0.001"
    )
    rep = pipeline_report(root)
    assert rep, "no manifests found"
    by_stage = {r["stage"]: r for r in rep}
    assert "signatures" in by_stage or len(by_stage) >= 3
    for r in rep:
        assert r["rows"] is None or r["rows"] >= 0
        assert r["partitions"] >= 1
        assert isinstance(r["upstream"], list)
