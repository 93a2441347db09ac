"""Persisted IVF index pins: hive layout on disk, storage-level pruning, and
result equality with the streaming IVF scan (same quantizer) plus the exact
scan under full probing."""

import os
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_ivf_index_build_layout(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.ann import build_ivf_index

    idx = str(tmp_path / "ivf")
    manifest = build_ivf_index(SF, idx, n_centroids=16, seed=42)
    assert manifest["n_centroids"] == 16
    vec_dir = os.path.join(idx, "vectors")
    dirs = sorted(d for d in os.listdir(vec_dir) if d.startswith("cell="))
    assert dirs, "no hive cell directories written"
    assert manifest["cells_written"] == sorted(int(d.split("=")[1]) for d in dirs)
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    # every written cell dir holds rows whose in-file cell_v matches the dir
    import pyarrow.parquet as pq

    d0 = dirs[0]
    t = pq.read_table(os.path.join(vec_dir, d0))
    assert set(t["cell_v"].to_pylist()) == {int(d0.split("=")[1])}


def test_ivf_index_equals_streaming_ivf(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.ann import (
        ann_ivf_index_topk,
        ann_ivf_topk,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(SF, idx, n_centroids=16, seed=42)
    got = _df(ann_ivf_index_topk(idx, SF, n_queries=8, k=5, nprobe=4))
    ref = _df(ann_ivf_topk(SF, n_queries=8, k=5, n_centroids=16, nprobe=4, seed=42))
    assert got.equals(ref), "index-backed IVF diverged from streaming IVF"
    # bounded probing really prunes: fewer dirs than cells were readable
    vec_dir = os.path.join(idx, "vectors")
    assert len(os.listdir(vec_dir)) > 4


def test_ivf_index_full_probe_equals_exact(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.ann import (
        ann_ivf_index_topk,
        build_ivf_index,
        cosine_topk,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(SF, idx, n_centroids=16, seed=42)
    got = _df(ann_ivf_index_topk(idx, SF, n_queries=8, k=5, nprobe=16))
    exact = _df(cosine_topk(SF, n_queries=8, k=5))
    assert got.equals(exact), "full-probe index query != exact scan"
