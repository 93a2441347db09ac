"""Incremental IVF index maintenance: upsert equals a from-scratch rebuild
at query time; deletes evict ids from results and the manifest."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _query(index_dir, nprobe=10_000):
    """full-probe query -> exact over the indexed subset."""
    from near_duplicate_detection_ray.pipelines.ann import ann_ivf_index_topk

    return (
        ann_ivf_index_topk(index_dir, SF, n_queries=5, k=5, nprobe=nprobe)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_upsert_matches_full_build(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.ann import (
        _read_emb,
        build_ivf_index,
        ivf_index_upsert,
    )

    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    build_ivf_index(SF, full_dir, n_centroids=8, seed=42)
    # incremental: build on the same corpus, then delete+re-add a slice via
    # upsert (exercises evict + assign with frozen centroids)
    build_ivf_index(SF, inc_dir, n_centroids=8, seed=42)
    slice_ds = _read_emb(SF, ["vec_id", "embedding"]).filter(
        lambda r: 100 <= r["vec_id"] < 160
    )
    man = ivf_index_upsert(inc_dir, slice_ds)
    assert man["cells_written"]

    pd.testing.assert_frame_equal(_query(full_dir), _query(inc_dir))


def test_delete_evicts(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.ann import (
        build_ivf_index,
        ivf_index_delete,
    )

    d = str(tmp_path / "del")
    build_ivf_index(SF, d, n_centroids=8, seed=42)
    before = _query(d)
    victim = int(before["neighbor_id"].iloc[0])
    removed = ivf_index_delete(d, [victim])
    assert removed == 1
    after = _query(d)
    assert victim not in set(after["neighbor_id"])
