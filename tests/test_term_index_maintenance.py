"""Incremental inverted-index maintenance: upsert equals a rebuild at query
time; deletes evict postings and keep n_docs exact via the registry."""

import json
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _search(index_dir, terms=("spark", "window", "hash")):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_indexed,
    )

    df = keyword_search_indexed(SF, terms=terms, index_dir=index_dir).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_upsert_equals_rebuild(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        _read_docs,
        build_term_index,
        term_index_upsert,
    )

    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    build_term_index(SF, full, n_buckets=16)
    build_term_index(SF, inc, n_buckets=16)
    # delete + re-add a slice through the upsert path
    slice_ds = _read_docs(SF, ["doc_id", "text"]).filter(
        lambda r: 50 <= r["doc_id"] < 120
    )
    man = term_index_upsert(inc, slice_ds)
    assert man["n_docs"] == 500  # registry keeps the count exact
    pd.testing.assert_frame_equal(_search(full), _search(inc))


def test_delete_evicts_and_counts(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        build_term_index,
        term_index_delete,
    )

    d = str(tmp_path / "del")
    build_term_index(SF, d, n_buckets=16)
    before = _search(d)
    victim = int(before["doc_id"].iloc[0])
    removed = term_index_delete(d, [victim])
    assert removed > 0
    with open(f"{d}/manifest.json") as f:
        man = json.load(f)
    assert man["n_docs"] == 499
    after = _search(d)
    assert victim not in set(after["doc_id"])
