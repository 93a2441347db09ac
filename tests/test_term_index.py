"""Persisted inverted-index search: storage-level bucket pruning + output
identity with the streaming tf-idf scan (which is itself DuckDB-oracled)."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _norm(ds):
    df = ds.to_pandas()
    return (
        df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    )


def test_indexed_equals_streaming(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_docs,
        keyword_search_indexed,
    )

    stats = {}
    idx = keyword_search_indexed(
        SF, index_dir=str(tmp_path / "tidx"), _stats=stats
    )
    ref = keyword_search_docs(SF)
    pd.testing.assert_frame_equal(_norm(idx), _norm(ref))
    # pruning really happened: query terms touch <= |terms| of the buckets
    assert 0 < stats["probed_buckets"] <= 3
    assert stats["total_buckets"] > stats["probed_buckets"]


def test_index_prunes_to_term_buckets(ray_session, tmp_path):
    from near_duplicate_detection_ray.functions.hashing import hash_token
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        build_term_index,
        keyword_search_indexed,
    )

    man = build_term_index(SF, str(tmp_path / "tidx2"), n_buckets=16)
    assert man["n_docs"] == 500
    assert set(man["buckets_written"]) <= set(range(16))

    stats = {}
    out = keyword_search_indexed(
        SF, terms=("spark",), k=5, index_dir=str(tmp_path / "tidx2"),
        n_buckets=16, _stats=stats,
    ).to_pandas()
    assert stats["probed_buckets"] == len(
        {hash_token("spark") % 16} & set(man["buckets_written"])
    )
    assert len(out) == 5
    # single-term query: score reduces to tf * N / df, monotone in tf
    assert (out["n_hit_terms"] == 1).all()
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()


def test_missing_terms_empty(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_indexed,
    )

    ds = keyword_search_indexed(
        SF, terms=("zzz_not_a_token",), index_dir=str(tmp_path / "tidx3"),
    )
    # empty results return a schema-carrying pyarrow Table (an empty Ray
    # Dataset drops its column names through to_pandas)
    import pyarrow as pa

    assert isinstance(ds, pa.Table)
    assert ds.num_rows == 0
    assert ds.schema.names == ["doc_id", "n_hit_terms", "score"]
